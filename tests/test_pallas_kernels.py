"""Pallas TPU kernel tests, run in interpret mode on the CPU test mesh.

The same kernels run compiled (Mosaic) on the real chip; interpret mode
checks the kernel logic bit-exactly against hashlib / the jnp oracle.
Mirrors the reference's cross-implementation KAT strategy (SURVEY.md §4).
"""

import hashlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aero_tpu.field import GF, to_gf
from aero_tpu.hash.blake2s_pallas import (
    blake2s_t, hash_columns_t, merge_level_t, merkle_levels_t,
    leading_zeros_t, grind_pow)
from aero_tpu.hash.blake2s_jax import hash_elements_rows


RNG = np.random.default_rng(7)


class TestBlake2sKernel:
    @pytest.mark.parametrize("nbytes,batch", [(40, 64), (64, 130), (96, 64),
                                              (2304, 16)])
    def test_vs_hashlib(self, nbytes, batch):
        nwords = -(-nbytes // 4)
        msgs = RNG.integers(0, 2**32, size=(batch, nwords), dtype=np.uint32)
        d = np.asarray(jax.device_get(blake2s_t(jnp.asarray(msgs.T), nbytes)))
        for i in range(batch):
            ref = hashlib.blake2s(msgs[i].tobytes()[:nbytes]).digest()
            assert d[:, i].astype("<u4").tobytes() == ref

    def test_hash_columns_matches_jnp(self):
        cols = to_gf(RNG.integers(0, (1 << 64) - (1 << 32), size=(9, 200),
                                  dtype=np.uint64))
        d_pallas = np.asarray(jax.device_get(hash_columns_t(cols))).T
        d_jnp = np.asarray(jax.device_get(
            hash_elements_rows(GF(cols.lo.T, cols.hi.T))))
        assert np.array_equal(d_pallas, d_jnp)

    def test_merge_level(self):
        dt = jnp.asarray(RNG.integers(0, 2**32, size=(8, 64),
                                      dtype=np.uint32))
        merged = np.asarray(jax.device_get(merge_level_t(dt)))
        dth = np.asarray(dt)
        for i in range(32):
            ref = hashlib.blake2s(
                dth[:, 2 * i].astype("<u4").tobytes()
                + dth[:, 2 * i + 1].astype("<u4").tobytes()).digest()
            assert merged[:, i].astype("<u4").tobytes() == ref

    def test_merkle_levels_root_matches_spec(self):
        from aero_tpu.spec.merkle import MerkleTree
        n = 32
        leaves = RNG.integers(0, 2**32, size=(8, n), dtype=np.uint32)
        levels = merkle_levels_t(jnp.asarray(leaves))
        root = np.asarray(jax.device_get(levels[-1]))[0].astype("<u4").tobytes()
        host_leaves = [leaves[:, i].astype("<u4").tobytes() for i in range(n)]
        assert root == MerkleTree(host_leaves).root


class TestGrind:
    def test_leading_zeros(self):
        d = RNG.integers(0, 2**32, size=(8, 50), dtype=np.uint32)
        d[:, 7] = 0  # all-zero prefix -> 128
        lz = np.asarray(jax.device_get(leading_zeros_t(jnp.asarray(d))))
        for i in range(50):
            prefix = d[:4, i].astype("<u4").tobytes()
            ref = 128 - int.from_bytes(prefix, "big").bit_length()
            assert lz[i] == ref, i

    def test_grind_matches_host_search(self):
        from aero_tpu.spec.hashing import merge_with_int
        seed = hashlib.blake2s(b"grind-test").digest()
        bits = 6
        nonce = grind_pow(seed, bits, batch=2048)
        d = merge_with_int(seed, nonce)
        assert 128 - int.from_bytes(d[:16], "big").bit_length() >= bits
        for k in range(nonce):
            d = merge_with_int(seed, k)
            assert 128 - int.from_bytes(d[:16], "big").bit_length() < bits


class TestCommitColumns:
    def test_matches_row_commit(self):
        from aero_tpu.merkle import commit_rows, commit_columns
        cols = to_gf(RNG.integers(0, (1 << 64) - (1 << 32), size=(4, 64),
                                  dtype=np.uint64))
        t1 = commit_columns(cols)
        t2 = commit_rows(GF(cols.lo.T, cols.hi.T))
        assert t1.root == t2.root
        p1 = t1.prove_batch([3, 17, 40])
        p2 = t2.prove_batch([3, 17, 40])
        assert p1.serialize_nodes() == p2.serialize_nodes()
