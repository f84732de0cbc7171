"""NTT / blake2s / Merkle device kernels vs the pure-Python spec oracle."""

import numpy as np
import pytest

from aero_tpu.spec import field as F
from aero_tpu.spec import hashing as H
from aero_tpu.spec.polys import ntt_naive, eval_poly_on_coset
from aero_tpu.field import to_gf, from_gf
from aero_tpu.ntt import ntt, intt, lde
from aero_tpu.hash import hash_elements_rows, merge_pairs, digests_to_bytes
from aero_tpu.merkle import commit_rows

RNG = np.random.default_rng(7)


def rand_mat(rows, cols):
    return RNG.integers(0, F.P, size=(rows, cols), dtype=np.uint64)


class TestNTT:
    @pytest.mark.parametrize("logn", [1, 3, 6, 10])
    def test_forward_matches_spec(self, logn):
        n = 1 << logn
        coeffs = rand_mat(3, n)
        got = from_gf(ntt(to_gf(coeffs)))
        for r in range(3):
            assert got[r].tolist() == ntt_naive(coeffs[r].tolist())

    def test_roundtrip(self):
        x = rand_mat(4, 256)
        assert np.array_equal(from_gf(intt(ntt(to_gf(x)))), x)

    def test_lde_matches_spec(self):
        coeffs = rand_mat(2, 64)
        got = from_gf(lde(to_gf(coeffs), 3))
        for r in range(2):
            assert got[r].tolist() == eval_poly_on_coset(coeffs[r].tolist(), 3, 7)


class TestBlake2s:
    def test_hash_elements_rows(self):
        rows = rand_mat(16, 72)
        digests = digests_to_bytes(hash_elements_rows(to_gf(rows)))
        for r in range(16):
            assert digests[r] == H.hash_elements(rows[r].tolist())

    def test_odd_width(self):
        rows = rand_mat(8, 9)
        digests = digests_to_bytes(hash_elements_rows(to_gf(rows)))
        for r in range(8):
            assert digests[r] == H.hash_elements(rows[r].tolist())

    def test_single_felt(self):
        rows = rand_mat(4, 1)
        digests = digests_to_bytes(hash_elements_rows(to_gf(rows)))
        for r in range(4):
            assert digests[r] == H.hash_elements(rows[r].tolist())

    def test_merge_pairs(self):
        rows = rand_mat(8, 2)
        d = hash_elements_rows(to_gf(rows))
        merged = digests_to_bytes(merge_pairs(d))
        flat = digests_to_bytes(d)
        for i in range(4):
            assert merged[i] == H.merge(flat[2 * i], flat[2 * i + 1])


class TestDeviceMerkle:
    def test_commit_matches_spec(self):
        from aero_tpu.spec.merkle import MerkleTree
        rows = rand_mat(64, 8)
        tree = commit_rows(to_gf(rows))
        spec_tree = MerkleTree([H.hash_elements(r.tolist()) for r in rows])
        assert tree.root == spec_tree.root
        idxs = [5, 3, 60, 21]
        proof = tree.prove_batch(idxs)
        assert proof.get_root(idxs) == spec_tree.root


class TestMxuNtt:
    """4-step MXU int8-limb-matmul NTT (ntt/ntt_mxu.py): bit-exact vs
    the production radix-4 path. Small sizes here (CPU einsum); the TPU
    perf verdict lives in docs/PERF_NOTES.md."""

    def test_bit_exact_vs_production(self):
        import numpy as np
        from aero_tpu.field import to_gf, from_gf
        from aero_tpu.ntt import ntt, intt
        from aero_tpu.ntt.ntt_mxu import ntt_mxu, intt_mxu
        rng = np.random.default_rng(5)
        for logn, cols in ((6, 3), (8, 2)):
            n = 1 << logn
            x = to_gf(rng.integers(0, (1 << 64) - (1 << 32) + 1,
                                   size=(cols, n), dtype=np.uint64))
            assert np.array_equal(from_gf(ntt(x)), from_gf(ntt_mxu(x)))
            assert np.array_equal(from_gf(intt(x)), from_gf(intt_mxu(x)))
