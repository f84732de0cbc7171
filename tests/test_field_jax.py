"""JAX Goldilocks limb arithmetic vs the pure-Python spec oracle."""

import numpy as np
import pytest

from aero_tpu.spec import field as F
from aero_tpu.field import (
    to_gf, from_gf, add, sub, neg, mul, square, pow_const, inv, batch_inv,
    canonicalize, gf_full,
)

RNG = np.random.default_rng(42)


def rand_felts(n, include_edges=True):
    vals = RNG.integers(0, F.P, size=n, dtype=np.uint64).tolist()
    if include_edges:
        vals[:6] = [0, 1, F.P - 1, F.P - 2, 1 << 32, (1 << 32) - 1]
    return vals


class TestLimbOps:
    def test_roundtrip(self):
        xs = rand_felts(256)
        assert from_gf(to_gf(xs)).tolist() == xs

    def test_add_sub_neg(self):
        a, b = rand_felts(512), rand_felts(512)
        ga, gb = to_gf(a), to_gf(b)
        assert from_gf(add(ga, gb)).tolist() == [F.add(x, y) for x, y in zip(a, b)]
        assert from_gf(sub(ga, gb)).tolist() == [F.sub(x, y) for x, y in zip(a, b)]
        assert from_gf(neg(ga)).tolist() == [F.neg(x) for x in a]

    def test_mul(self):
        a, b = rand_felts(1024), rand_felts(1024)
        ga, gb = to_gf(a), to_gf(b)
        assert from_gf(mul(ga, gb)).tolist() == [F.mul(x, y) for x, y in zip(a, b)]

    def test_mul_noncanonical_inputs(self):
        # lazy representation: inputs may be >= p (but < 2^64)
        import jax.numpy as jnp
        from aero_tpu.field.jax_gl import GF
        a = GF(jnp.asarray(np.full(8, 0xFFFFFFFF, np.uint32)),
               jnp.asarray(np.full(8, 0xFFFFFFFF, np.uint32)))  # 2^64-1
        b = to_gf(rand_felts(8))
        expect = [F.mul((1 << 64) - 1, y) for y in from_gf(canonicalize(b)).tolist()]
        assert from_gf(mul(a, b)).tolist() == expect

    def test_square_pow(self):
        a = rand_felts(128)
        ga = to_gf(a)
        assert from_gf(square(ga)).tolist() == [F.mul(x, x) for x in a]
        for e in [0, 1, 2, 3, 7, 8, 12345, F.P - 2]:
            assert from_gf(pow_const(ga, e)).tolist() == [F.exp(x, e) for x in a]

    def test_inv(self):
        a = rand_felts(64)
        a = [x if x else 5 for x in a]
        assert from_gf(inv(to_gf(a))).tolist() == [F.inv(x) for x in a]

    def test_batch_inv(self):
        a = [x if x else 7 for x in rand_felts(100)]
        got = from_gf(batch_inv(to_gf(a), axis=-1)).tolist()
        assert got == [F.inv(x) for x in a]

    def test_gf_full(self):
        assert from_gf(gf_full((4,), F.P + 5)).tolist() == [5, 5, 5, 5]
