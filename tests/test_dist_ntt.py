"""Explicit shard_map distributed NTT == single-device NTT, bit-exact,
on the 8-virtual-device CPU mesh (VERDICT r4 ask #6; SURVEY §7.9
multi-host north star)."""

import numpy as np
import jax
import pytest

from aero_tpu.spec import field as F
from aero_tpu.field import from_gf, to_gf
from aero_tpu.ntt import ntt, intt, lde
from aero_tpu.parallel.sharded import make_mesh
from aero_tpu.parallel.dist_ntt import dist_ntt, dist_lde


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def _rand(log_n, seed=0):
    rng = np.random.default_rng(seed)
    return to_gf(rng.integers(0, F.P, size=(1 << log_n,), dtype=np.uint64))


class TestDistNtt:
    def test_forward_matches_single_device(self, mesh):
        x = _rand(10)
        got = from_gf(dist_ntt(mesh, x))
        want = from_gf(ntt(x))
        assert np.array_equal(got, want)

    @pytest.mark.slow
    def test_forward_2e16(self, mesh):
        x = _rand(16)
        assert np.array_equal(from_gf(dist_ntt(mesh, x)),
                              from_gf(ntt(x)))

    @pytest.mark.slow
    def test_inverse_matches_single_device(self, mesh):
        x = _rand(14, seed=1)
        got = from_gf(dist_ntt(mesh, x, invert=True))
        want = from_gf(intt(x))
        assert np.array_equal(got, want)

    @pytest.mark.slow
    def test_roundtrip(self, mesh):
        x = _rand(12, seed=2)
        back = dist_ntt(mesh, dist_ntt(mesh, x), invert=True)
        assert np.array_equal(from_gf(back), from_gf(x))

    @pytest.mark.slow
    def test_dist_lde_matches_single_device(self, mesh):
        x = _rand(10, seed=3)
        got = from_gf(dist_lde(mesh, x, log_blowup=3))
        want = from_gf(lde(intt(x), 3, F.DOMAIN_OFFSET))
        assert np.array_equal(got, want)

    @pytest.mark.slow
    def test_2e22_value_equality(self, mesh):
        """The BASELINE-scale check: 2^22-point distributed NTT equals
        the single-device transform bit-for-bit."""
        x = _rand(22, seed=4)
        got = from_gf(dist_ntt(mesh, x))
        want = from_gf(ntt(x))
        assert np.array_equal(got, want)


class TestDistNttBatched:
    def test_batched_forward(self, mesh):
        rng = np.random.default_rng(11)
        x = to_gf(rng.integers(0, F.P, size=(3, 1 << 9), dtype=np.uint64))
        assert np.array_equal(from_gf(dist_ntt(mesh, x)), from_gf(ntt(x)))

    def test_dist_lde_cols_matches_prover_lde(self, mesh):
        """The dryrun's 12-chunk column LDE == the single-device
        (iNTT, coset-LDE) pair, bit-exact — main-width-shaped."""
        from aero_tpu.parallel.sharded import dist_lde_cols
        rng = np.random.default_rng(12)
        x = to_gf(rng.integers(0, F.P, size=(13, 1 << 6), dtype=np.uint64))
        polys_d, lde_d = dist_lde_cols(mesh, x, 3)
        polys = intt(x)
        want = lde(polys, 3, F.DOMAIN_OFFSET)
        assert np.array_equal(from_gf(polys_d), from_gf(polys))
        assert np.array_equal(from_gf(lde_d), from_gf(want))
