"""Sharded (multi-chip GSPMD) pipeline == single-device prover, stage by
stage, on the 8-virtual-device CPU mesh (conftest.py)."""

import numpy as np
import jax
import pytest

from aero_tpu.spec import field as F
from aero_tpu.spec.proof import ProofOptions
from aero_tpu.field import GF, from_gf, gf_concat, mul, to_gf
from aero_tpu.ntt import intt, lde
from aero_tpu.air.fib import FibAir, FibPublicInputs, build_fib_trace, \
    fib_result
from aero_tpu.parallel.sharded import (make_mesh, shard_domain, stage_lde,
                                       stage_commit, stage_composition,
                                       stage_fri_fold, gf_scalar)
from aero_tpu.merkle import commit_rows
from aero_tpu.prover.fri import fold_evals


N = 32
OPTS = ProofOptions(num_queries=7, blowup_factor=8, grinding_factor=1)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def setup(mesh):
    pub = FibPublicInputs(result=fib_result(N), n_steps=N)
    air = FibAir(N, pub, OPTS)
    trace = build_fib_trace(N)
    sharded_trace = shard_domain(mesh, trace)
    return air, trace, sharded_trace


class TestShardedStages:
    def test_lde_matches_unsharded(self, setup):
        air, trace, strace = setup
        polys_s, lde_s = stage_lde(strace, 3)
        polys = intt(trace)
        lde_u = lde(polys, 3, F.DOMAIN_OFFSET)
        assert np.array_equal(from_gf(polys_s), from_gf(polys))
        assert np.array_equal(from_gf(lde_s), from_gf(lde_u))

    def test_commit_root_matches(self, setup):
        air, trace, strace = setup
        _, lde_s = stage_lde(strace, 3)
        root_tuple = stage_commit(lde_s)
        root = b"".join(
            int(np.asarray(jax.device_get(w)).reshape(()))
            .to_bytes(4, "little") for w in root_tuple)
        tree = commit_rows(GF(lde_s.lo.T, lde_s.hi.T))
        assert root == tree.root

    def test_composition_matches_prover(self, setup):
        air, trace, strace = setup
        _, lde_s = stage_lde(strace, 3)
        aux = air.build_aux_trace(trace, [3, 5])
        saux = aux  # small enough; replicate
        _, aux_lde_s = stage_lde(saux, 3)

        nt, nb = air.num_transition_constraints, air.num_assertions
        cc_t_int = [(11 + i, 13 + i) for i in range(nt)]
        cc_b_int = [(17 + i, 19 + i) for i in range(nb)]
        cc_t = [(gf_scalar(a), gf_scalar(b)) for a, b in cc_t_int]
        cc_b = [(gf_scalar(a), gf_scalar(b)) for a, b in cc_b_int]
        got = stage_composition(air, lde_s, aux_lde_s,
                                [gf_scalar(3), gf_scalar(5)],
                                cc_t, cc_b, log_blowup=3)

        # single-device reference: run the prover's constraint stage with
        # the same coefficients by replaying its math directly
        from aero_tpu.prover import prover as P
        st = P.ProverState(pub_inputs=air.pub_inputs, main_trace=trace)
        st.main_polys = intt(trace)
        st.main_lde = lde(st.main_polys, 3, F.DOMAIN_OFFSET)
        st.aux_rand = [3, 5]
        st.aux_polys = intt(aux)
        st.aux_lde = lde(st.aux_polys, 3, F.DOMAIN_OFFSET)

        class FixedCoin:
            def __init__(self):
                self._pairs = iter(cc_t_int + cc_b_int)

            def draw_pair(self):
                return next(self._pairs)

            def reseed(self, _):
                pass

        st.coin = FixedCoin()
        P.stage_constraint_eval(air, st)
        assert np.array_equal(from_gf(got), from_gf(st.constraint_lde))

    def test_fri_fold_matches(self, setup):
        air, trace, strace = setup
        _, lde_s = stage_lde(strace, 3)
        evals = lde_s[0]
        alpha = 31337
        folded_s = stage_fri_fold(evals, gf_scalar(alpha), ff=8)
        folded_u = fold_evals(evals, alpha, 8)
        assert np.array_equal(from_gf(folded_s), from_gf(folded_u))


class TestMidenDryrun:
    @pytest.mark.slow
    def test_midenair_dryrun_value_equality(self, mesh):
        """The flagship MidenAir (chiplet trace included) through the
        sharded pipeline: every root byte-identical to single-device."""
        from aero_tpu.parallel.sharded import dryrun_prove_core
        out = dryrun_prove_core(8)
        assert len(out.main_root) == 8
        assert out.matches_single_device

    @pytest.mark.slow
    def test_dryrun_golden_roots_not_stale(self):
        """The committed golden file the driver gate compares against must
        match a LIVE single-device pipeline run (regen with
        tools/regen_dryrun_golden.py after AIR/trace/NTT changes)."""
        import json
        from aero_tpu.parallel.sharded import (_GOLDEN_PATH,
                                               single_device_dryrun_roots)
        with open(_GOLDEN_PATH) as f:
            committed = json.load(f)["roots"]
        assert single_device_dryrun_roots() == committed
