"""Tracing spans + stage-level checkpoint/resume of the prover pipeline."""

import os
import pickle

import pytest

from aero_tpu.air.fib import FibAir, FibPublicInputs, build_fib_trace, \
    fib_result
from aero_tpu.spec.proof import ProofOptions
from aero_tpu.spec.verifier import verify
from aero_tpu.prover.prover import (prove, prove_resumable, ProverState,
                                    STAGES, _STAGE_FNS)
from aero_tpu.utils import get_tracer


N = 64
OPTS = ProofOptions(num_queries=7, blowup_factor=8, grinding_factor=2)


@pytest.fixture(scope="module")
def setup():
    pub = FibPublicInputs(result=fib_result(N), n_steps=N)
    air = FibAir(N, pub, OPTS)
    return air, build_fib_trace(N), pub


@pytest.mark.slow
class TestTracing:
    def test_spans_recorded(self, setup):
        air, trace, pub = setup
        tracer = get_tracer()
        tracer.reset()
        proof = prove(air, trace, pub)
        names = [r.name for r in tracer.records]
        for stage in STAGES:
            assert stage in names, stage
        assert "prove_program" in names
        # the umbrella span closes last and dominates
        total = tracer.total("prove_program")
        assert total >= tracer.total("constraint_eval")
        assert "ms" in tracer.report() or "span" in tracer.report()
        verify(proof, pub, air=air)


@pytest.mark.slow
class TestResume:
    def test_resumable_equals_direct(self, setup, tmp_path):
        air, trace, pub = setup
        direct = prove(air, trace, pub).to_bytes()
        resumed = prove_resumable(air, trace, pub,
                                  str(tmp_path / "ck")).to_bytes()
        assert direct == resumed

    def test_resume_from_partial_checkpoint(self, setup, tmp_path):
        air, trace, pub = setup
        ckdir = tmp_path / "partial"
        os.makedirs(ckdir)
        # run only the first 3 stages, persist, then resume
        st = ProverState(pub_inputs=pub, main_trace=trace)
        for fn in _STAGE_FNS[:3]:
            fn(air, st)
            st.stage += 1
        with open(ckdir / "state.pkl", "wb") as f:
            pickle.dump(st.to_host(), f)

        proof = prove_resumable(air, trace, pub, str(ckdir))
        assert proof.to_bytes() == prove(air, trace, pub).to_bytes()
        verify(proof, pub, air=air)

    def test_checkpoint_survives_stages(self, setup, tmp_path):
        air, trace, pub = setup
        ckdir = str(tmp_path / "full")
        prove_resumable(air, trace, pub, ckdir)
        with open(os.path.join(ckdir, "state.pkl"), "rb") as f:
            st = pickle.load(f)
        assert st.stage == len(STAGES)
        # resuming a finished checkpoint returns the stored proof directly
        again = prove_resumable(air, trace, pub, ckdir)
        assert again.to_bytes() == prove(air, trace, pub).to_bytes()
