"""Transcript-level simulation of the reference Cairo verifier's live
check sequence on the parser wire format (spec/cairo_sim.py) — the
protostar-free acceptance evidence (reference:
tests/integration/test_verifier.cairo::test_verify)."""

import os

import pytest

from aero_tpu.spec.proof import load_proof_file
from aero_tpu.spec.cairo_sim import simulate_on_proof
from aero_tpu.spec.verifier import VerificationError

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "fib.bin")


class TestGoldenAcceptance:
    def test_golden_proof_accepted_with_golden_positions(self):
        pub, proof = load_proof_file(GOLDEN)
        positions = simulate_on_proof(proof, pub)
        # the same query positions the full verifier derives — i.e. the
        # Fiat-Shamir transcript the Cairo verifier reproduces
        assert positions[:5] == [5207, 6722, 8132, 4654, 492]
        assert len(positions) == 27

    def test_tampered_query_value_rejected(self):
        pub, proof = load_proof_file(GOLDEN)
        v = bytearray(proof.trace_queries[0].values)
        v[0] ^= 1
        proof.trace_queries[0].values = bytes(v)
        with pytest.raises(VerificationError):
            simulate_on_proof(proof, pub)

    def test_tampered_pow_rejected(self):
        pub, proof = load_proof_file(GOLDEN)
        proof.pow_nonce += 1
        with pytest.raises(VerificationError):
            simulate_on_proof(proof, pub)

    def test_tampered_remainder_rejected(self):
        pub, proof = load_proof_file(GOLDEN)
        r = bytearray(proof.fri_proof.remainder)
        r[0] ^= 1
        proof.fri_proof.remainder = bytes(r)
        with pytest.raises(VerificationError):
            simulate_on_proof(proof, pub)

    def test_tampered_ood_rejected(self):
        pub, proof = load_proof_file(GOLDEN)
        t = bytearray(proof.ood_frame.trace_states)
        t[0] ^= 1
        proof.ood_frame.trace_states = bytes(t)
        with pytest.raises(VerificationError):
            simulate_on_proof(proof, pub)


@pytest.mark.slow
class TestOwnProofAcceptance:
    def test_our_miden_proof_passes_live_sequence(self):
        """Our proof through the same wire format + live sequence,
        parameterized by our AIR's draw counts (112+46 — the two-
        constant air_instance.cairo change documented in cairo_sim)."""
        from aero_tpu.vm import execute, program_hash, fibonacci_source
        from aero_tpu.air.miden import MidenAir, make_public_inputs
        from aero_tpu.field import to_gf
        from aero_tpu.prover import prove
        from aero_tpu.spec.proof import ProofOptions

        src = fibonacci_source(10)
        trace, out_stack = execute(src, [0, 1], min_rows=64)
        pub = make_public_inputs(program_hash(src), [0, 1], out_stack)
        opts = ProofOptions(num_queries=7, blowup_factor=8,
                            grinding_factor=1)
        air = MidenAir(trace.shape[1], pub, opts, program=src)
        proof = prove(air, to_gf(trace), pub)
        positions = simulate_on_proof(
            proof, pub, num_transition=air.num_transition_constraints,
            num_assertions=air.num_assertions)
        assert len(positions) == 7
