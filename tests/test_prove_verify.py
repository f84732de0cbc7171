"""End-to-end: prove a Fibonacci trace on the device path, verify with the
full spec verifier (including the OOD constraint check the reference stubs),
and roundtrip the proof through the winterfell-compatible serialization."""

import numpy as np
import pytest

from aero_tpu.spec import field as F
from aero_tpu.spec.proof import ProofOptions, StarkProof
from aero_tpu.spec.verifier import verify, VerificationError
from aero_tpu.air.fib import FibAir, FibPublicInputs, build_fib_trace, fib_result
from aero_tpu.prover import prove


OPTS = ProofOptions(num_queries=27, blowup_factor=8, grinding_factor=8,
                    fri_folding_factor=8, fri_max_remainder_size=256)


@pytest.fixture(scope="module")
def fib_proof():
    n = 64
    pub = FibPublicInputs(result=fib_result(n), n_steps=n)
    air = FibAir(n, pub, OPTS)
    proof = prove(air, build_fib_trace(n), pub)
    return proof, pub, air


class TestProveVerify:
    def test_verifies_with_ood_check(self, fib_proof):
        proof, pub, air = fib_proof
        t = verify(proof, pub, air=air)
        assert len(t.query_positions) == OPTS.num_queries

    def test_serialization_roundtrip(self, fib_proof):
        proof, pub, air = fib_proof
        data = proof.to_bytes()
        proof2 = StarkProof.from_bytes(data)
        assert proof2.to_bytes() == data
        verify(proof2, pub, air=air)

    def test_rejects_wrong_result(self, fib_proof):
        proof, pub, air = fib_proof
        bad_pub = FibPublicInputs(result=(pub.result + 1) % F.P, n_steps=pub.n_steps)
        bad_air = FibAir(air.trace_length, bad_pub, OPTS)
        with pytest.raises(VerificationError):
            verify(proof, bad_pub, air=bad_air)

    def test_rejects_tampered_trace_value(self, fib_proof):
        proof, pub, air = fib_proof
        q = proof.trace_queries[0]
        bad_values = bytearray(q.values)
        bad_values[17] ^= 1
        from aero_tpu.spec.proof import Queries
        proof2 = StarkProof.from_bytes(proof.to_bytes())
        proof2.trace_queries[0] = Queries(bytes(bad_values), q.paths)
        with pytest.raises(VerificationError):
            verify(proof2, pub, air=air)

    def test_rejects_cheating_trace(self):
        """A trace violating the transition at one step must not verify:
        the composition polynomial overflows its degree bound (caught at
        proving time by the degree assertion)."""
        n = 64
        pub = FibPublicInputs(result=12345, n_steps=n)
        air = FibAir(n, pub, OPTS)
        trace = build_fib_trace(n)
        from aero_tpu.field import from_gf, to_gf
        arr = from_gf(trace)
        arr[1, n - 1] = 12345  # claim a wrong final value
        with pytest.raises(AssertionError):
            prove(air, to_gf(arr), pub)
