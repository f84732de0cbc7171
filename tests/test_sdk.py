"""SDK facade: protobuf wire roundtrip + submission service."""

import pytest

pytestmark = pytest.mark.slow

from aero_tpu.sdk import (prove, prove_sequential, ProofSubmissionService,
                          proof_to_pb, _proof_from_pb, public_inputs_to_pb,
                          _public_inputs_from_pb, options_to_pb, pb,
                          DEFAULT_OPTIONS)
from aero_tpu.spec.proof import ProofOptions
from aero_tpu.vm import fibonacci_source


FAST = options_to_pb(ProofOptions(num_queries=13, blowup_factor=8,
                                  grinding_factor=4))


@pytest.fixture(scope="module")
def sdk_result():
    prog = pb.MidenProgram(program=fibonacci_source(10))
    inputs = pb.MidenProgramInputs(stack_init=[1, 0])
    return prove(prog, inputs, FAST)


class TestSdk:
    def test_outputs(self, sdk_result):
        vals = [int.from_bytes(x.element, "little")
                for x in sdk_result.outputs.stack]
        assert vals[:2] == [55, 34]

    def test_wire_roundtrip_verifies(self, sdk_result):
        data = sdk_result.proof.SerializeToString()
        msg = pb.StarkProof()
        msg.ParseFromString(data)
        native = _proof_from_pb(msg)
        assert native.to_bytes() == sdk_result.native_proof.to_bytes()
        pub = _public_inputs_from_pb(sdk_result.public_inputs)
        from aero_tpu.spec.verifier import verify
        verify(native, pub)

    def test_submission_service(self, sdk_result):
        svc = ProofSubmissionService()
        req = pb.ProofSubmissionRequest(
            proof=sdk_result.proof, public_inputs=sdk_result.public_inputs,
            source_proof_system=pb.MIDEN, target_chain=pb.STARKNET)
        resp = svc.submit_proof(req)
        assert len(resp.receipt) == 64

    def test_submission_rejects_tampered(self, sdk_result):
        svc = ProofSubmissionService()
        bad = pb.ProofSubmissionRequest(
            proof=sdk_result.proof, public_inputs=sdk_result.public_inputs)
        bad.proof.pow_nonce += 1
        with pytest.raises(Exception):
            svc.submit_proof(bad)
