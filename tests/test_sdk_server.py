"""HTTP submission service (the reference declares this gRPC service but
never implements it) + advice tape through the SDK."""

import pytest

pytestmark = pytest.mark.slow

from aero_tpu.sdk import prove, DEFAULT_OPTIONS, options_to_pb
from aero_tpu.sdk.pb import aero_pb2 as pb
from aero_tpu.sdk.server import (SubmissionServer, submit_proof_remote,
                                 SubmissionError)
from aero_tpu.spec.proof import ProofOptions


FAST = options_to_pb(ProofOptions(num_queries=7, blowup_factor=8,
                                  grinding_factor=2))


@pytest.fixture(scope="module")
def result():
    program = pb.MidenProgram(program="""
    begin
        repeat.8 swap dup.1 add end
        adv.push add
    end
    """)
    inputs = pb.MidenProgramInputs(stack_init=[0, 1], advice_tape=[100])
    return prove(program, inputs, FAST)


class TestAdviceThroughSdk:
    def test_outputs(self, result):
        # fib(8)=34 on top, +100 from the advice tape
        top = int.from_bytes(result.outputs.stack[0].element, "little")
        assert top == 34 + 100


class TestSubmissionServer:
    @pytest.fixture(scope="class")
    def server(self):
        s = SubmissionServer().start()
        yield s
        s.stop()

    def test_submit_ok(self, server, result):
        req = pb.ProofSubmissionRequest(
            proof=result.proof, public_inputs=result.public_inputs,
            source_proof_system=pb.MIDEN, target_chain=pb.STARKNET)
        receipt = submit_proof_remote(f"http://127.0.0.1:{server.port}", req)
        assert len(receipt) == 64
        # deterministic receipt for the same submission
        again = submit_proof_remote(f"http://127.0.0.1:{server.port}", req)
        assert again == receipt

    def test_submit_tampered_rejected(self, server, result):
        req = pb.ProofSubmissionRequest(
            proof=result.proof, public_inputs=result.public_inputs)
        req.proof.pow_nonce += 1
        with pytest.raises(SubmissionError):
            submit_proof_remote(f"http://127.0.0.1:{server.port}", req)

    def test_garbage_rejected(self, server):
        import urllib.request
        import urllib.error
        r = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/submit_proof",
            data=b"not a protobuf of the right shape" * 5)
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(r, timeout=30)
