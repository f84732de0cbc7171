#!/usr/bin/env python
"""Demo: prove fib(N) through the SDK, parallel vs sequential, with spans.

The analog of the reference's browser demo app (aero-sdk/src/demo/index.ts:
fib(1000) with parallel and sequential buttons and console timers).

    python tools/demo.py [--n 1000] [--submit]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000, help="fib iterations")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--submit", action="store_true",
                    help="round-trip through the HTTP submission service")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("AERO_TPU_TRACE", "1")

    from aero_tpu.sdk import prove, prove_sequential
    from aero_tpu.sdk.pb import aero_pb2 as pb
    from aero_tpu.vm import fibonacci_source
    from aero_tpu.utils import get_tracer

    program = pb.MidenProgram(program=fibonacci_source(args.n))
    inputs = pb.MidenProgramInputs(stack_init=[0, 1], advice_tape=[])

    t0 = time.perf_counter()
    result = prove(program, inputs)
    t_par = time.perf_counter() - t0
    top = int.from_bytes(result.outputs.stack[0].element, "little")
    print(f"fib({args.n}) mod p = {top}")
    print(f"parallel prove: {t_par:.2f}s, "
          f"proof {len(result.native_proof.to_bytes()) / 1024:.1f} KB")

    t0 = time.perf_counter()
    prove_sequential(program, inputs)
    print(f"sequential prove: {time.perf_counter() - t0:.2f}s")

    print(get_tracer().report())

    if args.submit:
        from aero_tpu.sdk.server import SubmissionServer, submit_proof_remote
        server = SubmissionServer().start()
        req = pb.ProofSubmissionRequest(proof=result.proof,
                                        public_inputs=result.public_inputs,
                                        source_proof_system=pb.MIDEN,
                                        target_chain=pb.STARKNET)
        receipt = submit_proof_remote(f"http://127.0.0.1:{server.port}", req)
        print(f"submission receipt: {receipt}")
        server.stop()


if __name__ == "__main__":
    main()
