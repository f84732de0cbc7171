#!/usr/bin/env python
"""generate_proof — prove a VM program and write a .bin proof file.

The equivalent of the reference's `make generate_proof`
(miden-proof-generator/src/main.rs:9-52): runs the Fibonacci program on the
aero-tpu VM, proves it on the TPU compute path with the golden parameters
(27 queries, blowup 8, 16-bit grinding, blake2s, FRI folding 8), self-
verifies, and writes the bincode-style ProofData file.

    python tools/generate_proof.py [--n 10] [--out proofs/fib.bin]
        [--min-rows 1024] [--grind 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10, help="fibonacci iterations")
    ap.add_argument("--out", default="proofs/fib.bin")
    ap.add_argument("--min-rows", type=int, default=1024)
    ap.add_argument("--grind", type=int, default=16)
    ap.add_argument("--queries", type=int, default=27)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from aero_tpu.vm import execute, fibonacci_source, program_hash
    from aero_tpu.air.miden import MidenAir, make_public_inputs
    from aero_tpu.field import to_gf
    from aero_tpu.prover import prove
    from aero_tpu.spec.proof import ProofOptions, dump_proof_file
    from aero_tpu.spec.verifier import verify

    src = fibonacci_source(args.n)
    t0 = time.time()
    trace, out_stack = execute(src, [0, 1], min_rows=args.min_rows)
    print(f"executed: trace 2^{trace.shape[1].bit_length()-1} x 72, "
          f"outputs {out_stack[:2]} ({time.time()-t0:.2f}s)")

    pub = make_public_inputs(program_hash(src), [0, 1], out_stack)
    opts = ProofOptions(num_queries=args.queries, blowup_factor=8,
                        grinding_factor=args.grind)
    air = MidenAir(trace.shape[1], pub, opts, program=src)

    t0 = time.time()
    proof = prove(air, to_gf(trace), pub)
    wall = time.time() - t0
    data = dump_proof_file(pub, proof)
    print(f"proved in {wall:.2f}s; proof size: {len(data)/1024:.1f} KB")

    verify(proof, pub, air=air)
    print("self-verification OK (all 49 constraints checked at the OOD point)")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
