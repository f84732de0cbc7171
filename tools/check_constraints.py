"""Dev sanity tool: evaluate every MidenAir transition constraint on the
honest execution-trace rows (no proving) and report any that fail to
vanish, plus the aux-bus boundary values. Usage:

    python tools/check_constraints.py [program_file]

Without an argument it runs a builtin program exercising every op family.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from aero_tpu.vm import execute, program_hash  # noqa: E402
from aero_tpu.air.miden import MidenAir, make_public_inputs  # noqa: E402
from aero_tpu.field import to_gf, from_gf  # noqa: E402
from aero_tpu.spec.proof import ProofOptions  # noqa: E402

M32 = (1 << 32) - 1

DEFAULT_SRC = f"""
begin
    push.{M32} push.1 u32add
    push.3 u32sub
    push.123456789 push.987654321 u32mul
    push.17 push.5 u32div
    push.17 push.5 u32mod
    push.12 push.10 u32and
    push.12 push.10 u32or
    push.12 push.10 u32xor
    push.0 u32not
    push.3 push.4 u32shl
    push.48 push.4 u32shr
    push.3 push.4 u32lt
    push.{(7 << 32) | 12345} u32split
    push.99 mem.store.7 drop
    mem.load.7
    push.2 mem.store.7 drop
    mem.load.7
    mem.load.123
    push.1 push.1 eq
    if.true push.5 else push.6 end
    push.3
    dup.0 push.0 neq
    while.true
        push.1 u32sub
        dup.0 push.0 neq
    end
    drop drop drop drop drop drop drop drop drop drop
    drop drop drop drop drop drop drop drop drop
end
"""


def check(src, inputs=(0, 0)):
    trace, out_stack = execute(src, list(inputs), min_rows=64)
    n = trace.shape[1]
    pub = make_public_inputs(program_hash(src), list(inputs), out_stack)
    opts = ProofOptions(num_queries=7, blowup_factor=8, grinding_factor=1)
    air = MidenAir(n, pub, opts, program=src)

    rng = np.random.default_rng(7)
    aux_rand = [int(x) for x in rng.integers(1, (1 << 63), size=16)]
    aux = air.build_aux_trace(to_gf(trace), aux_rand)
    aux_np = from_gf(aux)

    cur = to_gf(trace[:, :-1])
    nxt = to_gf(trace[:, 1:])
    acur = to_gf(aux_np[:, :-1])
    anxt = to_gf(aux_np[:, 1:])
    evals = air.evaluate_transitions(cur, nxt, acur, anxt, aux_rand)
    bad = 0
    for i, ev in enumerate(evals):
        v = from_gf(ev)
        nz = np.nonzero(v)[0]
        if len(nz):
            bad += 1
            print(f"constraint {i} NONZERO at rows {nz[:8].tolist()} "
                  f"values {v[nz[:4]].tolist()}")
    # boundary checks
    air._aux_rand = aux_rand
    for a in air.get_assertions():
        col = trace[a.column] if not a.is_aux else aux_np[a.column - 72]
        got = int(col[a.step])
        if got != a.value % ((1 << 64) - (1 << 32) + 1):
            bad += 1
            print(f"assertion col={a.column} step={a.step}: "
                  f"got {got}, want {a.value}")
    print("OK" if not bad else f"{bad} FAILURES", f"(n={n} rows)")
    return bad


if __name__ == "__main__":
    src = (open(sys.argv[1]).read() if len(sys.argv) > 1 else DEFAULT_SRC)
    sys.exit(1 if check(src) else 0)
