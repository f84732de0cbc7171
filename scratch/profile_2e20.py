"""2^20-row MidenAir proof on the TPU: cold + steady-state second proof,
plus host verification timing."""
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from aero_tpu.vm import execute_full, program_hash
from aero_tpu.air.miden import MidenAir, make_public_inputs
from aero_tpu.field import to_gf
from aero_tpu.spec.proof import ProofOptions
from aero_tpu.prover.prover import prove
from aero_tpu.utils import get_tracer
from bench import long_fib_source

log_rows = 20
n_iters = ((1 << log_rows) - 64) // 12
src = long_fib_source(n_iters)
t0 = time.perf_counter()
trace, out_stack, overflow = execute_full(src, [0, 1],
                                          min_rows=1 << log_rows,
                                          max_rows=1 << 23)
print(f"execute: {time.perf_counter()-t0:.1f}s rows={trace.shape[1]}",
      flush=True)
pub = make_public_inputs(program_hash(src), [0, 1], out_stack,
                         overflow=overflow)
opts = ProofOptions(num_queries=27, blowup_factor=8, grinding_factor=16)
air = MidenAir(trace.shape[1], pub, opts, program=src)
gtrace = to_gf(trace)

t0 = time.perf_counter()
proof = prove(air, gtrace, pub)
print(f"cold prove: {time.perf_counter()-t0:.1f}s "
      f"size={len(proof.to_bytes())}", flush=True)
print(get_tracer().report(), flush=True)

get_tracer().reset()
t0 = time.perf_counter()
proof = prove(air, gtrace, pub)
print(f"warm prove: {time.perf_counter()-t0:.1f}s", flush=True)
print(get_tracer().report(), flush=True)

from aero_tpu.spec.verifier import verify
vair = MidenAir(trace.shape[1], pub, opts, program=src)
t0 = time.perf_counter()
verify(proof, pub, air=vair)
print(f"verify: {time.perf_counter()-t0:.1f}s", flush=True)
