"""Profile host verification of a 2^20-row proof (TPU process)."""
import cProfile
import io
import pstats
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
from aero_tpu.spec.verifier import verify
from bench import long_fib_source

log_rows = 20
src = long_fib_source(((1 << log_rows) - 64) // 12)
trace, out_stack, overflow = execute_full(src, [0, 1],
                                          min_rows=1 << log_rows,
                                          max_rows=1 << 23)
pub = make_public_inputs(program_hash(src), [0, 1], out_stack,
                         overflow=overflow)
opts = ProofOptions(num_queries=27, blowup_factor=8, grinding_factor=16)
air = MidenAir(trace.shape[1], pub, opts, program=src)
t0 = time.perf_counter()
proof = prove(air, to_gf(trace), pub)
print(f"prove: {time.perf_counter()-t0:.1f}s", flush=True)

vair = MidenAir(trace.shape[1], pub, opts, program=src)
t0 = time.perf_counter()
verify(proof, pub, air=vair)
print(f"verify #1: {time.perf_counter()-t0:.1f}s", flush=True)

vair2 = MidenAir(trace.shape[1], pub, opts, program=src)
pr = cProfile.Profile()
t0 = time.perf_counter()
pr.enable()
verify(proof, pub, air=vair2)
pr.disable()
print(f"verify #2: {time.perf_counter()-t0:.1f}s", flush=True)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
print(s.getvalue(), flush=True)
