"""Instrumented dryrun: per-stage wall clocks on the 8-device CPU mesh
(explicit shard_map pipeline)."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           + os.environ.get("EXTRA_XLA", "")).strip()

import jax

jax.config.update("jax_platforms", "cpu")
here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

T0 = time.time()


def mark(label):
    print(f"[{time.time()-T0:7.1f}s] {label}", flush=True)


from aero_tpu.parallel import sharded as S  # noqa: E402
from aero_tpu.field import GF, gf_concat  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

mark("imports done")

mesh = S.make_mesh(8)
air, trace, aux, aux_rand_ints = S._dryrun_air_and_traces(64)
mark("air+traces built")

log_blowup = 3
opts = air.options

_, main_lde_ = S.dist_lde_cols(mesh, trace, log_blowup)
jax.block_until_ready(main_lde_)
mark("dist_lde main")
_, aux_lde_ = S.dist_lde_cols(mesh, aux, log_blowup)
jax.block_until_ready(aux_lde_)
mark("dist_lde aux")

main_root = S.stage_commit(main_lde_)
jax.block_until_ready(main_root)
mark("stage_commit main")
aux_root = S.stage_commit(aux_lde_)
jax.block_until_ready(aux_root)
mark("stage_commit aux")

aux_rand = [S.gf_scalar(r) for r in aux_rand_ints]
nt, nb = air.num_transition_constraints, air.num_assertions
cc_t = [(S.gf_scalar(11 + i), S.gf_scalar(13 + i)) for i in range(nt)]
cc_b = [(S.gf_scalar(17 + i), S.gf_scalar(19 + i)) for i in range(nb)]
constraint_lde = S.spmd_composition(mesh, air, main_lde_, aux_lde_, aux_rand,
                                    cc_t, cc_b, log_blowup=log_blowup)
jax.block_until_ready(constraint_lde)
mark("spmd_composition")
constraint_root = S.stage_commit(constraint_lde)
jax.block_until_ready(constraint_root)
mark("stage_commit constraint")

w = air.main_width + air.aux_width
ce = constraint_lde.shape[0]
all_lde = gf_concat([main_lde_, aux_lde_], axis=0)
zeros_w = GF(jnp.zeros((w,), jnp.uint32), jnp.zeros((w,), jnp.uint32))
zeros_ce = GF(jnp.zeros((ce,), jnp.uint32), jnp.zeros((ce,), jnp.uint32))
ones_w = GF(jnp.ones((w,), jnp.uint32), jnp.zeros((w,), jnp.uint32))
ones_ce = GF(jnp.ones((ce,), jnp.uint32), jnp.zeros((ce,), jnp.uint32))
deep = S.spmd_deep(mesh, air, all_lde, constraint_lde, S.gf_scalar(98765),
                   S.gf_scalar(43210), S.gf_scalar(55555), zeros_w, zeros_w,
                   zeros_ce, ones_w, ones_w, ones_ce, S.gf_scalar(7),
                   S.gf_scalar(9))
jax.block_until_ready(deep)
mark("spmd_deep")

folded = S.stage_fri_fold(deep, S.gf_scalar(31337), ff=opts.fri_folding_factor)
jax.block_until_ready(folded)
mark("stage_fri_fold")
fold_root = S.stage_commit(folded.reshape(opts.fri_folding_factor, -1))
jax.block_until_ready(fold_root)
mark("stage_commit fold")

# value check vs golden
import json
with open(S._GOLDEN_PATH) as f:
    ref = json.load(f)["roots"]
got = [[int(np.asarray(jax.device_get(wd))) for wd in r]
       for r in (main_root, aux_root, constraint_root, fold_root)]
print("matches golden:", got == ref, flush=True)
mark("ALL DONE")
