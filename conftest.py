"""Test configuration: run JAX tests on a virtual 8-device CPU mesh.

IMPORTANT environment note: this machine globally sets JAX_PLATFORMS=axon and
a sitecustomize registers the axon PJRT plugin, which tunnels to ONE real TPU
chip with exclusive access (concurrent JAX processes hang waiting for it).
Tests therefore force the CPU platform — both via env var and via
jax.config.update, because the plugin registration wins over the env var.
Benchmarks (bench.py) run on the real TPU chip, one process at a time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the prover's jitted stages (LDE, NTT,
# constraint eval) take minutes to compile on the CPU backend; caching
# them across test runs turns the suite from ~30 min into ~2 min.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
