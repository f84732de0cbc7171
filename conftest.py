"""Test configuration: run JAX tests on a virtual 8-device CPU mesh.

The TPU kernels are written for TPU but are functionally testable on CPU
(interpret mode for Pallas); multi-chip sharding is tested on a virtual
8-device host platform. Benchmarks (bench.py) run on the real TPU chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("AERO_TPU_INTERPRET", "1")
