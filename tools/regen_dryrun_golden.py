"""Regenerate the committed golden roots for the multi-chip dryrun.

The driver's `dryrun_multichip` gate compares the SHARDED MidenAir
pipeline's four Merkle roots against single-device values. Computing the
single-device pipeline live inside the gate doubled its compile cost past
the driver budget on a 2-CPU box (MULTICHIP_r04 rc:124), so the reference
roots are committed to aero_tpu/parallel/dryrun_golden.json and refreshed
with this tool whenever the AIR/trace/NTT semantics change:

    JAX_PLATFORMS=cpu python tools/regen_dryrun_golden.py

A slow-lane test (tests/test_sharded.py) recomputes them and fails if the
committed file is stale.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from aero_tpu.parallel.sharded import (  # noqa: E402
    _GOLDEN_PATH, single_device_dryrun_roots)


def main():
    roots = single_device_dryrun_roots()
    with open(_GOLDEN_PATH, "w") as f:
        json.dump({"trace_steps": 64, "roots": roots}, f, indent=1)
    print(f"wrote {_GOLDEN_PATH}")
    for name, r in zip(("main", "aux", "constraint", "fold"), roots):
        print(f"  {name}: {[hex(w) for w in r]}")


if __name__ == "__main__":
    main()
