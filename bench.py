"""Benchmark: Goldilocks NTT throughput on the TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: Goldilocks radix-2 butterflies/second/chip for the prover's
hot loop (batched column iNTT + x8 coset LDE, the workload of
BASELINE.json config "standalone NTT/iNTT 2^18 Goldilocks + LDE blowup x8").
The reference publishes no numbers (BASELINE.md); vs_baseline is the ratio
against a nominal 1e8 butterflies/s single-core CPU rate typical of
winterfell-class provers.

Run with --all for per-kernel detail lines (hashing, field mul, e2e proof).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_BUTTERFLIES_PER_S = 1.0e8


def _sync(y):
    """Force completion: through the axon relay, block_until_ready returns
    before the computation finishes — a host fetch of one element is the
    only reliable sync."""
    import jax
    leaf = jax.tree_util.tree_leaves(y)[0]
    jax.device_get(leaf.reshape(-1)[:1])


def _bench(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_ntt(log_n=18, cols=8, log_blowup=3):
    import jax
    from aero_tpu.field import to_gf
    from aero_tpu.ntt import intt, lde

    n = 1 << log_n
    m = n << log_blowup
    rng = np.random.default_rng(0)
    evals = to_gf(rng.integers(0, (1 << 64) - (1 << 32) + 1,
                               size=(cols, n), dtype=np.uint64))

    def pipeline(x):
        return lde(intt(x), log_blowup)

    dt = _bench(pipeline, evals)
    butterflies = cols * (n // 2 * log_n + m // 2 * (log_n + log_blowup))
    return butterflies / dt, dt


def bench_hash(log_leaves=15, row_width=8):
    import jax
    from aero_tpu.field import to_gf
    from aero_tpu.hash import hash_elements_rows

    n = 1 << log_leaves
    rng = np.random.default_rng(1)
    rows = to_gf(rng.integers(0, (1 << 64) - (1 << 32) + 1,
                              size=(n, row_width), dtype=np.uint64))
    dt = _bench(hash_elements_rows, rows)
    return n / dt, dt


def bench_mul(log_n=22):
    import jax
    from aero_tpu.field import to_gf, mul

    n = 1 << log_n
    rng = np.random.default_rng(2)
    a = to_gf(rng.integers(0, (1 << 64) - (1 << 32) + 1, size=n, dtype=np.uint64))
    b = to_gf(rng.integers(0, (1 << 64) - (1 << 32) + 1, size=n, dtype=np.uint64))
    import jax
    jmul = jax.jit(mul)
    dt = _bench(jmul, a, b)
    return n / dt, dt


def main():
    import jax  # noqa: F401  (platform comes from the environment: TPU)
    rate, dt = bench_ntt()
    out = {
        "metric": "goldilocks_ntt_butterflies_per_s_per_chip",
        "value": round(rate, 1),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / BASELINE_BUTTERFLIES_PER_S, 3),
    }
    print(json.dumps(out))
    if "--all" in sys.argv:
        hrate, hdt = bench_hash()
        print(json.dumps({"metric": "blake2s_leaf_hashes_per_s",
                          "value": round(hrate, 1), "unit": "hashes/s",
                          "vs_baseline": None}))
        mrate, mdt = bench_mul()
        print(json.dumps({"metric": "goldilocks_mul_per_s",
                          "value": round(mrate, 1), "unit": "muls/s",
                          "vs_baseline": None}))


if __name__ == "__main__":
    main()
