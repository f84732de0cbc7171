"""Benchmark: Goldilocks NTT throughput on the TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: Goldilocks radix-2 butterflies/second/chip for the prover's
hot loop (batched column iNTT + x8 coset LDE, the workload of
BASELINE.json config "standalone NTT/iNTT 2^18 Goldilocks + LDE blowup x8").
The reference publishes no numbers (BASELINE.md); vs_baseline is the ratio
against a nominal 1e8 butterflies/s single-core CPU rate typical of
winterfell-class provers.

Timing method: the op is applied K times inside ONE jit dispatch
(lax.fori_loop) and synced with a host fetch — through the axon relay
`block_until_ready` returns early and each dispatch carries a ~30 ms sync
floor, so naive per-call timing both under- and over-counts (see
docs/PERF_NOTES.md).

Run with --all for per-kernel detail lines (hashing incl. the Pallas
kernel, field mul, Merkle commit, e2e fib proof).
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
    """Per-dispatch timing (for ops big enough to dwarf the sync floor)."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def _bench_loop(fn, x, K=8, iters=3):
    """Amortized timing: apply fn K times sequentially inside one jit."""
    import jax

    @jax.jit
    def rep(v):
        return jax.lax.fori_loop(0, K, lambda i, w: fn(w), v)

    _sync(rep(x))
    _sync(rep(x))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(rep(x))
        times.append(time.perf_counter() - t0)
    return min(times) / K


def bench_ntt(log_n=18, cols=8, log_blowup=3):
    from aero_tpu.field import to_gf, GF
    from aero_tpu.ntt import intt, lde

    n = 1 << log_n
    m = n << log_blowup
    rng = np.random.default_rng(0)
    evals = to_gf(rng.integers(0, (1 << 64) - (1 << 32) + 1,
                               size=(cols, n), dtype=np.uint64))

    def pipeline(x):
        # keep shape fixed for the fori_loop carry: fold the LDE back down
        y = lde(intt(x), log_blowup)
        return GF(y.lo[..., :n], y.hi[..., :n])

    dt = _bench_loop(pipeline, evals, K=4)
    butterflies = cols * (n // 2 * log_n + m // 2 * (log_n + log_blowup))
    return butterflies / dt, dt


def bench_hash(log_leaves=20, row_width=72):
    """Pallas leaf hashing at the BASELINE 2^20-leaf workload."""
    from aero_tpu.field import to_gf
    from aero_tpu.hash.blake2s_pallas import hash_columns_t

    n = 1 << log_leaves
    rng = np.random.default_rng(1)
    cols = to_gf(rng.integers(0, (1 << 64) - (1 << 32) + 1,
                              size=(row_width, n), dtype=np.uint64))
    dt = _bench(hash_columns_t, cols, warmup=1, iters=3)
    return n / dt, dt


def bench_merkle(log_leaves=20, row_width=72):
    """Full commit: leaf hashing + all tree levels to the root."""
    from aero_tpu.field import to_gf
    from aero_tpu.hash.blake2s_pallas import hash_columns_t, merkle_levels_t

    n = 1 << log_leaves
    rng = np.random.default_rng(1)
    cols = to_gf(rng.integers(0, (1 << 64) - (1 << 32) + 1,
                              size=(row_width, n), dtype=np.uint64))

    def commit(c):
        return merkle_levels_t(hash_columns_t(c))[-1]

    dt = _bench(commit, cols, warmup=1, iters=3)
    return n / dt, dt


def bench_mul(log_n=21):
    import jax
    from aero_tpu.field import to_gf, mul

    n = 1 << log_n
    rng = np.random.default_rng(2)
    a = to_gf(rng.integers(0, (1 << 64) - (1 << 32) + 1, size=n,
                           dtype=np.uint64))
    dt = _bench_loop(lambda v: mul(v, v), a, K=16)
    return n / dt, dt


def _prove_once(src, inputs, min_rows, grind, warm=True):
    from aero_tpu.vm import execute_full, program_hash
    from aero_tpu.air.miden import MidenAir, make_public_inputs
    from aero_tpu.field import to_gf
    from aero_tpu.spec.proof import ProofOptions
    from aero_tpu.prover.prover import prove

    trace, out_stack, overflow = execute_full(
        src, list(inputs), min_rows=min_rows, max_rows=1 << 23)
    pub = make_public_inputs(program_hash(src), list(inputs), out_stack,
                             overflow=overflow)
    opts = ProofOptions(num_queries=27, blowup_factor=8,
                        grinding_factor=grind)
    air = MidenAir(trace.shape[1], pub, opts, program=src)
    gtrace = to_gf(trace)
    if warm:
        prove(air, gtrace, pub)      # warm the compile caches
    t0 = time.perf_counter()
    proof = prove(air, gtrace, pub)
    dt = time.perf_counter() - t0
    return dt, len(proof.to_bytes()), trace.shape[1]


def bench_proof(min_rows=1 << 10, grind=16):
    """End-to-end MIDEN fib proof wall clock at the golden parameters
    (the reference's workload: 2^10-row 72+9-col trace, 27 queries,
    blowup 8, 16-bit grinding, blake2s)."""
    from aero_tpu.vm import fibonacci_source
    dt, size, _ = _prove_once(fibonacci_source(10), [0, 1], min_rows, grind)
    return dt, size


def long_fib_source(n_iters: int) -> str:
    """Counter-driven fib loop: ~12 trace rows/iteration with a tiny ROM
    (a `repeat.N` unroll would blow the program ROM up to N entries).
    Stack: [counter, a, b, ...]."""
    return f"""
    begin
        push.{n_iters}
        dup.0 push.0 neq
        while.true
            movdn.2  swap dup.1 add  movup.2    # fib step under counter
            push.1 sub
            dup.0 push.0 neq
        end
    end
    """


def bench_proof_scale(log_rows=20, grind=16):
    """BASELINE 'Full proof scale-up' workload: MIDEN proofs over a
    2^20-row trace of REAL execution (not padding), 27 queries, blowup 8
    (2^23-point LDE domain), blake2s. Returns (steady_dt, cold_dt, size):
    the first proof in the process pays relay module loads + any compile
    cache misses (cold_dt); the second is the deployment-shape
    steady-state number (a resident prover process, e.g. the SDK
    server)."""
    import time as _t
    from aero_tpu.vm import execute_full, program_hash
    from aero_tpu.air.miden import MidenAir, make_public_inputs
    from aero_tpu.field import to_gf
    from aero_tpu.spec.proof import ProofOptions
    from aero_tpu.prover.prover import prove

    n_iters = ((1 << log_rows) - 64) // 12
    src = long_fib_source(n_iters)
    trace, out_stack, overflow = execute_full(
        src, [0, 1], min_rows=1 << log_rows, max_rows=1 << 23)
    assert trace.shape[1] == 1 << log_rows, f"trace padded to {trace.shape[1]}"
    pub = make_public_inputs(program_hash(src), [0, 1], out_stack,
                             overflow=overflow)
    opts = ProofOptions(num_queries=27, blowup_factor=8,
                        grinding_factor=grind)
    air = MidenAir(trace.shape[1], pub, opts, program=src)
    gtrace = to_gf(trace)
    t0 = _t.perf_counter()
    proof = prove(air, gtrace, pub)
    cold_dt = _t.perf_counter() - t0
    t0 = _t.perf_counter()
    proof = prove(air, gtrace, pub)
    steady_dt = _t.perf_counter() - t0
    return steady_dt, cold_dt, len(proof.to_bytes())


def _enable_compile_cache():
    """Persistent jit cache: the 2^20-row proof pipeline compiles ~2 min
    of TPU modules on first run; cache them across bench invocations so
    the recorded wall clocks measure execution, not compilation."""
    import os
    import jax
    here = os.path.dirname(os.path.abspath(__file__))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(here, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ----------------------------------------------------------- budget runner
#
# The driver runs bench.py under an unknown external `timeout`; a bench
# that hangs past it records NOTHING for the metrics it never reached
# (BENCH_r04 rc:124). Budget discipline instead: a watchdog force-exits
# rc:0 just before BENCH_BUDGET_S, printing a "skipped" record for every
# planned metric still unfinished — every metric is always recorded,
# either with a value or with an explicit skip.

BENCH_BUDGET_S = float(__import__("os").environ.get("BENCH_BUDGET_S", 1500))
_T0 = time.monotonic()
_PRINTED: set = set()
_PLAN: list = []


def _emit(metric: str, value, unit: str, vs_baseline=None):
    _PRINTED.add(metric)
    print(json.dumps({"metric": metric, "value": value, "unit": unit,
                      "vs_baseline": vs_baseline}), flush=True)


def _skip(metric: str, why: str):
    _PRINTED.add(metric)
    print(json.dumps({"metric": metric, "value": None, "unit": "skipped",
                      "vs_baseline": None, "skipped": why}), flush=True)


def _remaining() -> float:
    return BENCH_BUDGET_S - (time.monotonic() - _T0)


def _watchdog():
    import os
    import threading

    def fire():
        for m in _PLAN:
            if m not in _PRINTED:
                _skip(m, "bench budget exhausted (watchdog)")
        sys.stdout.flush()
        os._exit(0)

    t = threading.Timer(max(5.0, BENCH_BUDGET_S - 10.0), fire)
    t.daemon = True
    t.start()


def bench_lde_2e24(log_n=24, log_blowup=3):
    """Single-chip 2^24-point coset LDE (the buildable-here half of the
    BASELINE multi-host 2^24 north star; the distributed formulation is
    parallel/dist_ntt.py, value-equality-tested on the 8-device CPU
    mesh at 2^22).

    The 8 cosets are BATCHED as the leading axis of ONE size-n NTT call
    (the inline 8-coset lde() graph at n = 2^24 blows the XLA compile
    budget; the batched formulation is a single 12-stage module and
    runs the coset dimension fully vectorized — measured 0.93 s/LDE vs
    3.66 s for a host-side coset loop)."""
    import jax
    import jax.numpy as jnp
    from aero_tpu.field import to_gf, mul, GF
    from aero_tpu.ntt import ntt
    from aero_tpu.spec import field as F

    n = 1 << log_n
    m = n << log_blowup
    blowup = 1 << log_blowup
    rng = np.random.default_rng(3)
    polys = to_gf(rng.integers(0, (1 << 64) - (1 << 32) + 1,
                               size=(1, n), dtype=np.uint64))
    w_m = F.get_root_of_unity(m.bit_length() - 1)
    scales = to_gf(np.stack(
        [np.array(F.get_power_series(
            F.mul(F.DOMAIN_OFFSET, F.exp(w_m, t)), n), dtype=np.uint64)
         for t in range(blowup)]))                       # (blowup, n)

    @jax.jit
    def full(p: GF, sc: GF) -> GF:
        pb = GF(jnp.broadcast_to(p.lo, sc.shape),
                jnp.broadcast_to(p.hi, sc.shape))
        return ntt(mul(pb, sc))

    dt = _bench(full, polys, scales, warmup=1, iters=2)
    butterflies = (m // 2) * (log_n + log_blowup)
    return butterflies / dt, dt


def _guard(metric_names, fn):
    """Run one bench step; on ANY failure print skip records instead of
    letting the exception take the whole bench down (rc != 0 records
    nothing driver-visible — BENCH_r04)."""
    try:
        fn()
    except Exception as e:  # noqa: BLE001
        for m in metric_names:
            if m not in _PRINTED:
                _skip(m, f"{type(e).__name__}: {e}"[:200])


def main():
    import jax  # noqa: F401  (platform comes from the environment: TPU)
    _enable_compile_cache()
    _PLAN.extend(["goldilocks_ntt_butterflies_per_s_per_chip",
                  "merkle_commit_2e20_leaves_s",
                  "lde_2e24_butterflies_per_s",
                  "fib_2e10_proof_wall_clock",
                  "fib_2e10_proof_size",
                  "miden_2e20_row_proof_wall_clock",
                  "miden_2e20_row_proof_cold_wall_clock"])
    _watchdog()

    def step_ntt():
        rate, dt = bench_ntt()
        _emit("goldilocks_ntt_butterflies_per_s_per_chip", round(rate, 1),
              "butterflies/s", round(rate / BASELINE_BUTTERFLIES_PER_S, 3))
    _guard(["goldilocks_ntt_butterflies_per_s_per_chip"], step_ntt)

    def step_merkle():
        mrate, mdt = bench_merkle()
        _emit("merkle_commit_2e20_leaves_s", round(mdt, 4), "s")
    _guard(["merkle_commit_2e20_leaves_s"], step_merkle)

    # e2e proof wall clocks next — the marquee metrics, so they run
    # BEFORE the cheaper-to-lose lde24/fib entries if budget is tight
    def step_scale():
        sdt, cdt, ssize = bench_proof_scale()
        _emit("miden_2e20_row_proof_wall_clock", round(sdt, 3), "s")
        _emit("miden_2e20_row_proof_cold_wall_clock", round(cdt, 3), "s")
    if _remaining() > 420:
        _guard(["miden_2e20_row_proof_wall_clock",
                "miden_2e20_row_proof_cold_wall_clock"], step_scale)
    else:
        _skip("miden_2e20_row_proof_wall_clock", "insufficient budget")
        _skip("miden_2e20_row_proof_cold_wall_clock", "insufficient budget")

    def step_proof():
        pdt, psize = bench_proof()
        _emit("fib_2e10_proof_wall_clock", round(pdt, 3), "s")
        _emit("fib_2e10_proof_size", psize, "bytes",
              round(psize / 50303, 3))
    if _remaining() > 240:
        _guard(["fib_2e10_proof_wall_clock", "fib_2e10_proof_size"],
               step_proof)
    else:
        _skip("fib_2e10_proof_wall_clock", "insufficient budget")
        _skip("fib_2e10_proof_size", "insufficient budget")

    def step_lde24():
        rate, dt = bench_lde_2e24()
        _emit("lde_2e24_butterflies_per_s", round(rate, 1),
              "butterflies/s", round(rate / BASELINE_BUTTERFLIES_PER_S, 3))
    if _remaining() > 300:
        _guard(["lde_2e24_butterflies_per_s"], step_lde24)
    else:
        _skip("lde_2e24_butterflies_per_s", "insufficient budget")

    if "--all" in sys.argv:
        hrate, hdt = bench_hash()
        _emit("blake2s_leaf_hashes_per_s_2e20x72", round(hrate, 1),
              "hashes/s")
        mulrate, _ = bench_mul()
        _emit("goldilocks_mul_per_s", round(mulrate, 1), "muls/s")


if __name__ == "__main__":
    main()
