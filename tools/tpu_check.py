#!/usr/bin/env python
"""On-chip KAT check for the compiled Pallas kernels.

The pytest suite runs on a CPU mesh (conftest.py) where the Pallas modules
fall back to jnp; this script runs the *compiled* (Mosaic) kernels on the
real TPU chip and checks them bit-exactly against hashlib / the spec
oracle. Run: python tools/tpu_check.py
"""

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    assert jax.default_backend() != "cpu", "run on the TPU chip (no conftest)"
    from aero_tpu.field import to_gf, GF
    from aero_tpu.hash.blake2s_pallas import (
        blake2s_t, hash_columns_t, merge_level_t, grind_pow)
    from aero_tpu.hash.blake2s_jax import hash_elements_rows
    from aero_tpu.spec.hashing import merge_with_int

    rng = np.random.default_rng(0)
    failures = 0

    def check(name, ok):
        nonlocal failures
        print(f"{'PASS' if ok else 'FAIL'} {name}")
        if not ok:
            failures += 1

    for nbytes, B in [(40, 2048), (64, 1024), (2304, 1500), (2592, 1024)]:
        W = -(-nbytes // 4)
        msgs = rng.integers(0, 2**32, size=(B, W), dtype=np.uint32)
        d = np.asarray(jax.device_get(blake2s_t(jnp.asarray(msgs.T), nbytes)))
        ok = all(
            hashlib.blake2s(msgs[i].tobytes()[:nbytes]).digest()
            == d[:, i].astype("<u4").tobytes()
            for i in range(0, B, max(1, B // 17)))
        check(f"blake2s_t nbytes={nbytes}", ok)

    cols = to_gf(rng.integers(0, (1 << 64) - (1 << 32), size=(72, 3000),
                              dtype=np.uint64))
    d1 = np.asarray(jax.device_get(hash_columns_t(cols))).T
    d2 = np.asarray(jax.device_get(hash_elements_rows(GF(cols.lo.T,
                                                         cols.hi.T))))
    check("hash_columns_t vs jnp", np.array_equal(d1, d2))

    dt = jnp.asarray(rng.integers(0, 2**32, size=(8, 4096), dtype=np.uint32))
    m1 = np.asarray(jax.device_get(merge_level_t(dt)))
    dth = np.asarray(dt)
    ok = all(
        hashlib.blake2s(dth[:, 2 * i].astype("<u4").tobytes()
                        + dth[:, 2 * i + 1].astype("<u4").tobytes()).digest()
        == m1[:, i].astype("<u4").tobytes()
        for i in range(0, 2048, 311))
    check("merge_level_t", ok)

    seed = hashlib.blake2s(b"tpu-check").digest()
    nonce = grind_pow(seed, 12)
    d = merge_with_int(seed, nonce)
    check("grind_pow", 128 - int.from_bytes(d[:16], "big").bit_length() >= 12)

    # experimental pallas NTT (not dispatched in production — see module
    # docstring): still KAT-checked at the smallest supported size
    from aero_tpu.ntt.ntt_pallas import ntt_pallas, supported
    from aero_tpu.ntt import ntt as ntt_jnp
    from aero_tpu.field import from_gf
    n = 1 << 13
    if supported(n):
        x = rng.integers(0, (1 << 63), size=(2, n), dtype=np.uint64)
        got = from_gf(ntt_pallas(to_gf(x)))
        want = from_gf(ntt_jnp(to_gf(x)))
        check("ntt_pallas 2^13 (experimental)", np.array_equal(got, want))

    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
