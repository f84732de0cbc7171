"""4-step NTT with the DFT tiles executed on the MXU as exact int8
limb matmuls — the "different multiplier unit" escape from the VPU
u32-multiply roofline (docs/PERF_NOTES.md).

Idea: a size-n NTT with n = k1*k2 factors into
    A = F1 @ X          (k1-point DFTs down the columns)     <- MXU
    B = A * T           (n twiddle muls, w^(i2*o1))          <- VPU
    C = B @ F2^T        (k2-point DFTs along the rows)       <- MXU
    out = C^T flattened
(the classic Bailey/4-step algorithm; reference's radix-2 fft analog:
winterfell `Matrix::interpolate_columns`, proving_worker.rs:273).

The matmuls are EXACT over GF(p): every field element splits into
sixteen 4-bit limbs (values < 16 fit int8), the DFT matrix likewise, and
the (a, b) limb-pair products accumulate in int32 — worst case
15*15*k*16 < 2^31 for k <= 2^13, no overflow. The 31 diagonal channel
sums ch_c = sum_{a+b=c} F_a @ X_b recombine with shift-only folds
(mul_pow2_const: 2^96 === -1 keeps every weight a cheap shift), so the
per-point VPU cost is ~31 shift-adds instead of log2(n)*0.75 full limb
muls.

Status: bit-exact vs ntt/ntt.py (tests/test_ntt_hash_merkle.py); see
docs/PERF_NOTES.md for the measured verdict on whether it dispatches.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import field as F
from ..field import (GF, add, mul, mul_scalar, mul_pow2_const, gf_zeros,
                     to_gf)

NLIMB = 16          # 4-bit limbs per 64-bit element
NCHAN = 2 * NLIMB - 1


@functools.lru_cache(maxsize=32)
def _dft_matrix_limbs(k: int, invert: bool) -> np.ndarray:
    """int8[NLIMB, k, k]: limb a of W[o, i] = w_k^(o*i) (w_k^-1, with the
    1/k fold LEFT OUT — applied by the caller once at the end)."""
    w = F.get_root_of_unity(k.bit_length() - 1)
    if invert:
        w = F.inv(w)
    pw = np.array(F.get_power_series(w, k), dtype=np.uint64)
    oi = np.outer(np.arange(k, dtype=np.int64), np.arange(k, dtype=np.int64))
    W = pw[(oi % k)]                                  # (k, k) uint64
    out = np.empty((NLIMB, k, k), dtype=np.int8)
    for a in range(NLIMB):
        out[a] = ((W >> np.uint64(4 * a)) & np.uint64(0xF)).astype(np.int8)
    return out


@functools.lru_cache(maxsize=32)
def _twiddle_limbs(k1: int, k2: int, invert: bool) -> Tuple[np.ndarray,
                                                            np.ndarray]:
    """GF limb arrays (lo, hi) of T[o1, i2] = w_n^(i2*o1), n = k1*k2."""
    n = k1 * k2
    w = F.get_root_of_unity(n.bit_length() - 1)
    if invert:
        w = F.inv(w)
    pw = np.array(F.get_power_series(w, n), dtype=np.uint64)
    idx = (np.outer(np.arange(k1, dtype=np.int64),
                    np.arange(k2, dtype=np.int64)) % n)
    T = pw[idx]
    return ((T & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (T >> np.uint64(32)).astype(np.uint32))


def _split_limbs(x: GF) -> jnp.ndarray:
    """GF[...] -> int8[NLIMB, ...] of 4-bit limbs."""
    parts = []
    for a in range(8):
        parts.append(((x.lo >> (4 * a)) & jnp.uint32(0xF)).astype(jnp.int8))
    for a in range(8):
        parts.append(((x.hi >> (4 * a)) & jnp.uint32(0xF)).astype(jnp.int8))
    return jnp.stack(parts, axis=0)


def _gf_dft_matmul(f_limbs: jnp.ndarray, x: GF) -> GF:
    """Exact Y = W @ X over GF(p). f_limbs int8[NLIMB, k, k] (static),
    x GF[k, m]. Per-channel int32 matmul accumulation + shift-fold
    recombination."""
    xl = _split_limbs(x)                              # int8 (NLIMB, k, m)
    acc = None
    for c in range(NCHAN):
        ch = None
        for a in range(max(0, c - NLIMB + 1), min(NLIMB, c + 1)):
            b = c - a
            p = jax.lax.dot(f_limbs[a], xl[b],
                            preferred_element_type=jnp.int32)
            ch = p if ch is None else ch + p
        term = mul_pow2_const(GF(ch.astype(jnp.uint32),
                                 jnp.zeros_like(ch, dtype=jnp.uint32)),
                              4 * c)
        acc = term if acc is None else add(acc, term)
    return acc


@functools.partial(jax.jit, static_argnames=("k1", "k2", "invert"))
def _four_step(x: GF, k1: int, k2: int, invert: bool) -> GF:
    """Natural-order size-(k1*k2) NTT of GF[..., n] via two MXU DFT
    passes + one VPU twiddle pass. Batched over leading axes."""
    n = k1 * k2
    batch = x.shape[:-1]
    f1 = jnp.asarray(_dft_matrix_limbs(k1, invert))
    f2 = jnp.asarray(_dft_matrix_limbs(k2, invert))
    tlo, thi = _twiddle_limbs(k1, k2, invert)
    T = GF(jnp.asarray(tlo), jnp.asarray(thi))

    # collapse batch into the free matmul axis: x_mat (k1, k2*B)
    xb = GF(jnp.moveaxis(x.lo.reshape(batch + (k1, k2)), -2, 0),
            jnp.moveaxis(x.hi.reshape(batch + (k1, k2)), -2, 0))
    xf = xb.reshape(k1, -1)                           # (k1, B*k2)? careful
    # moveaxis gives (k1, *batch, k2); reshape row-major -> (k1, B*k2)
    A = _gf_dft_matmul(f1, xf)                        # (k1, B*k2)
    A = A.reshape((k1,) + batch + (k2,))
    # twiddle: T[o1, i2] broadcast over batch
    Tb = GF(T.lo.reshape((k1,) + (1,) * len(batch) + (k2,)),
            T.hi.reshape((k1,) + (1,) * len(batch) + (k2,)))
    B_ = mul(A, Tb)
    # second pass: contract i2 with F2 -> put i2 first
    Bf = GF(jnp.moveaxis(B_.lo, -1, 0), jnp.moveaxis(B_.hi, -1, 0))
    Bf = Bf.reshape(k2, -1)                           # (k2, k1*B)
    C = _gf_dft_matmul(f2, Bf)                        # (o2, k1*B)
    C = C.reshape((k2, k1) + batch)                   # (o2, o1, *batch)
    # out[o1 + k1*o2] -> axis order (*batch, o2, o1)
    lo = jnp.moveaxis(C.lo.reshape((k2, k1) + batch), (0, 1),
                      (len(batch), len(batch) + 1))
    hi = jnp.moveaxis(C.hi.reshape((k2, k1) + batch), (0, 1),
                      (len(batch), len(batch) + 1))
    out = GF(lo.reshape(batch + (n,)), hi.reshape(batch + (n,)))
    if invert:
        out = mul_scalar(out, F.inv(n))
    return out


def _factor(n: int) -> Tuple[int, int]:
    logn = n.bit_length() - 1
    k1 = 1 << (logn // 2)
    return k1, n // k1


def ntt_mxu(coeffs: GF) -> GF:
    """Coefficients -> evaluations (natural order), MXU 4-step."""
    n = coeffs.shape[-1]
    k1, k2 = _factor(n)
    return _four_step(coeffs, k1, k2, invert=False)


def intt_mxu(evals: GF) -> GF:
    n = evals.shape[-1]
    k1, k2 = _factor(n)
    return _four_step(evals, k1, k2, invert=True)
