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

Status: SHIPPED — bit-exact vs ntt/ntt.py (tests/test_ntt_hash_merkle.py
on CPU, re-checked on-chip) and dispatched by ntt/intt for sizes in
[2^16, 2^19] on TPU (1.33x the radix path at 2^18; above that window the
4-step's sqrt(n) per-point matmul cost loses to the radix path's log n —
measured numbers in docs/PERF_NOTES.md).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import field as F
from ..field import (GF, add, sub, mul, mul_scalar, mul_pow2_const,
                     gf_zeros, gf_full, to_gf)

NLIMB = 16          # 4-bit limbs per 64-bit element
NCHAN = 2 * NLIMB - 1


@functools.lru_cache(maxsize=32)
def _dft_matrix_limbs(k: int, invert: bool, scale: int = 1) -> np.ndarray:
    """int8[NLIMB, k, k]: limb a of scale * W[o, i], W = w_k^(o*i)
    (w_k^-1 for invert; the iNTT folds its 1/n into the second matrix
    via `scale`, saving a full-size field-mul pass)."""
    w = F.get_root_of_unity(k.bit_length() - 1)
    if invert:
        w = F.inv(w)
    pw = np.array(F.get_power_series(w, k), dtype=np.uint64)
    oi = np.outer(np.arange(k, dtype=np.int64), np.arange(k, dtype=np.int64))
    W = pw[(oi % k)]                                  # (k, k) uint64
    if scale != 1:
        W = np.array([[F.mul(int(v), scale) for v in row] for row in W],
                     dtype=np.uint64)
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

    def chan(c):
        ch = None
        for a in range(max(0, c - NLIMB + 1), min(NLIMB, c + 1)):
            p = jax.lax.dot(f_limbs[a], xl[c - a],
                            preferred_element_type=jnp.int32)
            ch = p if ch is None else ch + p
        return ch

    # fold channel PAIRS in int32 first (ch_c + 16*ch_{c+1} <= 1.3e8,
    # safely below 2^31 for k <= 2^13): halves the GF shift-reduce work,
    # which dominates the non-matmul time
    acc = None
    for c in range(0, NCHAN, 2):
        ch = chan(c)
        if c + 1 < NCHAN:
            ch = ch + (chan(c + 1) << 4)
        term = mul_pow2_const(GF(ch.astype(jnp.uint32),
                                 jnp.zeros_like(ch, dtype=jnp.uint32)),
                              4 * c)
        acc = term if acc is None else add(acc, term)
    return acc


# --------------------------- Karatsuba limb convolution (108 vs 256 dots)

def _sum_pairs(parts):
    """[p0..p_{L-1}] -> [p0+p_{L/2}, ...] elementwise (host np or device)."""
    half = len(parts) // 2
    return [parts[i] + parts[half + i] for i in range(half)]


@functools.lru_cache(maxsize=32)
def _f_tree(k: int, invert: bool, scale: int = 1):
    """Precompute the static F-side Karatsuba tree: at every level the
    half-sums of limb matrices (int8; 3 levels deep the sums reach
    15*8 = 120 < 127, still int8-exact)."""
    f = _dft_matrix_limbs(k, invert, scale)
    f = [f[a].astype(np.int8) for a in range(NLIMB)]

    def build(parts):
        if len(parts) <= 2:
            return tuple(parts)        # numpy int8 leaves (jax consts)
        half = len(parts) // 2
        return (build(parts[:half]), build(parts[half:]),
                build(_sum_pairs(parts)))

    return build(f)


def _kara_channels(ftree, xparts):
    """Recursive Karatsuba product of the limb polynomials: returns the
    2L-1 signed-int32 channel arrays of F(y)*X(y), y = 2^4."""
    if not isinstance(ftree[0], tuple):   # leaf: 1-2 limb matrices
        if len(xparts) == 1:
            return [jax.lax.dot(ftree[0], xparts[0],
                                preferred_element_type=jnp.int32)]
        d = [jax.lax.dot(ftree[a], xparts[b],
                         preferred_element_type=jnp.int32)
             for a in range(2) for b in range(2)]
        return [d[0], d[1] + d[2], d[3]]
    flo, fhi, fmid = ftree
    half = len(xparts) // 2
    p0 = _kara_channels(flo, xparts[:half])
    p2 = _kara_channels(fhi, xparts[half:])
    p1 = _kara_channels(fmid, _sum_pairs(xparts))
    L = len(xparts)
    out = [None] * (2 * L - 1)

    def acc(i, v):
        out[i] = v if out[i] is None else out[i] + v

    for i, v in enumerate(p0):
        acc(i, v)
        acc(i + half, -v)              # -P0 shifted by y^half
    for i, v in enumerate(p2):
        acc(i + 2 * half, v)
        acc(i + half, -v)              # -P2 shifted by y^half
    for i, v in enumerate(p1):
        acc(i + half, v)
    return out


def _gf_dft_matmul_kara(ftree, x: GF) -> GF:
    """Exact Y = W @ X via the 3-level Karatsuba limb convolution:
    108 int8 dots instead of 256. Channels are SIGNED; the two's-
    complement reinterpretation is corrected with a per-lane conditional
    subtract of 2^(32+4c)."""
    xl = _split_limbs(x)
    xparts = [xl[a] for a in range(NLIMB)]
    chans = _kara_channels(ftree, xparts)
    acc = None
    for c, ch in enumerate(chans):
        neg = ch < 0
        u = GF(ch.astype(jnp.uint32), jnp.zeros_like(ch, dtype=jnp.uint32))
        term = mul_pow2_const(u, 4 * c)
        # value = u - 2^32*[ch<0]  (two's complement), shifted by 4c
        corr = (1 << (32 + 4 * c)) % F.P
        corr_gf = gf_full(ch.shape, corr)
        term = sub(term, GF(jnp.where(neg, corr_gf.lo, 0),
                            jnp.where(neg, corr_gf.hi, 0)))
        acc = term if acc is None else add(acc, term)
    return acc


@functools.partial(jax.jit, static_argnames=("k1", "k2", "invert"))
def _four_step(x: GF, k1: int, k2: int, invert: bool) -> GF:
    """Natural-order size-(k1*k2) NTT of GF[..., n] via two MXU DFT
    passes + one VPU twiddle pass. Batched over leading axes."""
    n = k1 * k2
    batch = x.shape[:-1]
    # kernel choice per tile size (measured on-chip): the schoolbook
    # pair-folded convolution wins at k <= 512 (11.0 vs 15.9 ms at
    # 2^18); the 3-level Karatsuba (108 vs 256 dots) wins at k >= 1024
    # (1.9x over radix at 2^20) where the dot count dominates
    def dft(k, invert_, scale_, xf_):
        if k >= 1024:
            return _gf_dft_matmul_kara(_f_tree(k, invert_, scale_), xf_)
        return _gf_dft_matmul(
            jnp.asarray(_dft_matrix_limbs(k, invert_, scale_)), xf_)
    tlo, thi = _twiddle_limbs(k1, k2, invert)
    T = GF(jnp.asarray(tlo), jnp.asarray(thi))

    # collapse batch into the free matmul axis: x_mat (k1, k2*B)
    xb = GF(jnp.moveaxis(x.lo.reshape(batch + (k1, k2)), -2, 0),
            jnp.moveaxis(x.hi.reshape(batch + (k1, k2)), -2, 0))
    xf = xb.reshape(k1, -1)                           # (k1, B*k2)? careful
    # moveaxis gives (k1, *batch, k2); reshape row-major -> (k1, B*k2)
    A = dft(k1, invert, 1, xf)                        # (k1, B*k2)
    A = A.reshape((k1,) + batch + (k2,))
    # twiddle: T[o1, i2] broadcast over batch
    Tb = GF(T.lo.reshape((k1,) + (1,) * len(batch) + (k2,)),
            T.hi.reshape((k1,) + (1,) * len(batch) + (k2,)))
    B_ = mul(A, Tb)
    # second pass: contract i2 with F2 -> put i2 first
    Bf = GF(jnp.moveaxis(B_.lo, -1, 0), jnp.moveaxis(B_.hi, -1, 0))
    Bf = Bf.reshape(k2, -1)                           # (k2, k1*B)
    C = dft(k2, invert, F.inv(n) if invert else 1, Bf)  # (o2, k1*B)
    C = C.reshape((k2, k1) + batch)                   # (o2, o1, *batch)
    # out[o1 + k1*o2] -> axis order (*batch, o2, o1)
    lo = jnp.moveaxis(C.lo.reshape((k2, k1) + batch), (0, 1),
                      (len(batch), len(batch) + 1))
    hi = jnp.moveaxis(C.hi.reshape((k2, k1) + batch), (0, 1),
                      (len(batch), len(batch) + 1))
    return GF(lo.reshape(batch + (n,)), hi.reshape(batch + (n,)))


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
