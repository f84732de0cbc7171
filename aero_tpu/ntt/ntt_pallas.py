"""4-step (Bailey) NTT as Pallas TPU kernels — EXPERIMENTAL, not dispatched.

STATUS (measured on v5e, 2026-08): bit-exact but ~100-1000x SLOWER than the
jnp path. Butterflies along the sublane axis (strided sub-tile reshapes,
rolls, selects) hit a Mosaic lowering cliff: a 2^18 transform takes ~88 s
against 13 ms for ntt.py. The jnp NTT is in fact near compute-bound on the
VPU limb multiply (one fused stage ~0.7 ms at 2^18x8 vs 2.6 ms for a full
elementwise GF mul), so VMEM residency has little to win here — the
ntt.py path stays production. Kept for (a) the host-side numpy table
machinery (gl_np), (b) re-evaluation on future Mosaic versions, and (c)
the 4-step decomposition, which is also the multi-chip sharding seam.

The jnp NTT (ntt.py) streams the whole array through HBM once per butterfly
stage — 2*log2(n) HBM passes. This module reformulates the transform so the
butterflies run from VMEM:

    n = n1 * n2,  x[j1 + n1*j2] = M[j2][j1]
    pass 1: size-n2 NTT down each column of M (butterflies along the
            sublane axis, 128 columns per grid block), then multiply by
            the cross twiddle w^(j1*k2)        -> C[k2][j1]
    pass 2: after one XLA transpose+bit-reverse gather, size-n1 NTT down
            each column of C^T                 -> D[k1][k2]
    flatten D row-major = natural-order result (k = k1*n2 + k2).

Total HBM traffic: ~6 passes instead of 2*log2(n). Each kernel instance
holds a (L, 128) tile resident in VMEM and runs all log2(L) stages on it;
the per-stage reshapes are VMEM-local relayouts.

The inverse transform is the same flow with w -> w^-1 and 1/n folded into
the cross-twiddle table. Tables are built host-side in numpy (gl_np) so
dispatch inside a jit trace never caches tracers.

Replaces the hot loop of the reference's winterfell fft
(`Matrix::interpolate_columns` / `evaluate_columns_over`,
aero-sdk/miden-wasm/src/proving_worker.rs:273-274) at TPU speed.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec import field as F
from ..field import GF, add, sub, mul
from . import gl_np

MAX_L = 2048          # max per-pass NTT size (VMEM tile height)
MIN_PALLAS_N = 1 << 13  # below this the jnp path wins (dispatch overhead)
MAX_PALLAS_N = MAX_L * MAX_L


def supported(n: int) -> bool:
    return MIN_PALLAS_N <= n <= MAX_PALLAS_N


# ------------------------------------------------------------------- tables

def _bitrev(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.lru_cache(maxsize=24)
def _tables_np(n: int, invert: bool):
    """Host-side table set for size n: (n1, n2, rev1, rev2, p1, p2, ctw)."""
    log_n = n.bit_length() - 1
    log1 = (log_n + 1) // 2
    n1, n2 = 1 << log1, n >> log1
    assert n1 <= MAX_L and n2 <= MAX_L, n
    w = F.get_root_of_unity(log_n)
    if invert:
        w = F.inv(w)
    p2 = _expanded_stage_tw(n2, pow(w, n1, F.P)).T   # pass-1 root w^{n1}
    p1 = _expanded_stage_tw(n1, pow(w, n2, F.P)).T   # pass-2 root w^{n2}
    # cross table ctw[k2, j1] = w^(j1*k2) (x 1/n for the inverse transform),
    # built by row log-doubling: rows [m, 2m) = rows [0, m) * row_m
    scale = F.inv(n) if invert else 1
    ctw = np.empty((n2, n1), dtype=np.uint64)
    ctw[0] = gl_np.power_series(1, n1, scale)    # row 0 = scale everywhere
    if n2 > 1:
        ctw[1] = gl_np.power_series(w, n1, scale)
    m = 2
    while m < n2:
        row_m = gl_np.power_series(pow(w, m, F.P), n1)
        ctw[m:2 * m] = gl_np.mul(ctw[:m], row_m[None, :])
        m *= 2
    return n1, n2, _bitrev(log1), _bitrev(log_n - log1), p1, p2, ctw


def _split64(a: np.ndarray):
    a = np.asarray(a, np.uint64)
    return (a & np.uint64(0xFFFFFFFF)).astype(np.uint32), \
        (a >> np.uint64(32)).astype(np.uint32)


# ------------------------------------------------------------------- kernel

def _expanded_stage_tw(L: int, wL: int) -> np.ndarray:
    """Per-stage twiddle COLUMNS: (log2(L), L) where row s-1, entry i =
    w_m^(i mod m/2) for m = 2^s — the multiplier each position applies to
    its butterfly partner (identical for both halves of a block)."""
    log_L = L.bit_length() - 1
    out = np.zeros((max(log_L, 1), L), dtype=np.uint64)
    for s in range(1, log_L + 1):
        m = 1 << s
        half = m >> 1
        wm = pow(wL, L // m, F.P)
        out[s - 1] = np.tile(gl_np.power_series(wm, half), L // half)
    return out


KERNEL_VARIANT = "reshape"  # "roll" | "reshape" (A/B perf, both bit-exact)


def _make_colntt_kernel(L: int, with_cross: bool):
    if KERNEL_VARIANT == "reshape":
        return _make_colntt_kernel_reshape(L, with_cross)
    return _make_colntt_kernel_roll(L, with_cross)


def _make_colntt_kernel_reshape(L: int, with_cross: bool):
    """Butterflies via reshape views: (L,128) -> (L/m, 2, half, 128),
    combine halves with a concat. More VMEM stack than the roll variant
    but no full-length sublane rotates."""
    log_L = L.bit_length() - 1

    def kernel(*refs):
        if with_cross:
            xlo_ref, xhi_ref, twlo_ref, twhi_ref, clo_ref, chi_ref, \
                olo_ref, ohi_ref = refs
        else:
            xlo_ref, xhi_ref, twlo_ref, twhi_ref, olo_ref, ohi_ref = refs
        xlo = xlo_ref[0]
        xhi = xhi_ref[0]
        for s in range(1, log_L + 1):
            m = 1 << s
            half = m >> 1
            el = xlo.reshape(L // m, 2, half, 128)
            eh = xhi.reshape(L // m, 2, half, 128)
            even = GF(el[:, 0], eh[:, 0])
            odd = GF(el[:, 1], eh[:, 1])
            # stage twiddles: first `half` rows of column s-1
            twl = twlo_ref[:, s - 1:s][:half].reshape(1, half, 1)
            twh = twhi_ref[:, s - 1:s][:half].reshape(1, half, 1)
            t = mul(odd, GF(jnp.broadcast_to(twl, odd.lo.shape),
                            jnp.broadcast_to(twh, odd.lo.shape)))
            lo_b = add(even, t)
            hi_b = sub(even, t)
            xlo = jnp.concatenate([lo_b.lo[:, None], hi_b.lo[:, None]],
                                  axis=1).reshape(L, 128)
            xhi = jnp.concatenate([lo_b.hi[:, None], hi_b.hi[:, None]],
                                  axis=1).reshape(L, 128)
        x = GF(xlo, xhi)
        if with_cross:
            x = mul(x, GF(clo_ref[...], chi_ref[...]))
        olo_ref[0] = x.lo
        ohi_ref[0] = x.hi

    return kernel


def _make_colntt_kernel_roll(L: int, with_cross: bool):
    """In-place-style butterflies: partner fetched with a static sublane
    roll, halves combined with a select — no reshape/concat copies, so the
    VMEM stack stays ~a few (L, 128) buffers even at L = 2048."""
    log_L = L.bit_length() - 1

    def kernel(*refs):
        if with_cross:
            xlo_ref, xhi_ref, twlo_ref, twhi_ref, clo_ref, chi_ref, \
                olo_ref, ohi_ref = refs
        else:
            xlo_ref, xhi_ref, twlo_ref, twhi_ref, olo_ref, ohi_ref = refs
        x = GF(xlo_ref[0], xhi_ref[0])          # (L, 128)
        rows = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 0)
        for s in range(1, log_L + 1):
            m = 1 << s
            half = m >> 1
            first = (rows & (m - 1)) < half     # position in low half
            # partner[i] = x[i+half] (low half) / x[i-half] (high half);
            # roll(x, s)[i] = x[i-s], shifts must be non-negative
            plo = jnp.where(first, pltpu.roll(x.lo, L - half, 0),
                            pltpu.roll(x.lo, half, 0))
            phi = jnp.where(first, pltpu.roll(x.hi, L - half, 0),
                            pltpu.roll(x.hi, half, 0))
            partner = GF(plo, phi)
            # stage twiddles arrive as column s-1 of an (L, log_L) array
            # (sublane-aligned; a lane-major layout would need a transpose)
            tw = GF(jnp.broadcast_to(twlo_ref[:, s - 1:s], (L, 128)),
                    jnp.broadcast_to(twhi_ref[:, s - 1:s], (L, 128)))
            # low half: x + tw*partner ; high half: partner - tw*x
            t_low = add(x, mul(tw, partner))
            t_high = sub(partner, mul(tw, x))
            x = GF(jnp.where(first, t_low.lo, t_high.lo),
                   jnp.where(first, t_low.hi, t_high.hi))
        if with_cross:
            x = mul(x, GF(clo_ref[...], chi_ref[...]))
        olo_ref[0] = x.lo
        ohi_ref[0] = x.hi

    return kernel


def _colntt(x: GF, L: int, ptw: Tuple[np.ndarray, np.ndarray],
            cross: Tuple[jax.Array, jax.Array] | None) -> GF:
    """Batched NTT along axis -2 of GF[B, L, C] (input bit-reversed along
    that axis, natural output). C is padded to a multiple of 128.
    ptw: (L, log_L) expanded stage-twiddle limb arrays."""
    B, L_, C = x.shape
    assert L_ == L
    log_L = max(L.bit_length() - 1, 1)
    Cp = -(-C // 128) * 128
    lo, hi = x.lo, x.hi
    if Cp != C:
        pad = ((0, 0), (0, 0), (0, Cp - C))
        lo, hi = jnp.pad(lo, pad), jnp.pad(hi, pad)
    twlo = jnp.asarray(ptw[0])
    twhi = jnp.asarray(ptw[1])

    data_spec = pl.BlockSpec((1, L, 128), lambda b, c: (b, 0, c),
                             memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((L, log_L), lambda b, c: (0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [data_spec, data_spec, tw_spec, tw_spec]
    args = [lo, hi, twlo, twhi]
    if cross is not None:
        clo, chi = cross
        if Cp != clo.shape[-1]:
            cpad = ((0, 0), (0, Cp - clo.shape[-1]))
            clo, chi = jnp.pad(clo, cpad), jnp.pad(chi, cpad)
        cross_spec = pl.BlockSpec((L, 128), lambda b, c: (0, c),
                                  memory_space=pltpu.VMEM)
        in_specs += [cross_spec, cross_spec]
        args += [clo, chi]

    out = pl.pallas_call(
        _make_colntt_kernel(L, cross is not None),
        grid=(B, Cp // 128),
        in_specs=in_specs,
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((B, L, Cp), jnp.uint32),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    res = GF(out[0], out[1])
    if Cp != C:
        res = GF(res.lo[:, :, :C], res.hi[:, :, :C])
    return res


# ----------------------------------------------------------------- frontend

def ntt_pallas(x: GF, invert: bool = False) -> GF:
    """Natural-order (i)NTT over the last axis via the 4-step kernels.

    x: GF[..., n] with supported(n); returns same shape. Safe to call
    inside jit (tables are concrete numpy, baked as constants).
    """
    shape = x.shape
    n = shape[-1]
    assert supported(n), n
    n1, n2, rev1, rev2, p1, p2, ctw = _tables_np(n, invert)
    ctw_dev = tuple(jnp.asarray(a) for a in _split64(ctw))

    xb = x.reshape((-1, n2, n1))                       # M[j2][j1]
    xb = GF(jnp.take(xb.lo, rev2, axis=1), jnp.take(xb.hi, rev2, axis=1))
    c = _colntt(xb, n2, _split64(p2), ctw_dev)         # C[k2][j1]
    # transpose + bit-reverse over j1, fused into one gather pass
    t = GF(jnp.take(c.lo.transpose(0, 2, 1), rev1, axis=1),
           jnp.take(c.hi.transpose(0, 2, 1), rev1, axis=1))
    d = _colntt(t, n1, _split64(p1), None)             # D[k1][k2]
    return d.reshape(shape)
