"""Radix-2 NTT / iNTT / low-degree extension over Goldilocks, batched, jnp.

Replaces the reference's winterfell fft (`Matrix::interpolate_columns` /
`evaluate_columns_over`, used at aero-sdk/miden-wasm/src/proving_worker.rs:273-274)
with a TPU-friendly formulation:

- natural-order results: evals[i] = poly(w^i), matching spec.polys.ntt_naive;
- decimation-in-time with one bit-reversal gather + log2(n) reshape-local
  butterfly stages (contiguous reshapes only, no transposes — XLA keeps each
  stage a single fused elementwise pass over HBM);
- batched over leading axes (columns of a trace);
- all twiddle tables precomputed host-side once per size and cached.

The coset LDE folds the offset into the coefficients (c_i * offset^i) and
runs a size-n*blowup NTT, like winterfell's evaluate_poly_with_offset.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import field as F
from ..field import (GF, to_gf, add, sub, mul, gf_take, mul_scalar,
                     mul_pow2_const)


class Twiddles:
    """Host-side twiddle cache: per (log_n, invert) a list of per-stage GF
    arrays, plus bit-reversal index tables."""

    _cache: Dict[Tuple[int, bool], list] = {}
    _bitrev: Dict[int, np.ndarray] = {}

    @classmethod
    def stages(cls, log_n: int, invert: bool):
        # cached as NUMPY limb pairs (never jax arrays: a jax array created
        # inside a jit trace would leak a tracer into the cache)
        key = (log_n, invert)
        if key not in cls._cache:
            w = F.get_root_of_unity(log_n)
            if invert:
                w = F.inv(w)
            stages = []
            for s in range(1, log_n + 1):
                m = 1 << s
                wm = F.exp(w, 1 << (log_n - s))
                tw = np.array(F.get_power_series(wm, m // 2), dtype=np.uint64)
                stages.append(((tw & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                               (tw >> np.uint64(32)).astype(np.uint32)))
            cls._cache[key] = stages
        return [GF(jnp.asarray(lo), jnp.asarray(hi))
                for lo, hi in cls._cache[key]]

    _r4cache: Dict[Tuple[int, int, bool], tuple] = {}

    @classmethod
    def radix4(cls, log_n: int, s: int, invert: bool):
        """Twiddles (w^j, w^2j, w^3j) for the fused stage pair (s, s+1),
        w = the order-2^(s+1) root derived from the size-n primitive root;
        j < 2^(s-1)."""
        key = (log_n, s, invert)
        if key not in cls._r4cache:
            w = F.get_root_of_unity(log_n)
            if invert:
                w = F.inv(w)
            wm2 = F.exp(w, 1 << (log_n - s - 1))    # order 2^(s+1)
            half = 1 << (s - 1)

            def limbs(base):
                tw = np.array(F.get_power_series(base, half), dtype=np.uint64)
                return ((tw & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                        (tw >> np.uint64(32)).astype(np.uint32))

            cls._r4cache[key] = tuple(
                limbs(F.exp(wm2, e)) for e in (1, 2, 3))
        return tuple(GF(jnp.asarray(lo), jnp.asarray(hi))
                     for lo, hi in cls._r4cache[key])

    @classmethod
    def bitrev(cls, log_n: int) -> np.ndarray:
        if log_n not in cls._bitrev:
            n = 1 << log_n
            idx = np.arange(n)
            rev = np.zeros(n, dtype=np.int32)
            for b in range(log_n):
                rev |= ((idx >> b) & 1) << (log_n - 1 - b)
            cls._bitrev[log_n] = rev
        return cls._bitrev[log_n]


def _radix2_stage(x: GF, n: int, s: int, tw: GF) -> GF:
    batch = x.shape[:-1]
    m = 1 << s
    xr = x.reshape(batch + (n // m, 2, m // 2))
    even = xr[..., 0, :]
    odd = xr[..., 1, :]
    t = mul(odd, GF(jnp.broadcast_to(tw.lo, odd.shape),
                    jnp.broadcast_to(tw.hi, odd.shape)))
    lo = add(even, t)
    hi = sub(even, t)
    return GF(jnp.concatenate([lo.lo[..., None, :], hi.lo[..., None, :]], axis=-2),
              jnp.concatenate([lo.hi[..., None, :], hi.hi[..., None, :]], axis=-2)
              ).reshape(batch + (n,))


def _ntt_core(x: GF, log_n: int, invert: bool) -> GF:
    """Radix-4 decimation-in-time over bit-reversed input.

    Two consecutive radix-2 stages (s, s+1) fuse into one pass with
    3 full twiddle muls + 1 shift-mul per 4 elements (w_4 = 2^48 is a
    power of two in Goldilocks — mul_pow2_const) instead of 4 full muls
    across 2 passes; the first pair (all twiddles 1) is mul-free.
    Bit-exact vs the radix-2 formulation (same DFT, regrouped)."""
    n = 1 << log_n
    batch = x.shape[:-1]
    rev = jnp.asarray(Twiddles.bitrev(log_n))
    x = gf_take(x, rev, axis=-1)
    k4 = 144 if invert else 48      # w_4 = 2^48, w_4^-1 = 2^144

    def combine4(A, B, C, D, G, half):
        # outputs of stages (s, s+1) for inputs at (a=0/1, b=0/1, j):
        #   E0 = A+B', E1 = A-B', F0 = C'+D', F1 = w_4*(C'-D')
        E0, E1 = add(A, B), sub(A, B)
        F0 = add(C, D)
        F1 = mul_pow2_const(sub(C, D), k4)
        g0, g1 = add(E0, F0), add(E1, F1)
        g2, g3 = sub(E0, F0), sub(E1, F1)
        return GF(
            jnp.stack([g0.lo, g1.lo, g2.lo, g3.lo], axis=-2),
            jnp.stack([g0.hi, g1.hi, g2.hi, g3.hi], axis=-2),
        ).reshape(batch + (n,))

    s = 1
    while s + 1 <= log_n:
        m = 1 << s
        half = m // 2
        G = n // (2 * m)
        xr = x.reshape(batch + (G, 4, half))
        A, B, C, D = xr[..., 0, :], xr[..., 1, :], xr[..., 2, :], xr[..., 3, :]
        if s == 1:
            # w_2^0 = w_4^0 = 1: no twiddle muls at all
            x = combine4(A, B, C, D, G, half)
        else:
            t1, t2, t3 = Twiddles.radix4(log_n, s, invert)  # w^j, w^2j, w^3j

            def bc(tw, ref):
                return GF(jnp.broadcast_to(tw.lo, ref.shape),
                          jnp.broadcast_to(tw.hi, ref.shape))

            x = combine4(A, mul(B, bc(t2, B)), mul(C, bc(t1, C)),
                         mul(D, bc(t3, D)), G, half)
        s += 2
    if s == log_n:  # odd log_n: one trailing radix-2 stage
        tw = Twiddles.stages(log_n, invert)[s - 1]
        x = _radix2_stage(x, n, s, tw)
    if invert:
        x = mul_scalar(x, F.inv(n))
    return x


# In this size window on TPU, dispatch to the MXU 4-step limb-matmul
# DFT (ntt_mxu.py): bit-exact, ~1.3x the radix-4 VPU path at 2^18 (the
# DFT work moves off the VPU u32-multiply roofline onto the systolic
# array). The 4-step's per-point cost grows as sqrt(n) (vs log n for
# the radix path); the per-k kernel choice inside _four_step (schoolbook
# tiles <= 512, Karatsuba >= 1024) keeps it ahead up to 2^21.
_MXU_MIN_N = 1 << 16
_MXU_MAX_N = 1 << 20    # 2^21 tiles (k=2048) exceed the
                         # remote-compile request size (constant matrices)


def _dispatch(x: GF, log_n: int, invert: bool) -> GF:
    n = 1 << log_n
    if (_MXU_MIN_N <= n <= _MXU_MAX_N
            and jax.default_backend() not in ("cpu",)):
        from .ntt_mxu import _four_step
        k1 = 1 << (log_n // 2)
        return _four_step(x, k1, n // k1, invert)
    return _ntt_core(x, log_n, invert)


@jax.jit
def ntt(coeffs: GF) -> GF:
    """Coefficients -> evaluations over the size-n subgroup (natural order)."""
    n = coeffs.shape[-1]
    return _dispatch(coeffs, n.bit_length() - 1, invert=False)


@jax.jit
def intt(evals: GF) -> GF:
    """Evaluations (natural order) -> coefficients."""
    n = evals.shape[-1]
    return _dispatch(evals, n.bit_length() - 1, invert=True)


@functools.lru_cache(maxsize=32)
def _offset_powers_np(n: int, offset: int):
    arr = np.array(F.get_power_series(offset, n), dtype=np.uint64)
    return ((arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (arr >> np.uint64(32)).astype(np.uint32))


def _offset_powers(n: int, offset: int) -> GF:
    lo, hi = _offset_powers_np(n, offset)
    return GF(jnp.asarray(lo), jnp.asarray(hi))


@functools.partial(jax.jit, static_argnames=("log_blowup", "offset"))
def lde(coeffs: GF, log_blowup: int, offset: int = F.DOMAIN_OFFSET) -> GF:
    """Evaluate degree-<n polynomials over the coset offset*<w_{n*blowup}>.

    coeffs: GF[..., n]; returns GF[..., n << log_blowup] in natural order.

    Two bit-exact formulations, picked per backend:

    - TPU: `blowup` SEPARATE size-n coset NTTs (coset t holds the target
      points offset*w_m^t*<w_n>, landing at output positions
      t + blowup*i): fewer butterflies (blowup*n/2*log n vs m/2*log m)
      and each NTT stays at size n where the MXU 4-step window applies.
    - CPU (tests + the multi-chip SPMD dryrun): ONE padded size-m NTT
      (winterfell's evaluate_poly_with_offset shape). The coset
      decomposition emits ~blowup x the HLO, which put the XLA:CPU SPMD
      partitioner past the driver's compile budget (MULTICHIP_r04
      rc:124); one size-m NTT keeps stage count at log m.
    """
    n = coeffs.shape[-1]
    m = n << log_blowup
    log_n = n.bit_length() - 1
    batch = coeffs.shape[:-1]
    if jax.default_backend() == "cpu":
        sc = _offset_powers(n, offset)
        scaled = mul(coeffs, GF(jnp.broadcast_to(sc.lo, coeffs.shape),
                                jnp.broadcast_to(sc.hi, coeffs.shape)))
        pad = [(0, 0)] * len(batch) + [(0, m - n)]
        padded = GF(jnp.pad(scaled.lo, pad), jnp.pad(scaled.hi, pad))
        return _dispatch(padded, m.bit_length() - 1, invert=False)
    w_m = F.get_root_of_unity(m.bit_length() - 1)
    outs = []
    for t in range(1 << log_blowup):
        base = F.mul(offset, F.exp(w_m, t))
        sc = _offset_powers(n, base)
        scaled = mul(coeffs, GF(jnp.broadcast_to(sc.lo, coeffs.shape),
                                jnp.broadcast_to(sc.hi, coeffs.shape)))
        outs.append(_dispatch(scaled, log_n, invert=False))
    # interleave: outs[t][..., i] -> out[..., blowup*i + t]
    lo = jnp.stack([o.lo for o in outs], axis=-1)
    hi = jnp.stack([o.hi for o in outs], axis=-1)
    return GF(lo.reshape(batch + (m,)), hi.reshape(batch + (m,)))


def lde_from_evals(evals: GF, log_blowup: int, offset: int = F.DOMAIN_OFFSET) -> GF:
    """Trace evaluations over the size-n subgroup -> evaluations over the
    blown-up coset (the prover's interpolate + extend step)."""
    return lde(intt(evals), log_blowup, offset)
