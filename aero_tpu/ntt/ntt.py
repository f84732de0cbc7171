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
from ..field import GF, to_gf, add, sub, mul, gf_take, mul_scalar


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


def _ntt_core(x: GF, log_n: int, invert: bool) -> GF:
    n = 1 << log_n
    batch = x.shape[:-1]
    # decimation in time: bit-reverse input, natural-order output
    rev = jnp.asarray(Twiddles.bitrev(log_n))
    x = gf_take(x, rev, axis=-1)
    stages = Twiddles.stages(log_n, invert)
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        tw = stages[s - 1]  # shape (half,)
        xr = x.reshape(batch + (n // m, 2, half))
        even = xr[..., 0, :]
        odd = xr[..., 1, :]
        t = mul(odd, GF(jnp.broadcast_to(tw.lo, odd.shape),
                        jnp.broadcast_to(tw.hi, odd.shape)))
        lo = add(even, t)
        hi = sub(even, t)
        x = GF(jnp.concatenate([lo.lo[..., None, :], hi.lo[..., None, :]], axis=-2),
               jnp.concatenate([lo.hi[..., None, :], hi.hi[..., None, :]], axis=-2)
               ).reshape(batch + (n,))
    if invert:
        x = mul_scalar(x, F.inv(n))
    return x


@jax.jit
def ntt(coeffs: GF) -> GF:
    """Coefficients -> evaluations over the size-n subgroup (natural order)."""
    n = coeffs.shape[-1]
    return _ntt_core(coeffs, n.bit_length() - 1, invert=False)


@jax.jit
def intt(evals: GF) -> GF:
    """Evaluations (natural order) -> coefficients."""
    n = evals.shape[-1]
    return _ntt_core(evals, n.bit_length() - 1, invert=True)


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
    """
    n = coeffs.shape[-1]
    m = n << log_blowup
    opow = _offset_powers(n, offset)
    scaled = mul(coeffs, GF(jnp.broadcast_to(opow.lo, coeffs.shape),
                            jnp.broadcast_to(opow.hi, coeffs.shape)))
    pad = [(0, 0)] * (len(coeffs.shape) - 1) + [(0, m - n)]
    padded = GF(jnp.pad(scaled.lo, pad), jnp.pad(scaled.hi, pad))
    return ntt(padded)


def lde_from_evals(evals: GF, log_blowup: int, offset: int = F.DOMAIN_OFFSET) -> GF:
    """Trace evaluations over the size-n subgroup -> evaluations over the
    blown-up coset (the prover's interpolate + extend step)."""
    return lde(intt(evals), log_blowup, offset)
