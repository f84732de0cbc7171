"""Vectorized Goldilocks arithmetic on HOST numpy uint64 arrays.

Used to build NTT twiddle tables without touching jax: tables built inside
a jit trace must stay concrete (a jnp-built table would cache tracers —
see ntt.Twiddles). All ops are branchless u64 limb arithmetic; products of
32-bit limbs fit u64 exactly.
"""

from __future__ import annotations

import numpy as np

P = np.uint64((1 << 64) - (1 << 32) + 1)
_M32 = np.uint64(0xFFFFFFFF)
_EPS = np.uint64(0xFFFFFFFF)  # 2^64 mod p
_32 = np.uint64(32)


def _mul128(a: np.ndarray, b: np.ndarray):
    """u64 x u64 -> (lo64, hi64) numpy uint64 arrays."""
    al, ah = a & _M32, a >> _32
    bl, bh = b & _M32, b >> _32
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl                      # may wrap mod 2^64
    mid_carry = (mid < lh).astype(np.uint64)   # wrapped -> +2^64
    lo = ll + (mid << _32)
    lo_carry = (lo < ll).astype(np.uint64)
    hi = hh + (mid >> _32) + (mid_carry << _32) + lo_carry
    return lo, hi


def mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a * b) mod p, canonical, elementwise on uint64 arrays."""
    lo, hi = _mul128(np.asarray(a, np.uint64), np.asarray(b, np.uint64))
    hi_lo = hi & _M32
    hi_hi = hi >> _32
    # t = lo - hi_hi (mod p): borrow => subtract EPSILON
    t = lo - hi_hi
    borrow = (lo < hi_hi)
    t = t - np.where(borrow, _EPS, np.uint64(0))
    # t += hi_lo * EPSILON = (hi_lo << 32) - hi_lo
    e = (hi_lo << _32) - hi_lo
    r = t + e
    carry = (r < t)
    r = r + np.where(carry, _EPS, np.uint64(0))
    # canonicalize
    ge = r >= P
    return r - np.where(ge, P, np.uint64(0))


def power_series(base: int, n: int, scale: int = 1) -> np.ndarray:
    """[scale, scale*base, ..., scale*base^(n-1)] mod p as uint64 (n = 2^k)."""
    out = np.empty(n, dtype=np.uint64)
    out[0] = scale % int(P)
    length = 1
    b = base % int(P)
    while length < n:
        out[length:2 * length] = mul(out[:length], np.uint64(b))
        b = b * b % int(P)
        length *= 2
    return out
