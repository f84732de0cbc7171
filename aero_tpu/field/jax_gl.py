"""Vectorized Goldilocks arithmetic for TPU: 2 x uint32 limbs, pure jnp.

TPUs have no native 64-bit vector integer ops, so field elements are
structure-of-arrays (lo, hi) uint32 pairs. All operations are elementwise
VPU work (XLA fuses the limb chains); the Pallas kernels in
`goldilocks_pallas.py` reuse the same limb algebra inside kernels.

Reduction strategy (branchless, "lazy to 2^64"): after mul/add the result is
any u64 congruent mod p; `canonicalize` maps into [0, p). This matches the
widely used 2^64-2^32+1 reduction identity 2^64 === 2^32 - 1 (mod p):
128-bit product (lo64, hi64) with hi64 = hh*2^32 + hl reduces to
lo64 - hh + hl*(2^32-1) with carry fix-ups.

This module is the oracle-checked compute core (tested against
aero_tpu.spec.field); the reference's equivalent is its Cairo field
emulation (src/utils/math_goldilocks.cairo) and the forked winterfell
f64 field.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

P = (1 << 64) - (1 << 32) + 1
EPSILON = (1 << 32) - 1  # 2^64 mod p

U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


class GF(NamedTuple):
    """Structure-of-arrays Goldilocks element(s): value = lo + hi * 2^32."""
    lo: jax.Array  # uint32
    hi: jax.Array  # uint32

    @property
    def shape(self):
        return self.lo.shape

    def reshape(self, *shape):
        return GF(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def __getitem__(self, idx):
        return GF(self.lo[idx], self.hi[idx])


# ----------------------------------------------------------------- conversion

def to_gf(x) -> GF:
    """numpy array (object/int -> canonical u64) or python ints -> GF."""
    arr = np.asarray(x, dtype=np.uint64)
    lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    return GF(jnp.asarray(lo), jnp.asarray(hi))


def from_gf(x: GF) -> np.ndarray:
    """GF -> numpy uint64 (canonicalized)."""
    x = canonicalize(x)
    lo = np.asarray(jax.device_get(x.lo)).astype(np.uint64)
    hi = np.asarray(jax.device_get(x.hi)).astype(np.uint64)
    return lo | (hi << np.uint64(32))


def gf_zeros(shape) -> GF:
    z = jnp.zeros(shape, dtype=U32)
    return GF(z, z)


def gf_full(shape, value: int) -> GF:
    value %= P
    return GF(jnp.full(shape, value & 0xFFFFFFFF, dtype=U32),
              jnp.full(shape, value >> 32, dtype=U32))


def gf_where(mask, a: GF, b: GF) -> GF:
    return GF(jnp.where(mask, a.lo, b.lo), jnp.where(mask, a.hi, b.hi))


def gf_concat(parts, axis=0) -> GF:
    return GF(jnp.concatenate([p.lo for p in parts], axis=axis),
              jnp.concatenate([p.hi for p in parts], axis=axis))


def gf_reshape(x: GF, shape) -> GF:
    return GF(x.lo.reshape(shape), x.hi.reshape(shape))


def gf_take(x: GF, idx, axis=0) -> GF:
    return GF(jnp.take(x.lo, idx, axis=axis), jnp.take(x.hi, idx, axis=axis))


# ------------------------------------------------------------- u64 primitives

def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out (0/1 uint32)."""
    lo = alo + blo
    c = (lo < alo).astype(U32)
    hi = ahi + bhi
    c2 = (hi < ahi).astype(U32)
    hi2 = hi + c
    c3 = (hi2 < hi).astype(U32)
    return lo, hi2, c2 | c3


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out (0/1 uint32)."""
    lo = alo - blo
    b1 = (alo < blo).astype(U32)
    hi = ahi - bhi
    b2 = (ahi < bhi).astype(U32)
    hi2 = hi - b1
    b3 = (hi < b1).astype(U32)
    return lo, hi2, b2 | b3


def _mul32_wide(x, y):
    """32x32 -> 64 bit product as (lo, hi) uint32, via 16-bit limbs."""
    xl = x & _MASK16
    xh = x >> 16
    yl = y & _MASK16
    yh = y >> 16
    ll = xl * yl
    lh = xl * yh
    hl = xh * yl
    hh = xh * yh
    mid = lh + hl
    mid_carry = (mid < lh).astype(U32)  # overflowed 2^32
    lo = ll + (mid << 16)
    lo_carry = (lo < ll).astype(U32)
    hi = hh + (mid >> 16) + (mid_carry << 16) + lo_carry
    return lo, hi


def _mul64_wide(a: GF, b: GF):
    """64x64 -> 128 bit product as four uint32 limbs (c0..c3, little-endian)."""
    p0l, p0h = _mul32_wide(a.lo, b.lo)          # 2^0
    p1l, p1h = _mul32_wide(a.lo, b.hi)          # 2^32
    p2l, p2h = _mul32_wide(a.hi, b.lo)          # 2^32
    p3l, p3h = _mul32_wide(a.hi, b.hi)          # 2^64

    c0 = p0l
    # limb 1: p0h + p1l + p2l
    s1 = p0h + p1l
    c1a = (s1 < p0h).astype(U32)
    c1 = s1 + p2l
    c1b = (c1 < s1).astype(U32)
    carry1 = c1a + c1b
    # limb 2: p1h + p2h + p3l + carry1
    s2 = p1h + p2h
    c2a = (s2 < p1h).astype(U32)
    s2b = s2 + p3l
    c2b = (s2b < s2).astype(U32)
    c2 = s2b + carry1
    c2c = (c2 < s2b).astype(U32)
    carry2 = c2a + c2b + c2c
    # limb 3: p3h + carry2 (cannot overflow)
    c3 = p3h + carry2
    return c0, c1, c2, c3


def _reduce128(c0, c1, c2, c3) -> GF:
    """(c0 + c1*2^32 + c2*2^64 + c3*2^96) mod p, lazily reduced to u64."""
    # x mod p = lo64 - hi_hi + hi_lo * EPSILON  (hi_lo = c2, hi_hi = c3)
    # step 1: t = lo64 - c3 (borrow -> subtract EPSILON, i.e. add p === -2^64)
    t_lo, t_hi, borrow = _sub64(c0, c1, c3, jnp.zeros_like(c3))
    # on borrow subtract EPSILON (0xffffffff, 0)
    bl = borrow * jnp.uint32(0xFFFFFFFF)
    t_lo2, t_hi2, _ = _sub64(t_lo, t_hi, bl, jnp.zeros_like(bl))
    # step 2: add c2 * EPSILON = c2*2^32 - c2
    e_lo, e_hi, _ = _sub64(jnp.zeros_like(c2), c2, c2, jnp.zeros_like(c2))
    r_lo, r_hi, carry = _add64(t_lo2, t_hi2, e_lo, e_hi)
    # on carry add EPSILON
    cl = carry * jnp.uint32(0xFFFFFFFF)
    r_lo2, r_hi2, carry2 = _add64(r_lo, r_hi, cl, jnp.zeros_like(cl))
    # a second carry is impossible: r <= 2^64-1 + eps < 2^65 - handled above
    return GF(r_lo2, r_hi2)


# ----------------------------------------------------------------- field ops

def add(a: GF, b: GF) -> GF:
    lo, hi, carry = _add64(a.lo, a.hi, b.lo, b.hi)
    # 2^64 === EPSILON
    cl = carry * jnp.uint32(0xFFFFFFFF)
    lo2, hi2, carry2 = _add64(lo, hi, cl, jnp.zeros_like(cl))
    c2l = carry2 * jnp.uint32(0xFFFFFFFF)
    lo3, hi3, _ = _add64(lo2, hi2, c2l, jnp.zeros_like(c2l))
    return GF(lo3, hi3)


def sub(a: GF, b: GF) -> GF:
    lo, hi, borrow = _sub64(a.lo, a.hi, b.lo, b.hi)
    bl = borrow * jnp.uint32(0xFFFFFFFF)
    lo2, hi2, borrow2 = _sub64(lo, hi, bl, jnp.zeros_like(bl))
    b2l = borrow2 * jnp.uint32(0xFFFFFFFF)
    lo3, hi3, _ = _sub64(lo2, hi2, b2l, jnp.zeros_like(b2l))
    return GF(lo3, hi3)


def neg(a: GF) -> GF:
    return sub(gf_zeros(a.shape), a)


def mul(a: GF, b: GF) -> GF:
    return _reduce128(*_mul64_wide(a, b))


def square(a: GF) -> GF:
    return mul(a, a)


def mul_scalar(a: GF, c: int) -> GF:
    """Multiply by a compile-time constant."""
    c %= P
    b = GF(jnp.full(a.lo.shape, c & 0xFFFFFFFF, dtype=U32),
           jnp.full(a.lo.shape, c >> 32, dtype=U32))
    return mul(a, b)


def mul_pow2_const(a: GF, k: int) -> GF:
    """a * 2^k mod p for a compile-time k — shifts + lazy folds, ZERO
    vector multiplies. 2 has order 192 in Goldilocks (2^96 === -1), so
    every 64th root of unity is a power of two; the NTT's small-order
    twiddles (in particular w_4 = 2^48, used by every radix-4 butterfly)
    take this path instead of the 16-mult limb product."""
    k %= 192
    negate = k >= 96
    k %= 96
    q, r = divmod(k, 32)
    lo, hi = a.lo, a.hi
    z = jnp.zeros_like(lo)
    if r == 0:
        parts = [lo, hi]             # statically only two limbs
    else:
        parts = [lo << r, (hi << r) | (lo >> (32 - r)), hi >> (32 - r)]
    # 5-limb value with the parts at limb offset q (q in {0,1,2});
    # absent limbs are statically zero and their folds are skipped
    limbs = [None] * q + parts + [None] * (3 - len(parts) - q + 2)
    c0, c1, c2, c3, c4 = limbs[:5]
    # folds: 2^64 === 2^32 - 1, 2^96 === -1, 2^128 === -2^32  (mod p)
    out = GF(c0 if c0 is not None else z, c1 if c1 is not None else z)
    if c2 is not None:
        out = add(out, GF(z, c2))
        out = sub(out, GF(c2, z))
    if c3 is not None:
        out = sub(out, GF(c3, z))
    if c4 is not None:
        out = sub(out, GF(z, c4))
    if negate:
        out = sub(gf_zeros(a.shape), out)
    return out


def canonicalize(a: GF) -> GF:
    """Map lazy u64 representation into [0, p)."""
    # a >= p  iff  hi == 0xffffffff and lo >= 1... precisely: a >= p
    ge = (a.hi == jnp.uint32(0xFFFFFFFF)) & (a.lo >= jnp.uint32(1))
    lo, hi, _ = _sub64(a.lo, a.hi, jnp.uint32(1), jnp.uint32(0xFFFFFFFF))
    return gf_where(ge, GF(lo, hi), a)


def pow_const(a: GF, e: int) -> GF:
    """a^e for a compile-time exponent (square-and-multiply, unrolled)."""
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    if result is None:
        return gf_full(a.shape, 1)
    return result


def pow_loop(a: GF, e: int) -> GF:
    """a^e via a fori_loop square-and-multiply over the exponent bits.

    Compiles to a tiny module (2 muls in the loop body) — use instead of
    pow_const in large fused graphs: XLA:CPU compile time grows
    superlinearly with flat op count."""
    nbits = max(e.bit_length(), 1)
    bits = jnp.asarray(np.array([(e >> i) & 1 for i in range(nbits)],
                                dtype=np.bool_))

    def body(i, carry):
        res, base = carry
        res = gf_where(bits[i], mul(res, base), res)
        base = square(base)
        return res, base

    res0 = gf_full(a.shape, 1)
    res, _ = jax.lax.fori_loop(0, nbits, body, (res0, a))
    return res


def inv(a: GF) -> GF:
    """Fermat inverse a^(p-2) (elementwise, loop-form square-and-multiply)."""
    return pow_loop(a, P - 2)


def batch_inv(a: GF, axis: int = -1) -> GF:
    """Montgomery batch inversion along `axis` using a log-depth scan:
    one Fermat inversion total + O(n) muls."""
    prod = jax.lax.associative_scan(mul, a, axis=axis)
    total = inv(prod[(slice(None),) * (axis % len(a.shape)) + (slice(-1, None),)]
                if False else _take_last(prod, axis))
    # inv of each prefix: suffix trick
    shifted = _shift_right_one(prod, axis)
    inv_prefix = _reverse_cumulative(a, prod, total, axis)
    return mul(inv_prefix, shifted)


def _take_last(x: GF, axis):
    idx = [slice(None)] * len(x.shape)
    idx[axis] = slice(-1, None)
    return GF(x.lo[tuple(idx)], x.hi[tuple(idx)])


def _shift_right_one(prod: GF, axis):
    """[1, prod_0, prod_1, ..., prod_{n-2}]"""
    n = prod.shape[axis]
    idx = [slice(None)] * len(prod.shape)
    idx[axis] = slice(0, n - 1)
    head_shape = list(prod.shape)
    head_shape[axis] = 1
    one = gf_full(tuple(head_shape), 1)
    return gf_concat([one, GF(prod.lo[tuple(idx)], prod.hi[tuple(idx)])], axis=axis)


def _reverse_cumulative(a: GF, prod: GF, total_inv: GF, axis):
    """inverse of prefix products: inv(prod_i) for each i."""
    # inv(prod_i) = total_inv * prod_{i+1..n-1 elements}  (suffix product)
    # suffix product = reverse(assoc_scan(reverse(a)))  shifted
    rev = GF(jnp.flip(a.lo, axis=axis), jnp.flip(a.hi, axis=axis))
    rprod = jax.lax.associative_scan(mul, rev, axis=axis)
    suffix = GF(jnp.flip(rprod.lo, axis=axis), jnp.flip(rprod.hi, axis=axis))
    # suffix_i = prod of a_i..a_{n-1}; we need prod of a_{i+1}..a_{n-1}
    n = a.shape[axis]
    idx = [slice(None)] * len(a.shape)
    idx[axis] = slice(1, n)
    tail_shape = list(a.shape)
    tail_shape[axis] = 1
    one = gf_full(tuple(tail_shape), 1)
    suffix_excl = gf_concat(
        [GF(suffix.lo[tuple(idx)], suffix.hi[tuple(idx)]), one], axis=axis)
    # inv(prod_i) = suffix_excl_i * total_inv
    t = GF(jnp.broadcast_to(total_inv.lo, a.shape),
           jnp.broadcast_to(total_inv.hi, a.shape))
    return mul(suffix_excl, t)


# ------------------------------------------------------- derived device utils

def power_series(base_int: int, n: int, scale_int: int = 1) -> GF:
    """[scale, scale*base, scale*base^2, ...] of length n.

    Built by log-doubling (concat + one elementwise mul per doubling) —
    deliberately avoids lax.associative_scan, which feeds an XLA:CPU
    algebraic-simplifier pathology under SPMD partitioning."""
    assert n & (n - 1) == 0, "power_series length must be a power of 2"
    out = gf_full((1,), scale_int % P)
    length = 1
    b = base_int % P
    while length < n:
        out = gf_concat([out, mul_scalar(out, b)])
        b = b * b % P
        length *= 2
    return out


def gf_sum(x: GF, axis: int = -1) -> GF:
    """Field sum along `axis` via pairwise tree reduction."""
    axis = axis % len(x.shape)
    n = x.shape[axis]
    while n > 1:
        half = n // 2
        idx_a = [slice(None)] * len(x.shape)
        idx_b = [slice(None)] * len(x.shape)
        idx_a[axis] = slice(0, half)
        idx_b[axis] = slice(half, 2 * half)
        a = GF(x.lo[tuple(idx_a)], x.hi[tuple(idx_a)])
        b = GF(x.lo[tuple(idx_b)], x.hi[tuple(idx_b)])
        s = add(a, b)
        if n % 2:
            idx_r = [slice(None)] * len(x.shape)
            idx_r[axis] = slice(2 * half, n)
            s = gf_concat([s, GF(x.lo[tuple(idx_r)], x.hi[tuple(idx_r)])], axis=axis)
            n = half + 1
        else:
            x = s
            n = half
            continue
        x = s
    return x


def _eval_rows_core(polys: GF, zp: GF) -> GF:
    terms = mul(polys, GF(jnp.broadcast_to(zp.lo, polys.shape),
                          jnp.broadcast_to(zp.hi, polys.shape)))
    s = gf_sum(terms, axis=-1)
    return GF(s.lo.squeeze(-1), s.hi.squeeze(-1))


_eval_rows_jit = jax.jit(_eval_rows_core)


def eval_polys_at(polys: GF, z_int: int) -> np.ndarray:
    """Evaluate GF[..., n] coefficient rows at the scalar z; returns uint64.

    Chunked over the leading (row) axis for wide inputs (the term array
    materializes the full operand — at the 2^20-row proof scale a
    72 x 2^20 temp on a nearly-full HBM is an OOM), with the chunk
    reduction jitted off-CPU (the eager gf_sum tree costs ~100 remote
    compiles per proof through the axon relay)."""
    n = polys.shape[-1]
    zp = power_series(z_int, n)
    core = _eval_rows_core if jax.default_backend() == "cpu" \
        else _eval_rows_jit
    if polys.lo.ndim == 2 and polys.lo.size > (1 << 25):
        w = polys.shape[0]
        chunk = max(1, (1 << 25) // n)
        return np.concatenate(
            [from_gf(core(polys[i:i + chunk], zp))
             for i in range(0, w, chunk)])
    return from_gf(core(polys, zp))


@functools.partial(jax.jit, static_argnames=("n",))
def power_series_dyn(bases: GF, n: int) -> GF:
    """[b^0 .. b^(n-1)] for every scalar in bases GF[k] -> GF[k, n], with
    the bases TRACED (one compiled module serves every z drawn by the
    transcript; the host-int power_series builds a fresh constant chain
    per value — ~log2(n) eager dispatches each)."""
    k = bases.shape[0]
    out = GF(jnp.ones((k, 1), jnp.uint32), jnp.zeros((k, 1), jnp.uint32))
    b = bases.reshape(k, 1)
    length = 1
    while length < n:
        out = gf_concat([out, mul(out, GF(jnp.broadcast_to(b.lo, out.shape),
                                          jnp.broadcast_to(b.hi, out.shape)))],
                        axis=-1)
        b = mul(b, b)
        length *= 2
    return out


@jax.jit
def _eval_multi_core(polys: GF, zps: GF) -> GF:
    """GF[w, n] coefficient rows x GF[k, n] power series -> GF[k, w]."""
    t = mul(GF(polys.lo[None, :, :], polys.hi[None, :, :]),
            GF(zps.lo[:, None, :], zps.hi[:, None, :]))
    s = gf_sum(t, axis=-1)
    return GF(s.lo.squeeze(-1), s.hi.squeeze(-1))


def eval_polys_multi(polys: GF, zs) -> np.ndarray:
    """Evaluate GF[w, n] coefficient rows at EVERY scalar in `zs` with one
    compiled module: returns uint64 (k, w). Replaces k separate
    eval_polys_at calls (k modules + k sync floors) in the prover's OOD
    stage; chunked over w to bound the (k, w_chunk, n) term array."""
    w, n = polys.shape
    k = len(zs)
    bases = to_gf(np.array([int(z) % P for z in zs], dtype=np.uint64))
    zps = power_series_dyn(bases, n)
    budget = max(1, (1 << 25) // max(n * k, 1))
    if w <= budget:
        return from_gf(_eval_multi_core(polys, zps))
    cw = min(budget, 8)
    pad = (-w) % cw
    if pad:
        z = GF(jnp.zeros((pad, n), jnp.uint32), jnp.zeros((pad, n), jnp.uint32))
        polys = gf_concat([polys, z], axis=0)
    out = np.concatenate(
        [from_gf(_eval_multi_core(polys[i:i + cw], zps))
         for i in range(0, w + pad, cw)], axis=1)
    return out[:, :w]


def gf_cumprod(x: GF, axis: int = -1) -> GF:
    """Inclusive prefix product along `axis` (log-depth associative scan) —
    the device-side running-product bus builder primitive."""
    return jax.lax.associative_scan(mul, x, axis=axis)


def gf_cumsum(x: GF, axis: int = -1) -> GF:
    """Inclusive prefix sum along `axis` (log-depth associative scan) —
    the device-side LogUp running-sum primitive."""
    return jax.lax.associative_scan(add, x, axis=axis)
