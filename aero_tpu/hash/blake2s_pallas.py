"""blake2s-256 as a Pallas TPU kernel — the leaf-hashing hot loop.

The reference's hottest prover stage is blake2s over every trace-LDE row
(aero-sdk/miden-wasm/src/hashing_worker.rs:12-26, chunked across a browser
worker pool at proving_worker.rs:280-310). Here one Pallas kernel hashes
1024 leaves per grid step: the batch axis is spread over the VPU's full
8x128 sublane x lane grid, every vector op advances 1024 independent hash
states, and the 10 blake2s rounds run unrolled from VMEM.

Layout contract (word-major, "transposed"): messages arrive as a
(W, B) uint32 array — word w of leaf b at [w, b] — which is exactly how the
prover already stores trace columns (GF[w, m] column-major), so building
the message for `hash_elements` needs no transpose at all. The array is
reshaped (free) to (W, B/128, 128) and blocked (W, 8, 128) per grid step.

Digests come back word-major as (8, B): again the natural layout for the
Merkle merge level above (parent message = 16 digest words of two children)
and for the tuple-form consumers in parallel/sharded.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blake2s_jax import H0, _compress

TILE = 1024  # leaves per grid step = 8 sublanes x 128 lanes


def _make_kernel(nblocks: int, nbytes: int):
    def kernel(msg_ref, out_ref):
        # msg_ref: (nblocks*16, 8, 128); out_ref: (8, 8, 128)
        h0 = tuple(jnp.full((8, 128), H0[i], jnp.uint32) for i in range(8))
        if nblocks == 1:
            m = [msg_ref[j] for j in range(16)]
            h = _compress(list(h0), m, jnp.uint32(nbytes),
                          jnp.uint32(0xFFFFFFFF))
        else:
            def body(b, hst):
                m = [msg_ref[b * 16 + j] for j in range(16)]
                is_final = b == nblocks - 1
                t = jnp.where(is_final, jnp.uint32(nbytes),
                              (b.astype(jnp.uint32) + 1) * jnp.uint32(64))
                fm = jnp.where(is_final, jnp.uint32(0xFFFFFFFF),
                               jnp.uint32(0))
                return tuple(_compress(list(hst), m, t, fm))

            h = jax.lax.fori_loop(0, nblocks, body, h0)
        for i in range(8):
            out_ref[i] = h[i]

    return kernel


def blake2s_t(msg_t: jax.Array, nbytes: int) -> jax.Array:
    """blake2s-256 of B messages given word-major.

    msg_t: (W, B) uint32, word w of message b at [w, b], rows zero-padded
    past nbytes. B is padded internally to a multiple of 1024 (garbage
    lanes hashed and discarded). Returns (8, B) uint32 digests word-major.
    """
    if jax.default_backend() == "cpu":
        # CPU test mesh: same semantics through the jnp implementation,
        # dispatched OUTSIDE jit — jitting the digest stack is the XLA:CPU
        # fusion hang documented in blake2s_jax. The compiled Pallas kernel
        # is KAT-checked on the real chip by tools/tpu_check.py.
        from .blake2s_jax import blake2s_words
        return blake2s_words(msg_t.T, nbytes).T
    return _blake2s_t_tpu(msg_t, nbytes)


@functools.partial(jax.jit, static_argnames=("nbytes",))
def _blake2s_t_tpu(msg_t: jax.Array, nbytes: int) -> jax.Array:
    W, B = msg_t.shape
    nblocks = max(1, -(-nbytes // 64))
    Wp = nblocks * 16
    if W < Wp:
        msg_t = jnp.pad(msg_t, ((0, Wp - W), (0, 0)))
    elif W > Wp:
        msg_t = msg_t[:Wp]
    Bp = -(-B // TILE) * TILE
    if Bp != B:
        msg_t = jnp.pad(msg_t, ((0, 0), (0, Bp - B)))
    nb = Bp // TILE

    out = pl.pallas_call(
        _make_kernel(nblocks, nbytes),
        grid=(nb,),
        in_specs=[pl.BlockSpec((Wp, 8, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 8, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, nb * 8, 128), jnp.uint32),
    )(msg_t.reshape(Wp, nb * 8, 128))
    return out.reshape(8, Bp)[:, :B]


def felt_cols_to_words_t(cols) -> jax.Array:
    """GF[w, m] column-major -> (w*8, m) word-major hash_elements message:
    felt c contributes words [lo, hi, 0*6] (32-byte-LE protocol encoding)."""
    from ..field import canonicalize
    cols = canonicalize(cols)
    w, m = cols.shape
    z = jnp.zeros((w, 6, m), dtype=jnp.uint32)
    words = jnp.concatenate(
        [cols.lo[:, None, :], cols.hi[:, None, :], z], axis=1)
    return words.reshape(w * 8, m)


def hash_columns_t(cols) -> jax.Array:
    """Protocol hash_elements over each *row* of column-major GF[w, m]
    without transposing: returns (8, m) digests word-major."""
    w, _ = cols.shape
    return blake2s_t(felt_cols_to_words_t(cols), w * 32)


def merge_level_t(digests_t: jax.Array) -> jax.Array:
    """One Merkle level word-major: (8, 2n) -> (8, n),
    parent = blake2s(left_digest || right_digest)."""
    n2 = digests_t.shape[1]
    d = digests_t.reshape(8, n2 // 2, 2)
    msg = jnp.concatenate([d[:, :, 0], d[:, :, 1]], axis=0)  # (16, n)
    return blake2s_t(msg, 64)


def merkle_levels_t(leaf_digests_t: jax.Array):
    """All tree levels from word-major leaf digests (8, n):
    returns [(n, 8), (n/2, 8), ..., (1, 8)] host-order arrays."""
    levels = [leaf_digests_t]
    cur = leaf_digests_t
    while cur.shape[1] > 1:
        cur = merge_level_t(cur)
        levels.append(cur)
    return [lvl.T for lvl in levels]


# ------------------------------------------------------------- PoW grinding

def _clz32(x: jax.Array) -> jax.Array:
    """Count leading zeros of uint32 lanes (branchless binary search)."""
    n = jnp.zeros(x.shape, jnp.int32)
    for shift in (16, 8, 4, 2, 1):
        mask = x < (jnp.uint32(1) << np.uint32(32 - shift))
        n = n + jnp.where(mask, shift, 0)
        x = jnp.where(mask, x << np.uint32(shift), x)
    return jnp.where(x == 0, 32, jnp.minimum(n, 32))


def leading_zeros_t(d_t: jax.Array) -> jax.Array:
    """Leading zeros (bits) of the 128-bit big-endian prefix of each digest.
    d_t: (8, B) word-major digests; returns (B,) int32."""
    def bswap(x):
        return ((x & jnp.uint32(0x000000FF)) << 24) | \
               ((x & jnp.uint32(0x0000FF00)) << 8) | \
               ((x & jnp.uint32(0x00FF0000)) >> 8) | \
               ((x & jnp.uint32(0xFF000000)) >> 24)

    total = jnp.zeros(d_t.shape[1], dtype=jnp.int32)
    alive = jnp.ones(d_t.shape[1], dtype=bool)
    for w in range(4):
        be = bswap(d_t[w])
        lz = _clz32(be)
        total = total + jnp.where(alive, lz, 0)
        alive = alive & (be == 0)
    return total


def grind_pow(seed: bytes, grinding_bits: int, batch: int = 1 << 16) -> int:
    """Vectorized proof-of-work nonce search on device.

    Finds the minimal nonce with >= grinding_bits leading zeros in
    blake2s(seed || nonce_le_u64) (the reference grinds the same target
    single-threaded inside winterfell). Each round hashes `batch` nonces
    as one kernel launch.
    """
    seed_words = np.frombuffer(seed, dtype="<u4")
    assert seed_words.shape[0] == 8

    def round_fn(base, n):
        # NOT wrapped in an outer jit: blake2s_t dispatches pallas-vs-jnp
        # itself, and jitting the jnp fallback end-to-end trips the XLA:CPU
        # fusion hang documented in blake2s_jax.
        nonce = base + jnp.arange(n, dtype=jnp.uint32)
        msg = jnp.zeros((16, n), dtype=jnp.uint32)
        msg = msg.at[:8, :].set(jnp.asarray(seed_words)[:, None])
        msg = msg.at[8, :].set(nonce)       # nonce low word (hi word is 0
        # for any realistic search; asserted below)
        d = blake2s_t(msg, 40)
        lz = leading_zeros_t(d)
        ok = lz >= grinding_bits
        any_ok = jnp.any(ok)
        first = jnp.argmax(ok)
        return any_ok, first

    base = 0
    while True:
        any_ok, first = round_fn(jnp.uint32(base), batch)
        if bool(any_ok):
            return base + int(first)
        base += batch
        assert base < (1 << 32), "PoW nonce exceeded 2^32"
