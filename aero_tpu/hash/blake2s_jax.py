"""blake2s-256 batched over rows — the Merkle/leaf hashing compute core.

The reference parallelizes leaf hashing across browser web workers
(aero-sdk/miden-wasm/src/hashing_worker.rs:12-26, chunked at
proving_worker.rs:280-310); here the whole batch is one vectorized TPU
computation: every lane hashes one row. The protocol encoding is
hash_elements = blake2s over 32-byte-LE felts (see spec.hashing), so a felt
contributes words [lo, hi, 0*6] and a 64-byte block holds exactly 2 felts.

All rotations/xors/adds are uint32 VPU ops; rounds are unrolled statically.
Tested bit-exactly against hashlib.blake2s via the spec oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import GF, canonicalize

U32 = jnp.uint32

IV = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19], dtype=np.uint32)

# param block word 0: digest_length=32, key_len=0, fanout=1, depth=1
H0 = IV.copy()
H0[0] ^= np.uint32(0x01010020)

SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]


def _ror(x, r):
    return (x >> np.uint32(r)) | (x << np.uint32(32 - r))


def _g(v, a, b, c, d, x, y):
    v[a] = v[a] + v[b] + x
    v[d] = _ror(v[d] ^ v[a], 16)
    v[c] = v[c] + v[d]
    v[b] = _ror(v[b] ^ v[c], 12)
    v[a] = v[a] + v[b] + y
    v[d] = _ror(v[d] ^ v[a], 8)
    v[c] = v[c] + v[d]
    v[b] = _ror(v[b] ^ v[c], 7)


def _compress(h, m_cols, t_lo, final_mask):
    """One blake2s compression. h: list of 8 (batch,) u32; m_cols: list of 16
    (batch,) u32 message words; t_lo: traced u32 byte counter (t_hi always 0
    for our sizes); final_mask: traced u32 (0 or 0xFFFFFFFF)."""
    batch_shape = h[0].shape
    v = list(h) + [jnp.broadcast_to(jnp.uint32(IV[i]), batch_shape)
                   for i in range(8)]
    v[12] = v[12] ^ t_lo
    v[14] = v[14] ^ final_mask
    for rnd in range(10):
        s = SIGMA[rnd]
        _g(v, 0, 4, 8, 12, m_cols[s[0]], m_cols[s[1]])
        _g(v, 1, 5, 9, 13, m_cols[s[2]], m_cols[s[3]])
        _g(v, 2, 6, 10, 14, m_cols[s[4]], m_cols[s[5]])
        _g(v, 3, 7, 11, 15, m_cols[s[6]], m_cols[s[7]])
        _g(v, 0, 5, 10, 15, m_cols[s[8]], m_cols[s[9]])
        _g(v, 1, 6, 11, 12, m_cols[s[10]], m_cols[s[11]])
        _g(v, 2, 7, 8, 13, m_cols[s[12]], m_cols[s[13]])
        _g(v, 3, 4, 9, 14, m_cols[s[14]], m_cols[s[15]])
    return [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]


@functools.partial(jax.jit, static_argnames=("nbytes",))
def _blake2s_words_tuple(msg: jax.Array, nbytes: int):
    """Core jitted blake2s; returns the digest as a tuple of 8 (batch,)
    uint32 arrays.

    NOTE: the 8 state words are deliberately NEVER stacked/concatenated
    inside the jitted graph — XLA:CPU's fusion of a concatenate rooted on
    this deep a producer graph is pathologically slow (observed as an
    apparent runtime hang). Callers stack the tuple outside jit.
    """
    batch = msg.shape[0]
    nblocks = max(1, -(-nbytes // 64))
    if msg.shape[1] < nblocks * 16:
        msg = jnp.pad(msg, ((0, 0), (0, nblocks * 16 - msg.shape[1])))
    h0 = tuple(jnp.broadcast_to(jnp.uint32(H0[i]), (batch,)) for i in range(8))

    if nblocks == 1:
        cols = [msg[:, j] for j in range(16)]
        return tuple(_compress(list(h0), cols,
                               jnp.uint32(nbytes), jnp.uint32(0xFFFFFFFF)))

    def body(b, hst):
        block = jax.lax.dynamic_slice(msg, (0, b * 16), (batch, 16))
        cols = [block[:, j] for j in range(16)]
        is_final = b == nblocks - 1
        t_lo = jnp.where(is_final, jnp.uint32(nbytes),
                         (b.astype(U32) + 1) * jnp.uint32(64))
        fmask = jnp.where(is_final, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        return tuple(_compress(list(hst), cols, t_lo, fmask))

    return jax.lax.fori_loop(0, nblocks, body, h0)


def blake2s_words(msg: jax.Array, nbytes: int) -> jax.Array:
    """blake2s-256 of each row of `msg` (uint32 words, zero-padded).

    msg: (batch, L) uint32 with L*4 >= nbytes, rows zero-padded past nbytes.
    Returns (batch, 8) uint32 digests (LE word order = raw digest bytes).
    """
    h = _blake2s_words_tuple(msg, nbytes)
    return jnp.stack(h, axis=1)


def felt_rows_to_words(rows: GF) -> jax.Array:
    """GF[batch, cols] -> (batch, cols*8) uint32: each felt as 8 words
    [lo, hi, 0, 0, 0, 0, 0, 0] (the 32-byte-LE protocol encoding)."""
    rows = canonicalize(rows)
    batch, cols = rows.shape
    z = jnp.zeros((batch, cols, 6), dtype=U32)
    words = jnp.concatenate(
        [rows.lo[..., None], rows.hi[..., None], z], axis=-1)
    return words.reshape(batch, cols * 8)


def hash_elements_rows(rows: GF) -> jax.Array:
    """Protocol hash_elements over each row: GF[batch, cols] -> (batch, 8) u32."""
    _, cols = rows.shape
    return blake2s_words(felt_rows_to_words(rows), cols * 32)


def merge_pairs(digests: jax.Array) -> jax.Array:
    """One Merkle level: (2n, 8) u32 -> (n, 8) u32, blake2s(left || right)."""
    n2 = digests.shape[0]
    msg = digests.reshape(n2 // 2, 16)
    return blake2s_words(msg, 64)


def digests_to_bytes(digests) -> list[bytes]:
    """(n, 8) uint32 device/host array -> list of 32-byte digests."""
    arr = np.asarray(jax.device_get(digests), dtype="<u4")
    return [arr[i].tobytes() for i in range(arr.shape[0])]


# ---------------------------------------------------------------- tuple forms
# For fused (single-jit) pipelines the digest must stay a tuple of 8 (batch,)
# arrays end-to-end: concatenating the compress outputs inside a jitted graph
# triggers the XLA:CPU fusion pathology documented above.

def felt_rows_to_word_cols(rows: GF) -> list:
    """GF[batch, cols] -> list of cols*8 (batch,) uint32 word columns."""
    rows = canonicalize(rows)
    _, cols = rows.shape
    out = []
    zero = jnp.zeros_like(rows.lo[:, 0])
    for c in range(cols):
        out.extend([rows.lo[:, c], rows.hi[:, c], zero, zero, zero, zero,
                    zero, zero])
    return out


def _blake2s_cols_tuple(cols: list, nbytes: int):
    """blake2s over per-row messages given as word columns; returns tuple of
    8 (batch,) u32 arrays. Static unrolled blocks (cols is a python list)."""
    batch = cols[0].shape[0]
    nblocks = max(1, -(-nbytes // 64))
    zero = jnp.zeros_like(cols[0])
    while len(cols) < nblocks * 16:
        cols.append(zero)
    h = [jnp.broadcast_to(jnp.uint32(H0[i]), (batch,)) for i in range(8)]
    for b in range(nblocks):
        final = b == nblocks - 1
        t = nbytes if final else (b + 1) * 64
        h = _compress(h, cols[b * 16:(b + 1) * 16], jnp.uint32(t),
                      jnp.uint32(0xFFFFFFFF) if final else jnp.uint32(0))
    return tuple(h)


def hash_rows_tuple(rows: GF):
    """Protocol hash_elements per row, digest as a tuple of 8 arrays."""
    _, cols = rows.shape
    return _blake2s_cols_tuple(felt_rows_to_word_cols(rows), cols * 32)


def merge_level_tuple(digests):
    """One Merkle level on tuple digests: 8 x (2n,) -> 8 x (n,)."""
    cols = []
    for d in digests:
        cols.append(d[0::2])
    for d in digests:
        cols.append(d[1::2])
    # message = left digest (8 words) || right digest (8 words)
    msg_cols = [digests[i][0::2] for i in range(8)] + \
               [digests[i][1::2] for i in range(8)]
    return _blake2s_cols_tuple(msg_cols, 64)


def merkle_root_tuple(leaf_digests):
    """Reduce tuple leaf digests (8 x (n,)) to the root (8 x (1,))."""
    d = leaf_digests
    while d[0].shape[0] > 1:
        d = merge_level_tuple(d)
    return d
