"""Merkle commitment: device-side hashing, host-side opening proofs.

The hot work (leaf hashing + tree levels) runs vectorized on the TPU
(hash/blake2s_jax); the resulting node table is handed to the host where
batch opening proofs are pure index bookkeeping (spec.merkle semantics,
winterfell-compatible). Replaces the reference's worker-pool leaf hashing +
in-worker MerkleTree::new (proving_worker.rs:280-310, :152-163).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..field import GF
from ..hash import hash_elements_rows, merge_pairs
from ..spec.merkle import MerkleTree, BatchMerkleProof


def _build_levels(leaf_digests: jax.Array) -> List[jax.Array]:
    """leaf_digests (n, 8) -> [level_n, level_n/2, ..., level_1(root)]."""
    levels = [leaf_digests]
    cur = leaf_digests
    while cur.shape[0] > 1:
        cur = merge_pairs(cur)
        levels.append(cur)
    return levels


class DeviceMerkleTree:
    """Host view over device-computed tree nodes, API-compatible with
    spec.merkle.MerkleTree (root / prove / prove_batch)."""

    def __init__(self, levels: List[np.ndarray]):
        n = levels[0].shape[0]
        tree = MerkleTree.__new__(MerkleTree)
        tree.n = n
        # flat 1-indexed array: nodes[n+i] = leaf i, nodes[1] = root.
        # One bulk little-endian convert + tobytes per level, then cheap
        # 32-byte slices (the per-leaf astype/tobytes loop here was a
        # 2^20-leaf scaling bottleneck).
        nodes: List[bytes] = [b""] * (2 * n)
        for lvl, arr in enumerate(levels):
            base = n >> lvl
            k = arr.shape[0]
            buf = np.ascontiguousarray(arr.astype("<u4")).tobytes()
            nodes[base:base + k] = [buf[32 * i:32 * (i + 1)]
                                    for i in range(k)]
        tree.nodes = nodes
        self._tree = tree

    @property
    def root(self) -> bytes:
        return self._tree.root

    @property
    def depth(self) -> int:
        return self._tree.depth

    def prove(self, index: int):
        return self._tree.prove(index)

    def prove_batch(self, indexes) -> BatchMerkleProof:
        return self._tree.prove_batch(indexes)


def commit_digests(leaf_digests: jax.Array) -> DeviceMerkleTree:
    levels = _build_levels(leaf_digests)
    return DeviceMerkleTree([np.asarray(jax.device_get(l)) for l in levels])


def commit_rows(rows: GF) -> DeviceMerkleTree:
    """Commit to GF[n_leaves, row_width]: device leaf hashing + tree build."""
    return commit_digests(hash_elements_rows(rows))


def _use_pallas() -> bool:
    return jax.default_backend() not in ("cpu",)


class ResidentMerkleTree:
    """Merkle tree whose node levels STAY on device (word-major (8, size)
    uint32 arrays, levels[0] = leaves). Batch openings gather exactly the
    digests the proof ships (spec.merkle.batch_proof_coords) — a 27-query
    opening of a 2^23-leaf tree fetches ~700 digests instead of the 512 MB
    of nodes the host-resident DeviceMerkleTree would download."""

    def __init__(self, levels_t: List[jax.Array]):
        self.levels = levels_t            # levels_t[k]: (8, n >> k)
        self.n = int(levels_t[0].shape[1])
        root = np.asarray(jax.device_get(levels_t[-1][:, 0]))
        self._root = root.astype("<u4").tobytes()

    @property
    def root(self) -> bytes:
        return self._root

    @property
    def depth(self) -> int:
        return self.n.bit_length() - 1

    def _fetch(self, flat_coords: List[int]) -> dict:
        """flat-tree indices -> digest bytes, one device gather per level."""
        by_level: dict = {}
        for c in flat_coords:
            size = 1 << (c.bit_length() - 1)   # level width
            by_level.setdefault(size, []).append(c)
        out = {}
        for size, coords in by_level.items():
            lvl = self.levels[self.depth - (size.bit_length() - 1)]
            offs = jnp.asarray([c - size for c in coords], dtype=jnp.int32)
            got = np.asarray(jax.device_get(jnp.take(lvl, offs, axis=1)))
            for j, c in enumerate(coords):
                out[c] = got[:, j].astype("<u4").tobytes()
        return out

    def prove(self, index: int) -> List[bytes]:
        coords = [self.n + index]
        i = self.n + index
        while i > 1:
            coords.append(i ^ 1)
            i >>= 1
        got = self._fetch(coords)
        return [got[c] for c in coords]

    def prove_batch(self, indexes) -> BatchMerkleProof:
        from ..spec.merkle import batch_proof_coords
        leaf_coords, node_coords = batch_proof_coords(self.n, self.depth,
                                                      indexes)
        flat = list(leaf_coords) + [c for lst in node_coords for c in lst]
        got = self._fetch(flat)
        return BatchMerkleProof(
            leaves=[got[c] for c in leaf_coords],
            nodes=[[got[c] for c in lst] for lst in node_coords],
            depth=self.depth)

    # checkpointing support (prover.ProverState.to_host/to_device)
    def to_host(self):
        self.levels = [np.asarray(jax.device_get(l)) for l in self.levels]
        return self

    def to_device(self):
        self.levels = [jnp.asarray(l) for l in self.levels]
        return self


def commit_columns(cols: GF, resident: bool = True):
    """Commit to column-major GF[row_width, n_leaves] (the prover's native
    trace-LDE layout). On TPU this runs the Pallas blake2s kernel with the
    word-major layout — no row transpose at all — and (by default) keeps
    the node levels device-resident; on CPU it falls back to the jnp path
    and a host tree."""
    if _use_pallas():
        from ..hash.blake2s_pallas import hash_columns_t, merge_level_t
        w, m = cols.shape
        # the hash message materializes 8 u32 words per felt (32-byte-LE
        # protocol encoding) = 8x the trace data; chunk the leaf axis so
        # that buffer stays ~1 GB (72 cols x 2^23 leaves would otherwise
        # allocate 19 GB and OOM the 16 GB HBM)
        chunk = m
        while w * 8 * chunk * 4 > (1 << 30):
            chunk //= 2
        if chunk < m:
            cur = jnp.concatenate(
                [hash_columns_t(cols[:, i:i + chunk])
                 for i in range(0, m, chunk)], axis=1)
        else:
            cur = hash_columns_t(cols)
        # merge the big levels in FIXED-SIZE chunks so every level reuses
        # ONE compiled module (per-level shapes would load ~20 modules
        # per proof through the axon relay at ~20 s each), and finish the
        # small levels host-side (a few ms of hashlib for <= 2^15 nodes)
        CH = 1 << 15                     # parent digests per merge call
        levels = [cur]
        while cur.shape[1] > 2 * CH:
            n2 = cur.shape[1]
            cur = jnp.concatenate(
                [merge_level_t(cur[:, i:i + 2 * CH])
                 for i in range(0, n2, 2 * CH)], axis=1)
            levels.append(cur)
        host_cur = np.asarray(jax.device_get(cur)).astype("<u4")
        while host_cur.shape[1] > 1:
            host_cur = _merge_level_host(host_cur)
            levels.append(host_cur)
        if resident:
            return ResidentMerkleTree(levels)
        return DeviceMerkleTree(
            [np.asarray(jax.device_get(l)).T for l in levels])
    return commit_rows(GF(cols.lo.T, cols.hi.T))


def _merge_level_host(d: np.ndarray) -> np.ndarray:
    """One Merkle level on the host: word-major (8, 2n) uint32 -> (8, n),
    parent = blake2s(left || right)."""
    import hashlib
    n2 = d.shape[1]
    flat = np.ascontiguousarray(d.T)         # (2n, 8) digests
    buf = flat.tobytes()
    out = np.empty((n2 // 2, 8), dtype="<u4")
    for i in range(n2 // 2):
        h = hashlib.blake2s(buf[64 * i:64 * (i + 1)]).digest()
        out[i] = np.frombuffer(h, dtype="<u4")
    return np.ascontiguousarray(out.T)
