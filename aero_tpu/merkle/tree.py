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
        # flat 1-indexed array: nodes[n+i] = leaf i, nodes[1] = root
        nodes: List[bytes] = [b""] * (2 * n)
        for lvl, arr in enumerate(levels):
            base = n >> lvl
            arr = np.ascontiguousarray(arr.astype("<u4"))
            for i in range(arr.shape[0]):
                nodes[base + i] = arr[i].tobytes()
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


def commit_columns(cols: GF) -> DeviceMerkleTree:
    """Commit to column-major GF[row_width, n_leaves] (the prover's native
    trace-LDE layout). On TPU this runs the Pallas blake2s kernel with the
    word-major layout — no row transpose at all; on CPU it falls back to
    the jnp path."""
    if _use_pallas():
        from ..hash.blake2s_pallas import hash_columns_t, merkle_levels_t
        levels = merkle_levels_t(hash_columns_t(cols))
        return DeviceMerkleTree([np.asarray(jax.device_get(l)) for l in levels])
    return commit_rows(GF(cols.lo.T, cols.hi.T))
