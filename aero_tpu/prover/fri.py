"""FRI prover: commit/fold layers on device.

Fold semantics are forced by the verifier (reference:
src/stark_verifier/fri/fri_verifier.cairo:243-339): at each layer the
degree-(ff-1) interpolant through the fiber {offset*w^fp * w8^j} evaluated at
alpha becomes the next layer's value at position fp, layers keep offset 7 and
generator w^ff. In coefficient form this reduces to one iNTT + a weighted
fold of coefficient groups with weights (alpha/offset)^j + one NTT:

    raw = intt(evals)                       # no coset scaling needed
    folded[k] = sum_j (alpha/offset)^j * raw[ff*k + j]
    next_evals = ntt(folded)

Each committed layer is a Merkle tree over "transposed" leaves: leaf fp holds
the ff values at positions {fp + t*(m/ff)} (channel.cairo:102-121 layout).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

from ..spec import field as F
from ..field import GF, from_gf, to_gf, mul, gf_sum, gf_reshape
from ..ntt import ntt, intt
from ..merkle import commit_columns, DeviceMerkleTree


def transposed_rows(evals: GF, ff: int) -> GF:
    """GF[m] evaluations -> GF[m/ff, ff] leaf rows (leaf fp = strided fiber)."""
    m = evals.shape[-1]
    return GF(evals.lo.reshape(ff, m // ff).T, evals.hi.reshape(ff, m // ff).T)


def fold_evals(evals: GF, alpha: int, ff: int, offset: int = F.DOMAIN_OFFSET) -> GF:
    """One FRI fold: GF[m] -> GF[m/ff]."""
    m = evals.shape[-1]
    raw = intt(evals)
    groups = gf_reshape(raw, (m // ff, ff))
    w = F.mul(alpha, F.inv(offset))
    weights = to_gf([F.exp(w, j) for j in range(ff)])
    import jax.numpy as jnp
    terms = mul(groups, GF(jnp.broadcast_to(weights.lo, groups.shape),
                           jnp.broadcast_to(weights.hi, groups.shape)))
    folded = gf_sum(terms, axis=-1)
    folded = GF(folded.lo.reshape(m // ff), folded.hi.reshape(m // ff))
    return ntt(folded)


@dataclass
class FriLayer:
    evals: GF                      # evaluations over this layer's domain
    tree: DeviceMerkleTree         # transposed-leaf commitment
    ff: int                        # folding factor (leaf row width)

    def rows_at(self, positions) -> GF:
        """Gather leaf rows GF[len(positions), ff] on device (leaf fp is
        column fp of evals.reshape(ff, m/ff)) without materializing the
        full transpose."""
        import numpy as np
        m = self.evals.shape[-1]
        cols = gf_reshape(self.evals, (self.ff, m // self.ff))
        from ..field import gf_take
        picked = gf_take(cols, np.asarray(list(positions)), axis=-1)
        return GF(picked.lo.T, picked.hi.T)


def commit_fri(deep_evals: GF, coin, ff: int, max_remainder: int
               ) -> Tuple[List[FriLayer], List[int], List[int], DeviceMerkleTree]:
    """Run the FRI commit phase.

    Returns (layers, alphas, remainder_values, remainder_tree). The coin is
    reseeded with each layer root (alpha drawn after each, including the
    remainder commitment, whose alpha is unused)."""
    layers: List[FriLayer] = []
    alphas: List[int] = []
    evals = deep_evals
    m = evals.shape[-1]
    while m > max_remainder:
        # leaf row fp is column fp of evals.reshape(ff, m/ff) — commit in
        # column-major layout directly (Pallas path needs no transpose)
        tree = commit_columns(gf_reshape(evals, (ff, m // ff)))
        coin.reseed(tree.root)
        alpha = coin.draw()
        alphas.append(alpha)
        layers.append(FriLayer(evals, tree, ff))
        evals = fold_evals(evals, alpha, ff)
        m = evals.shape[-1]

    # remainder: committed via the same transposed layout, values sent inline
    m = evals.shape[-1]
    rem_tree = commit_columns(gf_reshape(evals, (ff, m // ff)))
    coin.reseed(rem_tree.root)
    alphas.append(coin.draw())  # drawn but unused (matches verifier)
    remainder = [int(v) for v in from_gf(evals)]
    return layers, alphas, remainder, rem_tree


def fold_evals_gf(evals: GF, alpha: GF, ff: int,
                  offset: int = F.DOMAIN_OFFSET) -> GF:
    """fold_evals with a traced (in-graph) alpha scalar."""
    import jax.numpy as jnp
    m = evals.shape[-1]
    raw = intt(evals)
    groups = gf_reshape(raw, (m // ff, ff))
    w = mul(alpha, GF(jnp.uint32(F.inv(offset) & 0xFFFFFFFF),
                      jnp.uint32(F.inv(offset) >> 32)))
    # weights[j] = w^j as GF scalars
    weights = [GF(jnp.uint32(1), jnp.uint32(0))]
    for _ in range(ff - 1):
        weights.append(mul(weights[-1], w))
    wl = jnp.stack([x.lo for x in weights])
    wh = jnp.stack([x.hi for x in weights])
    terms = mul(groups, GF(jnp.broadcast_to(wl, groups.shape),
                           jnp.broadcast_to(wh, groups.shape)))
    folded = gf_sum(terms, axis=-1)
    folded = GF(folded.lo.reshape(m // ff), folded.hi.reshape(m // ff))
    return ntt(folded)
