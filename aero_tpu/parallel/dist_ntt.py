"""Explicit distributed NTT: shard_map 4-step with one butterfly
all-to-all each way.

The multi-host north star (SURVEY.md §7.9, BASELINE.md "Multi-host
scaling"): a 2^24-point NTT whose coefficient vector is sharded
contiguously over a device mesh. The GSPMD pipeline (sharded.py) lets
XLA place collectives; this module is the EXPLICIT formulation — the
communication pattern is written out, so its volume is known and ICI-
shaped by construction:

    x[i1 + k1*i2]                        sharded over i2 blocks
    1. local k1-point DFTs along i1      (no communication)
    2. twiddle multiply w_n^(i1*i2)      (no communication; the twiddle
                                          table ships sharded like x)
    3. ALL-TO-ALL: i2 gathered local, o1 split across devices
    4. local k2-point DFTs along i2
    5. ALL-TO-ALL back to the natural contiguous output sharding
       (skippable by consumers that accept the o1-sharded layout)

Total communication: 2 all-to-alls of n elements — the minimum for a
transpose-based distributed FFT. The reference's analog is the browser
worker pool's full-TraceLde broadcast (proving_worker.rs:403-412), which
moves strictly more bytes.

Bit-exact vs the single-device ntt()/intt() (tests/test_dist_ntt.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..spec import field as F
from ..field import GF, mul, to_gf
from ..ntt.ntt import _ntt_core, Twiddles


@functools.lru_cache(maxsize=16)
def _mid_twiddles(k1: int, k2: int, invert: bool):
    """T[i1*k2 + o2] = w_n^(i1*o2) as numpy limb arrays — laid out so the
    flat (n,) table shards contiguously exactly like the mid-transform
    data (rows = i1 blocks)."""
    n = k1 * k2
    w = F.get_root_of_unity(n.bit_length() - 1)
    if invert:
        w = F.inv(w)
    pw = np.array(F.get_power_series(w, n), dtype=np.uint64)
    idx = (np.outer(np.arange(k1, dtype=np.int64),
                    np.arange(k2, dtype=np.int64)) % n)
    T = pw[idx].reshape(-1)
    return ((T & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (T >> np.uint64(32)).astype(np.uint32))


_jit_cache: dict = {}


def _dist_ntt_fn(mesh: Mesh, batch: tuple, n: int, invert: bool, axis: str):
    """Jitted shard_map NTT for a fixed (mesh, shape): the body is plain
    per-device code — no GSPMD partitioner pass — so it compiles in
    seconds where the partitioned whole-array jit takes minutes on
    XLA:CPU (and the jit makes the module ONE dispatch; eager shard_map
    costs ~10^2 sharded dispatches)."""
    key = (tuple(d.id for d in mesh.devices.flat), mesh.axis_names,
           batch, n, invert, axis)
    if key in _jit_cache:
        return _jit_cache[key]

    nb = int(np.prod(batch, dtype=np.int64)) if batch else 1
    log_n = n.bit_length() - 1
    D = mesh.devices.size
    k1 = 1 << (log_n // 2)
    k2 = n // k1
    l1, l2 = k1 // D, k2 // D
    assert l1 >= 1 and l2 >= 1, "mesh too large for this transform size"

    def a2a(v: GF, split: int, concat: int) -> GF:
        return GF(jax.lax.all_to_all(v.lo, axis, split, concat),
                  jax.lax.all_to_all(v.hi, axis, split, concat))

    def t(v: GF) -> GF:
        return GF(jnp.swapaxes(v.lo, -1, -2), jnp.swapaxes(v.hi, -1, -2))

    # decomposition (verified bit-exact): i = i1 + k1*i2, o = o2 + k2*o1,
    #   out[o2 + k2*o1] =
    #     sum_i1 w1^(i1 o1) w_n^(i1 o2) sum_i2 w2^(i2 o2) x[i1 + k1*i2]
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(*([None] * len(batch) + [axis])), P(axis)),
                       out_specs=P(*([None] * len(batch) + [axis])))
    def run(xl: GF, tl: GF) -> GF:
        # local view (b, l2, k1): [i2_local][i1], flat = i1 + k1*i2
        # all-to-all #1: localize i2 (the inner-DFT axis), split i1
        # (a2a removes the split axis and INSERTS a new device axis at
        # `concat`; the explicit reshape merges it with the local dim)
        b = a2a(xl.reshape(nb, l2, D, l1), 2, 1)            # (b, D, l2, l1)
        b = b.reshape(nb, k2, l1)                           # [b][i2][i1l]
        a = _ntt_core(t(b), k2.bit_length() - 1, invert)    # [b][i1l][o2]
        a = mul(a, GF(jnp.broadcast_to(tl.lo.reshape(l1, k2), (nb, l1, k2)),
                      jnp.broadcast_to(tl.hi.reshape(l1, k2), (nb, l1, k2))))
        # all-to-all #2: localize i1 (the outer-DFT axis), split o2
        c = a2a(a.reshape(nb, l1, D, l2), 2, 1)             # (b, D, l1, l2)
        c = c.reshape(nb, k1, l2)                           # [b][i1][o2l]
        e = _ntt_core(t(c), k1.bit_length() - 1, invert)    # [b][o2l][o1]
        # all-to-all #3: back to the natural contiguous output sharding
        f = a2a(e.reshape(nb, l2, D, l1), 2, 1)             # (b, D, l2, l1)
        f = f.reshape(nb, k2, l1)                           # [b][o2][o1l]
        return t(f).reshape(batch + (l1 * k2,))
        # local flat = o1l*k2 + o2 -> global out[o2 + k2*o1]

    fn = jax.jit(run)
    _jit_cache[key] = fn
    return fn


def dist_ntt(mesh: Mesh, x: GF, invert: bool = False,
             axis: str = "shard") -> GF:
    """Size-n NTT/iNTT of GF[..., n] with the LAST axis sharded
    contiguously over `mesh` (leading axes are batch, replicated).
    Returns the result in natural order with the same sharding."""
    n = x.shape[-1]
    batch = x.shape[:-1]
    k1 = 1 << ((n.bit_length() - 1) // 2)
    tlo, thi = _mid_twiddles(k1, n // k1, invert)
    sh = NamedSharding(mesh, P(*([None] * len(batch) + [axis])))
    sh_t = NamedSharding(mesh, P(axis))
    T = GF(jax.device_put(jnp.asarray(tlo), sh_t),
           jax.device_put(jnp.asarray(thi), sh_t))
    x = GF(jax.device_put(x.lo, sh), jax.device_put(x.hi, sh))
    return _dist_ntt_fn(mesh, batch, n, invert, axis)(x, T)


def dist_lde(mesh: Mesh, evals: GF, log_blowup: int,
             offset: int = F.DOMAIN_OFFSET, axis: str = "shard") -> GF:
    """Distributed trace-extension of GF[..., n] (last axis sharded):
    iNTT -> coefficient scaling by offset^i (sharded table) -> padded
    size-m NTT. Output: GF[..., m] on the coset, natural order, sharded
    contiguously."""
    n = evals.shape[-1]
    batch = evals.shape[:-1]
    m = n << log_blowup
    polys = dist_ntt(mesh, evals, invert=True, axis=axis)

    off = np.array(F.get_power_series(offset, n), dtype=np.uint64)
    sh = NamedSharding(mesh, P(*([None] * len(batch) + [axis])))
    sh_t = NamedSharding(mesh, P(axis))
    offs = GF(jax.device_put(jnp.asarray(
                  (off & np.uint64(0xFFFFFFFF)).astype(np.uint32)), sh_t),
              jax.device_put(jnp.asarray(
                  (off >> np.uint64(32)).astype(np.uint32)), sh_t))
    offs = GF(jnp.broadcast_to(offs.lo, batch + (n,)),
              jnp.broadcast_to(offs.hi, batch + (n,)))

    # the zero tail must land at GLOBAL positions n..m-1, so pad at the
    # global layout level and re-place (per-shard padding would
    # interleave the zeros)
    scaled = mul(polys, offs)
    zpad = jnp.zeros(batch + (m - n,), dtype=jnp.uint32)
    padded = GF(jnp.concatenate([scaled.lo, zpad], axis=-1),
                jnp.concatenate([scaled.hi, zpad], axis=-1))
    padded = GF(jax.device_put(padded.lo, sh), jax.device_put(padded.hi, sh))
    return dist_ntt(mesh, padded, invert=False, axis=axis)
