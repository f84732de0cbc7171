"""Multi-chip sharded prover compute stages (jax.sharding + GSPMD).

The reference's parallel dimension is a browser worker pool round-robining
leaf-hash batches and constraint fragments (aero-sdk/miden-wasm/src/pool.rs,
proving_worker.rs:280-310, :396-437). The TPU-native design shards the
*domain axis* of every stage over a device mesh and lets XLA insert the
collectives:

- trace columns replicated, domain axis sharded: iNTT/LDE butterflies whose
  exchange distance crosses the shard boundary become all-to-alls;
- leaf hashing is embarrassingly parallel over sharded rows;
- Merkle trees are built as a fixed-shape level scan, reducing across shards
  automatically near the root;
- constraint evaluation + composition + DEEP are elementwise over the
  sharded domain (the frame shift becomes a collective permute).

A STARK proving step is inherently a *pipeline* of device stages separated
by host Fiat-Shamir transcript updates (commit -> reseed -> draw -> next
stage) — exactly the seam the reference's fork APIs expose
(commit_to_trace_and_validate / prove_after_constraint_eval,
proving_worker.rs:323-352). Each stage here is one jitted sharded module;
XLA:CPU also compiles pathologically slowly when many blake2s compressions
are inlined into a single flat module, so hashing always sits behind
fori/scan loop bodies (one compression instantiation per module).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..spec import field as F
from ..field import (GF, add, sub, mul, mul_scalar, gf_full, pow_loop,
                     power_series, inv, gf_concat, to_gf)
from ..ntt import ntt, intt, lde
from ..hash.blake2s_jax import _blake2s_words_tuple, felt_rows_to_words


def make_mesh(n_devices: int, axis: str = "shard") -> Mesh:
    devs = jax.devices()[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_domain(mesh: Mesh, x: GF, axis: str = "shard") -> GF:
    """Place GF[..., m] with the trailing domain axis sharded."""
    spec = P(*([None] * (len(x.shape) - 1) + [axis]))
    sh = NamedSharding(mesh, spec)
    return GF(jax.device_put(x.lo, sh), jax.device_put(x.hi, sh))


def gf_scalar(v: int) -> GF:
    v %= F.P
    return GF(jnp.uint32(v & 0xFFFFFFFF), jnp.uint32(v >> 32))


# --------------------------------------------------------------- stage: LDE

@functools.partial(jax.jit, static_argnames=("log_blowup",))
def stage_lde(trace: GF, log_blowup: int):
    """iNTT + coset LDE, batched over columns, domain axis sharded."""
    polys = intt(trace)
    return polys, lde(polys, log_blowup, F.DOMAIN_OFFSET)


# ------------------------------------------------------------ stage: commit

def _merkle_root_scan(leaf_digests, log_n: int):
    """Tree root over 2^log_n tuple digests via a fixed-shape level loop
    (lanes past the active prefix compute garbage that is never read)."""
    n = leaf_digests[0].shape[0]
    half = n // 2

    def level(_, d):
        msg = jnp.stack(
            [d[i][0::2] for i in range(8)] + [d[i][1::2] for i in range(8)],
            axis=1)
        merged = _blake2s_words_tuple(msg, 64)
        return tuple(jnp.concatenate([m, d[i][half:]])
                     for i, m in enumerate(merged))

    d = jax.lax.fori_loop(0, log_n, level, leaf_digests)
    return tuple(x[0] for x in d)


@jax.jit
def stage_commit(cols: GF):
    """Commit to GF[w, m] columns: hash the m rows, reduce to the root.
    Returns the root as a tuple of 8 u32 scalars."""
    rows = GF(cols.lo.T, cols.hi.T)
    w = rows.shape[1]
    msg = felt_rows_to_words(rows)
    leaves = _blake2s_words_tuple(msg, w * 32)
    log_n = rows.shape[0].bit_length() - 1
    return _merkle_root_scan(leaves, log_n)


# -------------------------------------------- stage: constraints/composition

def stage_composition(air, main_lde_: GF, aux_lde_: Optional[GF],
                      aux_rand: List[GF], cc_t: List, cc_b: List,
                      log_blowup: int):
    """Constraint evaluation over the sharded LDE domain + composition
    columns. cc_t/cc_b: per-constraint (alpha, beta) GF scalar pairs."""
    n = air.trace_length
    blowup = air.options.blowup_factor
    m = n * blowup
    ce = air.ce_blowup
    offset = F.DOMAIN_OFFSET
    g_trace = air.trace_generator
    w_lde = air.lde_generator

    all_lde = main_lde_ if aux_lde_ is None else gf_concat(
        [main_lde_, aux_lde_], axis=0)
    shift = m // n

    def rolled(x: GF) -> GF:
        return GF(jnp.roll(x.lo, -shift, axis=-1),
                  jnp.roll(x.hi, -shift, axis=-1))

    t_evals = air.evaluate_transitions(
        main_lde_, rolled(main_lde_), aux_lde_,
        rolled(aux_lde_) if aux_lde_ is not None else None, aux_rand)

    x_dom = power_series(w_lde, m, offset)
    wn = F.exp(w_lde, n)
    on = F.exp(offset, n)
    zt_vals = F.batch_inv([F.sub(F.mul(on, F.exp(wn, t)), 1)
                           for t in range(blowup)])
    zt_inv_tiled = to_gf(np.tile(np.array(zt_vals, dtype=np.uint64),
                                 m // blowup))
    zt_inv = mul(sub(x_dom, gf_full((m,), F.exp(g_trace, n - 1))), zt_inv_tiled)

    def bcast(s: GF) -> GF:
        return GF(jnp.broadcast_to(s.lo, (m,)), jnp.broadcast_to(s.hi, (m,)))

    merged = gf_full((m,), 0)
    for ev, (ca, cb), adj in zip(t_evals, cc_t, air.transition_adjustments()):
        k = add(bcast(ca), mul(pow_loop(x_dom, adj), bcast(cb)))
        merged = add(merged, mul(mul(k, ev), zt_inv))

    assertions = air.get_assertions()
    points = sorted({F.exp(g_trace, a.step) for a in assertions})
    denom = gf_concat([sub(x_dom, gf_full((1, m), p)).reshape(1, m)
                       for p in points], axis=0)
    # elementwise Fermat inverse: fully parallel, no scan structure (the
    # scan-based batch inverse trips an XLA:CPU simplifier loop under SPMD)
    dinv = inv(denom)
    prow = {p: i for i, p in enumerate(points)}
    for asrt, (ca, cb), adj in zip(assertions, cc_b,
                                   air.boundary_adjustments()):
        ev = sub(all_lde[asrt.column], gf_full((m,), asrt.value))
        k = add(bcast(ca), mul(pow_loop(x_dom, adj), bcast(cb)))
        merged = add(merged, mul(mul(k, ev),
                                 dinv[prow[F.exp(g_trace, asrt.step)]]))

    c_coeffs = mul(intt(merged), power_series(F.inv(offset), m))
    col_coeffs = GF(c_coeffs.lo[:ce * n].reshape(n, ce).T,
                    c_coeffs.hi[:ce * n].reshape(n, ce).T)
    return lde(col_coeffs, log_blowup, offset)


# ---------------------------------------------------------------- stage: DEEP

def stage_deep(all_lde: GF, constraint_lde: GF, z: GF, zg: GF, zm: GF,
               cur_vals: GF, nxt_vals: GF, ood_vals: GF,
               deep_a: GF, deep_b: GF, deep_c: GF, lam: GF, mu: GF,
               w_lde: int):
    """DEEP composition over the sharded LDE domain; all Fiat-Shamir values
    arrive as GF data (scalars or per-column vectors)."""
    m = all_lde.shape[-1]
    x_dom = power_series(w_lde, m, F.DOMAIN_OFFSET)

    def bcast(s: GF) -> GF:
        return GF(jnp.broadcast_to(s.lo, (m,)), jnp.broadcast_to(s.hi, (m,)))

    dz = sub(x_dom, bcast(z))
    dzg = sub(x_dom, bcast(zg))
    dzm = sub(x_dom, bcast(zm))
    dall = gf_concat([d.reshape(1, m) for d in (dz, dzg, dzm)], axis=0)
    dinv = inv(dall)

    num_cur = gf_full((m,), 0)
    num_nxt = gf_full((m,), 0)
    for c in range(all_lde.shape[0]):
        num_cur = add(num_cur, mul(sub(all_lde[c], bcast(cur_vals[c])),
                                   bcast(deep_a[c])))
        num_nxt = add(num_nxt, mul(sub(all_lde[c], bcast(nxt_vals[c])),
                                   bcast(deep_b[c])))
    deep = add(mul(num_cur, dinv[0]), mul(num_nxt, dinv[1]))

    num_c = gf_full((m,), 0)
    for i in range(constraint_lde.shape[0]):
        num_c = add(num_c, mul(sub(constraint_lde[i], bcast(ood_vals[i])),
                               bcast(deep_c[i])))
    deep = add(deep, mul(num_c, dinv[2]))
    return mul(deep, add(bcast(lam), mul(x_dom, bcast(mu))))


# ---------------------------------------------------------------- stage: FRI

@functools.partial(jax.jit, static_argnames=("ff",))
def stage_fri_fold(evals: GF, alpha: GF, ff: int):
    from ..prover.fri import fold_evals_gf
    return fold_evals_gf(evals, alpha, ff)


# ----------------------------------------------- explicit shard_map pipeline
#
# The GSPMD stages above let XLA's partitioner place collectives; the
# functions below are the EXPLICIT formulation (shard_map bodies with the
# halo exchanges / all-to-alls written out). Two reasons to have both:
# (a) the explicit path is the multi-host north star's shape (SURVEY §7.9)
# — its communication volume is known by construction; (b) the bodies are
# plain per-device programs, so XLA:CPU compiles them in seconds where
# the partitioner needs minutes (MULTICHIP_r04 rc:124) — which makes the
# driver's 8-virtual-device dryrun fit its budget.

_spmd_cache: dict = {}


def _mesh_key(mesh: Mesh):
    return (tuple(d.id for d in mesh.devices.flat), mesh.axis_names)


def dist_lde_coeffs_cols(mesh: Mesh, polys: GF, log_blowup: int,
                         offset: int = F.DOMAIN_OFFSET,
                         axis: str = "shard") -> GF:
    """Coset LDE of GF[w, n] coefficient columns (domain axis sharded):
    scale by offset^i, zero-pad to m, explicit distributed NTT. Column
    chunks padded to a UNIFORM 12 wide so every segment (main 72, aux 9,
    composition 8) hits the same compiled module (the same trick as the
    prover's _intt_lde_chunked)."""
    from .dist_ntt import dist_ntt
    w, n = polys.shape
    cw = 12
    pad = (-w) % cw
    if pad:
        z = GF(jnp.zeros((pad, n), jnp.uint32), jnp.zeros((pad, n), jnp.uint32))
        polys = gf_concat([polys, z], axis=0)
    offs = to_gf(np.array(F.get_power_series(offset, n), dtype=np.uint64))
    parts = []
    for i in range(0, w + pad, cw):
        p = polys[i:i + cw]
        scaled = mul(p, GF(jnp.broadcast_to(offs.lo, p.shape),
                           jnp.broadcast_to(offs.hi, p.shape)))
        zt = jnp.zeros((cw, (n << log_blowup) - n), jnp.uint32)
        padded = GF(jnp.concatenate([scaled.lo, zt], axis=-1),
                    jnp.concatenate([scaled.hi, zt], axis=-1))
        q = dist_ntt(mesh, padded, invert=False, axis=axis)
        if i + cw > w:
            q = q[:w - i]
        parts.append(q)
    return gf_concat(parts, axis=0) if len(parts) > 1 else parts[0]


def dist_lde_cols(mesh: Mesh, trace: GF, log_blowup: int,
                  offset: int = F.DOMAIN_OFFSET, axis: str = "shard"):
    """(iNTT, coset-LDE) of GF[w, n] evaluation columns, domain axis
    sharded, via the explicit shard_map NTT (12-wide uniform chunks)."""
    from .dist_ntt import dist_ntt
    w, n = trace.shape
    cw = 12
    pad = (-w) % cw
    if pad:
        z = GF(jnp.zeros((pad, n), jnp.uint32), jnp.zeros((pad, n), jnp.uint32))
        trace = gf_concat([trace, z], axis=0)
    polys_parts = []
    for i in range(0, w + pad, cw):
        polys_parts.append(dist_ntt(mesh, trace[i:i + cw], invert=True,
                                    axis=axis))
    polys = (gf_concat(polys_parts, axis=0) if len(polys_parts) > 1
             else polys_parts[0])[:w]
    return polys, dist_lde_coeffs_cols(mesh, polys, log_blowup, offset, axis)


# ------------------------------------------------------------------- dry run

class DryrunOut(NamedTuple):
    main_root: tuple
    aux_root: tuple
    constraint_root: tuple
    fold_root: tuple
    matches_single_device: bool


def _pipeline_roots(air, trace: GF, aux: GF, aux_rand_ints, log_blowup: int,
                    place, mesh: Optional[Mesh] = None):
    """Run LDE -> commit -> composition -> DEEP -> FRI-fold -> commit and
    return the four roots.

    Two modes, bit-identical outputs:
    - mesh=None: single device, arrays placed by `place` (the golden
      reference path, tools/regen_dryrun_golden.py);
    - mesh: LDEs run through the EXPLICIT shard_map distributed NTT
      (written-out all-to-alls, dist_ntt.py) — per-device bodies compile
      in seconds where the GSPMD-partitioned stage_lde jit took minutes
      on XLA:CPU (MULTICHIP_r04 rc:124); composition/DEEP stay eager on
      the sharded arrays (see the in-line note)."""
    opts = air.options

    if mesh is None:
        trace = place(trace)
        aux = place(aux)
        _, main_lde_ = stage_lde(trace, log_blowup)
        _, aux_lde_ = stage_lde(aux, log_blowup)
    else:
        _, main_lde_ = dist_lde_cols(mesh, trace, log_blowup)
        _, aux_lde_ = dist_lde_cols(mesh, aux, log_blowup)
    main_root = stage_commit(main_lde_)
    aux_root = stage_commit(aux_lde_)

    aux_rand = [gf_scalar(r) for r in aux_rand_ints]
    nt, nb = air.num_transition_constraints, air.num_assertions
    cc_t = [(gf_scalar(11 + i), gf_scalar(13 + i)) for i in range(nt)]
    cc_b = [(gf_scalar(17 + i), gf_scalar(19 + i)) for i in range(nb)]
    # EAGER in both modes: any jit of the 112-constraint MidenAir module
    # on XLA:CPU — GSPMD-partitioned OR as a plain shard_map body — hits
    # the wide-fanout compile pathology (>14 min measured for the
    # shard_map body; the partitioned version killed MULTICHIP_r04).
    # Eager ops on sharded inputs follow the data's sharding op-by-op
    # (identical values, collectives still inserted where needed).
    constraint_lde = stage_composition(air, main_lde_, aux_lde_,
                                       aux_rand, cc_t, cc_b,
                                       log_blowup=log_blowup)
    constraint_root = stage_commit(constraint_lde)

    w = air.main_width + air.aux_width
    ce = constraint_lde.shape[0]
    all_lde = gf_concat([main_lde_, aux_lde_], axis=0)
    zeros_w = GF(jnp.zeros((w,), jnp.uint32), jnp.zeros((w,), jnp.uint32))
    zeros_ce = GF(jnp.zeros((ce,), jnp.uint32), jnp.zeros((ce,), jnp.uint32))
    ones_w = GF(jnp.ones((w,), jnp.uint32), jnp.zeros((w,), jnp.uint32))
    ones_ce = GF(jnp.ones((ce,), jnp.uint32), jnp.zeros((ce,), jnp.uint32))
    deep_args = (gf_scalar(98765), gf_scalar(43210), gf_scalar(55555),
                 zeros_w, zeros_w, zeros_ce, ones_w, ones_w, ones_ce,
                 gf_scalar(7), gf_scalar(9))
    # eager for the same compile-budget reason as the composition above
    deep = stage_deep(all_lde, constraint_lde, *deep_args,
                      w_lde=air.lde_generator)

    folded = stage_fri_fold(deep, gf_scalar(31337),
                            ff=opts.fri_folding_factor)
    fold_root = stage_commit(folded.reshape(opts.fri_folding_factor, -1))
    roots = (main_root, aux_root, constraint_root, fold_root)
    jax.block_until_ready(roots)
    return roots


def _dryrun_air_and_traces(trace_steps: int = 64):
    """The flagship dryrun workload: MidenAir (72+9 columns, 112
    constraints, chiplet rows from a real VM trace exercising u32 +
    memory ops) at tiny shapes."""
    from ..spec.proof import ProofOptions
    from ..air.miden import MidenAir, make_public_inputs
    from ..vm import execute, program_hash
    from ..field import to_gf

    src = """
    begin
        push.4294967295 push.1 u32add
        push.3 u32sub
        push.12 push.10 u32xor
        mem.store.5 drop mem.load.5
        drop drop
    end
    """
    trace_np, out_stack = execute(src, [0, 0], min_rows=trace_steps)
    n = trace_np.shape[1]
    pub = make_public_inputs(program_hash(src), [0, 0], out_stack)
    opts = ProofOptions(num_queries=7, blowup_factor=8, grinding_factor=1)
    air = MidenAir(n, pub, opts, program=src)

    aux_rand_ints = [7919 * (i + 1) ** 2 for i in range(air.aux_rands)]
    trace = to_gf(trace_np)
    aux = air.build_aux_trace(trace, aux_rand_ints)
    # rand-dependent boundary values (ROM product) enter the jitted
    # composition as constants; set before get_assertions is traced
    air._aux_rand = [r % F.P for r in aux_rand_ints]
    return air, trace, aux, aux_rand_ints


_GOLDEN_PATH = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "dryrun_golden.json")


def single_device_dryrun_roots(trace_steps: int = 64):
    """The four pipeline Merkle roots on ONE device (the value-equality
    reference). Run by tools/regen_dryrun_golden.py to refresh the
    committed golden file, and by the slow-lane test that pins it."""
    air, trace, aux, aux_rand_ints = _dryrun_air_and_traces(trace_steps)
    roots = _pipeline_roots(air, trace, aux, aux_rand_ints, 3,
                            place=lambda x: x)
    return [[int(np.asarray(jax.device_get(w))) for w in r] for r in roots]


def dryrun_prove_core(n_devices: int, trace_steps: int = 64) -> DryrunOut:
    """Compile + execute the sharded proving pipeline on an n-device mesh
    (used by __graft_entry__.dryrun_multichip) — with the flagship
    MidenAir workload, and every Merkle root compared byte-for-byte
    against the single-device pipeline.

    The single-device roots are read from the COMMITTED golden file
    (regenerated by tools/regen_dryrun_golden.py; pinned by the
    slow-lane test test_sharded.py) rather than recomputed live: the
    driver's dryrun budget on a 2-CPU box does not fit compiling and
    running the heavy MidenAir pipeline twice (MULTICHIP_r04 rc:124),
    and the reference values are deterministic."""
    import json
    import os

    mesh = make_mesh(n_devices)
    air, trace, aux, aux_rand_ints = _dryrun_air_and_traces(trace_steps)

    if trace_steps == 64 and os.path.exists(_GOLDEN_PATH):
        with open(_GOLDEN_PATH) as f:
            ref = json.load(f)["roots"]
    else:
        ref = single_device_dryrun_roots(trace_steps)

    sharded = _pipeline_roots(air, trace, aux, aux_rand_ints, 3,
                              place=None, mesh=mesh)
    ok = all(
        int(np.asarray(jax.device_get(a))) == int(b)
        for ra, rb in zip(sharded, ref) for a, b in zip(ra, rb))
    return DryrunOut(*sharded, matches_single_device=ok)
