"""The STARK prover pipeline — TPU compute path + host Fiat-Shamir glue.

Pipeline (the TPU-native redesign of the reference's staged prover,
aero-sdk/miden-wasm/src/proving_worker.rs:124-352):

 1. trace iNTT + coset LDE (device, batched over columns)
 2. Merkle commit to trace rows (device hashing)
 3. aux segment: draw rands, build + commit (device)
 4. constraint evaluation over the LDE domain (device, vectorized — the
    analog of the reference's 8-fragment worker split)
 5. composition polynomial -> columns -> LDE -> commit (device)
 6. OOD frames at z, z*g (device polynomial evaluation)
 7. DEEP composition over the LDE domain (device)
 8. FRI commit/fold (device) + PoW grinding (device kernel on TPU)
 9. query openings + winterfell-compatible serialization (host)

The pipeline is explicitly STAGED — each stage reads/writes a ProverState
that can be checkpointed to disk and resumed (prove_resumable), the seam
the reference exposes through its fork APIs (commit_to_trace_and_validate /
prove_after_constraint_eval, proving_worker.rs:323-352) but never persists.
Every stage runs under a tracing span mirroring the reference's console
timers (proving_worker.rs:125-196).

The proof it emits verifies under aero_tpu.spec.verifier with the AIR's OOD
constraint check enabled (the check the reference's Cairo verifier stubs).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Any, Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..spec import field as F
from ..spec.coin import RandomCoin
from ..spec.hashing import hash_elements
from ..spec.proof import (Context, FriProof, FriProofLayer, OodFrame,
                          ProofOptions, Queries, StarkProof, felts_to_bytes)
from ..field import (GF, add, sub, mul, mul_scalar, inv, batch_inv, to_gf,
                     from_gf, gf_full, gf_take, gf_concat, pow_loop,
                     power_series, eval_polys_at, canonicalize)
from ..ntt import ntt, intt, lde
from ..merkle import commit_columns, DeviceMerkleTree
from ..air.air import Air
from ..utils import span
from .fri import commit_fri, FriLayer


def _columns_to_rows(cols: GF) -> GF:
    """GF[w, m] -> GF[m, w] (leaf rows)."""
    return GF(cols.lo.T, cols.hi.T)


# Column-chunk budget for the iNTT/LDE device passes: the radix-4 NTT
# materializes a handful of working buffers per pass, so an unchunked
# 72-column x 2^23-point LDE peaks ~20 GB and OOMs the 16 GB HBM.
# Bounding each pass to ~2^27 elements keeps the transient footprint
# under ~1.5 GB while the persistent outputs stream into the full-width
# result exactly as before (per-column transforms are independent).
_CHUNK_ELEMS = 1 << 27


import functools as _functools  # noqa: E402
import jax as _jx  # noqa: E402


@_functools.partial(_jx.jit, donate_argnums=(0,))
def _gf_write(res: GF, part: GF, i) -> GF:
    """Write `part` into donated `res` at row offset i — in place on
    device (input/output aliasing), so assembling a (72, 2^23) LDE from
    chunks never holds two copies of the 4.8 GB result."""
    return GF(_jx.lax.dynamic_update_slice(res.lo, part.lo, (i, 0)),
              _jx.lax.dynamic_update_slice(res.hi, part.hi, (i, 0)))


def _intt_lde_chunked(trace: GF, log_blowup: int, offset: int):
    """(iNTT, coset-LDE) over GF[w, n], chunked along the column axis.

    Chunks are a UNIFORM 12 columns wide for the Miden widths (72 = 6x12;
    the 9-col aux segment is zero-padded to 12): every chunk then hits
    the SAME compiled (12, n) iNTT/LDE modules — main and aux segments
    included — instead of one distinct module per width, which through
    the axon relay costs seconds of per-module first-load each cold
    process.

    Assembly is a donated in-place row write per chunk, NOT a concat:
    concatenating the parts materializes result + parts simultaneously
    (9.6 GB for the 72 x 2^23 main LDE — the r4/r5 2^20-scale OOM at
    stage_trace_commit)."""
    w, n = trace.shape
    m = n << log_blowup
    budget = max(1, _CHUNK_ELEMS // max(m, 1))
    if w <= budget and w % 12 != 0 and w != 9:
        polys = intt(trace)
        return polys, lde(polys, log_blowup, offset)
    cw = _uniform_chunk(m, budget)
    pad = (-w) % cw
    padded = trace
    if pad:
        z = GF(jnp.zeros((pad, n), jnp.uint32), jnp.zeros((pad, n), jnp.uint32))
        padded = gf_concat([trace, z], axis=0)
    wp = w + pad
    polys_res = GF(jnp.zeros((wp, n), jnp.uint32),
                   jnp.zeros((wp, n), jnp.uint32))
    lde_res = GF(jnp.zeros((wp, m), jnp.uint32),
                 jnp.zeros((wp, m), jnp.uint32))
    for i in range(0, wp, cw):
        p = intt(padded[i:i + cw])
        q = lde(p, log_blowup, offset)
        polys_res = _gf_write(polys_res, p, i)
        lde_res = _gf_write(lde_res, q, i)
    if pad:
        # pad rows only exist for the small segments (aux 9 -> 12), so
        # this trailing copy is bounded (~0.6 GB at the 2^20-row scale);
        # the 72-column main segment divides evenly and skips it
        polys_res, lde_res = polys_res[:w], lde_res[:w]
    return polys_res, lde_res


def _tile(vals: List[int], m: int) -> GF:
    """Tile a short periodic host list over a domain of size m."""
    arr = np.array(vals, dtype=np.uint64)
    reps = m // len(vals)
    return to_gf(np.tile(arr, reps))




@_functools.partial(_jx.jit, static_argnames=("m", "w_lde", "offset",
                                              "g_last", "zt_vals", "points"))
def _ceval_static_jit(m: int, w_lde: int, offset: int, g_last: int,
                      zt_vals: tuple, points: tuple):
    """Transcript-INDEPENDENT constraint-eval prelude as ONE compiled
    module: x over the LDE domain, the tiled transition-divisor inverse,
    and the boundary-divisor inverses. Everything here is a pure function
    of the AIR shape, so the result is cached per air and reused by every
    proof (the eager version cost ~1 s/proof of sync floors and a long
    tail of tiny per-shape relay modules)."""
    x_dom = power_series(w_lde, m, offset)
    blowup = len(zt_vals)
    zt = to_gf(np.array(zt_vals, dtype=np.uint64))                 # (blowup,)
    shifted = sub(x_dom, gf_full((m,), g_last))
    sh2 = GF(shifted.lo.reshape(m // blowup, blowup),
             shifted.hi.reshape(m // blowup, blowup))
    zt_inv = mul(sh2, GF(jnp.broadcast_to(zt.lo, sh2.shape),
                         jnp.broadcast_to(zt.hi, sh2.shape))).reshape(m)
    denom = gf_concat([sub(x_dom, gf_full((1, m), p)).reshape(1, m)
                       for p in points], axis=0)
    denom_inv = batch_inv(denom, axis=-1)
    return x_dom, zt_inv, denom_inv


@_functools.partial(_jx.jit, static_argnames=("ce_n", "inv_off"))
def _composition_post(merged: GF, ce_n: int, inv_off: int):
    """intt + coset-divide + canonicalize + degree-tail check, one module."""
    m = merged.shape[-1]
    c_coeffs = mul(intt(merged), power_series(inv_off, m))
    cc = canonicalize(c_coeffs)
    tail = jnp.any(cc.lo[ce_n:] | cc.hi[ce_n:])
    return cc, tail


def _uniform_chunk(m: int, budget: int) -> int:
    """Column-chunk width: a divisor of 12 so every chunk shape is
    shared, sized so one LDE pass's working set fits HBM headroom at the
    2^20-row scale (the NTT materializes several m-length buffers per
    column; 12-wide chunks at m = 2^23 OOM a 16 GB chip mid-pipeline)."""
    for cw in (12, 6, 4, 3, 2):
        if cw * m <= (1 << 26) and cw <= max(budget, 1):
            return cw
    return 1


def _lde_chunked(polys: GF, log_blowup: int, offset: int) -> GF:
    """Coset LDE of GF[w, n] polynomials via the shared chunk modules."""
    w, n = polys.shape
    m = n << log_blowup
    cw = _uniform_chunk(m, max(1, _CHUNK_ELEMS // max(m, 1)))
    pad = (-w) % cw
    if pad:
        z = GF(jnp.zeros((pad, n), jnp.uint32), jnp.zeros((pad, n), jnp.uint32))
        polys = gf_concat([polys, z], axis=0)
    parts = []
    for i in range(0, w + pad, cw):
        q = lde(polys[i:i + cw], log_blowup, offset)
        if i + cw > w:
            q = q[:w - i]
        parts.append(q)
    return parts[0] if len(parts) == 1 else gf_concat(parts, axis=0)


def _ceval_static(air):
    """Per-air cache of (x_dom, zt_inv, denom_inv, points)."""
    cache = air.__dict__.setdefault("_prover_cache", {})
    if "ceval_static" not in cache:
        n = air.trace_length
        blowup = air.options.blowup_factor
        m = n * blowup
        offset = F.DOMAIN_OFFSET
        g_trace = air.trace_generator
        w_lde = air.lde_generator
        wn = F.exp(w_lde, n)
        on = F.exp(offset, n)
        zt_vals = tuple(F.batch_inv(
            [F.sub(F.mul(on, F.exp(wn, t)), 1) for t in range(blowup)]))
        points = tuple(sorted({F.exp(g_trace, a.step)
                               for a in air.get_assertions()}))
        x_dom, zt_inv, denom_inv = _ceval_static_jit(
            m, w_lde, offset, F.exp(g_trace, n - 1), zt_vals, points)
        cache["ceval_static"] = (x_dom, zt_inv, denom_inv, points)
    return cache["ceval_static"]


def _grind_pow(coin: RandomCoin, grinding_bits: int) -> int:
    """Find the minimal nonce satisfying the grinding condition. On TPU the
    search is a vectorized device kernel (2^16 nonces per launch); the
    reference does the same search single-threaded inside winterfell."""
    import jax
    if jax.default_backend() not in ("cpu",):
        from ..hash.blake2s_pallas import grind_pow
        return grind_pow(coin.seed, grinding_bits)
    from ..spec.hashing import merge_with_int
    seed = coin.seed
    nonce = 0
    while True:
        d = merge_with_int(seed, nonce)
        lz = 128 - int.from_bytes(d[:16], "big").bit_length()
        if min(lz, 64) >= grinding_bits:
            return nonce
        nonce += 1


# ------------------------------------------------------------- prover state

STAGES = ("trace_commit", "aux_commit", "constraint_eval", "ood_frames",
          "deep_composition", "fri_pow", "queries_serialize")


@dataclass
class ProverState:
    """Everything a stage needs from its predecessors. Checkpointable:
    to_host()/from_host() swap the device (GF) members to numpy and back."""
    pub_inputs: Any
    stage: int = 0                      # number of completed stages
    coin: Optional[RandomCoin] = None
    commitments: List[bytes] = dfield(default_factory=list)
    main_trace: Optional[GF] = None
    main_polys: Optional[GF] = None
    main_lde: Optional[GF] = None
    main_tree: Optional[DeviceMerkleTree] = None
    aux_rand: List[int] = dfield(default_factory=list)
    aux_polys: Optional[GF] = None
    aux_lde: Optional[GF] = None
    aux_tree: Optional[DeviceMerkleTree] = None
    col_coeffs: Optional[GF] = None
    constraint_lde: Optional[GF] = None
    constraint_tree: Optional[DeviceMerkleTree] = None
    z: int = 0
    cur_row: List[int] = dfield(default_factory=list)
    nxt_row: List[int] = dfield(default_factory=list)
    ood_evals: List[int] = dfield(default_factory=list)
    deep: Optional[GF] = None
    fri_layers: Optional[List[FriLayer]] = None
    fri_remainder: List[int] = dfield(default_factory=list)
    rem_tree: Optional[DeviceMerkleTree] = None
    pow_nonce: int = 0
    positions: List[int] = dfield(default_factory=list)
    proof: Optional[StarkProof] = None

    _GF_FIELDS = ("main_trace", "main_polys", "main_lde", "aux_polys",
                  "aux_lde", "col_coeffs", "constraint_lde", "deep")
    _TREE_FIELDS = ("main_tree", "aux_tree", "constraint_tree", "rem_tree")

    def _trees(self):
        for name in self._TREE_FIELDS:
            t = getattr(self, name)
            if t is not None and hasattr(t, "to_host"):
                yield t
        for l in self.fri_layers or []:
            t = l.tree if isinstance(l, FriLayer) else l[3]
            if hasattr(t, "to_host"):
                yield t

    def to_host(self) -> "ProverState":
        for name in self._GF_FIELDS:
            v = getattr(self, name)
            if isinstance(v, GF):
                setattr(self, name, ("GF", np.asarray(v.lo), np.asarray(v.hi)))
        if self.fri_layers is not None:
            self.fri_layers = [
                ("FL", np.asarray(l.evals.lo), np.asarray(l.evals.hi),
                 l.tree, l.ff)
                for l in self.fri_layers]
        for t in self._trees():
            t.to_host()
        return self

    def to_device(self) -> "ProverState":
        for name in self._GF_FIELDS:
            v = getattr(self, name)
            if isinstance(v, tuple) and v and v[0] == "GF":
                setattr(self, name, GF(jnp.asarray(v[1]), jnp.asarray(v[2])))
        if self.fri_layers is not None:
            self.fri_layers = [
                FriLayer(GF(jnp.asarray(l[1]), jnp.asarray(l[2])), l[3],
                         l[4])
                if isinstance(l, tuple) else l
                for l in self.fri_layers]
        for t in self._trees():
            t.to_device()
        return self


# ------------------------------------------------------------------ stages

def stage_trace_commit(air: Air, st: ProverState) -> None:
    log_blowup = air.options.blowup_factor.bit_length() - 1
    st.coin = RandomCoin(hash_elements(st.pub_inputs.elements()))
    st.main_polys, st.main_lde = _intt_lde_chunked(
        st.main_trace, log_blowup, F.DOMAIN_OFFSET)        # GF[w, n/m]
    st.main_tree = commit_columns(st.main_lde)
    st.commitments.append(st.main_tree.root)
    st.coin.reseed(st.main_tree.root)


def stage_aux_commit(air: Air, st: ProverState) -> None:
    if not air.aux_width:
        return
    log_blowup = air.options.blowup_factor.bit_length() - 1
    st.aux_rand = st.coin.draw_elements(air.aux_rands)
    aux_trace = air.build_aux_trace(st.main_trace, st.aux_rand)
    st.aux_polys, st.aux_lde = _intt_lde_chunked(
        aux_trace, log_blowup, F.DOMAIN_OFFSET)
    st.aux_tree = commit_columns(st.aux_lde)
    st.commitments.append(st.aux_tree.root)
    st.coin.reseed(st.aux_tree.root)
    # the raw trace is never read past this stage; free its HBM (0.6 GB
    # at the 2^20-row scale)
    st.main_trace = None


def stage_constraint_eval(air: Air, st: ProverState) -> None:
    n = air.trace_length
    opts = air.options
    blowup = opts.blowup_factor
    log_blowup = blowup.bit_length() - 1
    m = n * blowup
    ce = air.ce_blowup
    offset = F.DOMAIN_OFFSET
    g_trace = air.trace_generator
    w_lde = air.lde_generator

    # rand-dependent boundary assertions (e.g. MidenAir's ROM product)
    # need the aux rands on the air even when resuming past aux_commit
    air._aux_rand = [int(x) % F.P for x in st.aux_rand] or None

    cc_transition = [st.coin.draw_pair()
                     for _ in range(air.num_transition_constraints)]
    cc_boundary = [st.coin.draw_pair() for _ in range(air.num_assertions)]

    shift = m // n   # frame "next" offset in domain positions

    # The CE domain is evaluated in FRAGMENTS — the TPU-native analog of
    # the reference's 8-fragment constraint-worker split
    # (ConstraintEvaluationTable::fragments, proving_worker.rs:396):
    # evaluating all constraints over the whole 2^23-point domain at
    # once materializes ~50 flag/temp arrays of the full domain and OOMs
    # HBM at the 2^20-row scale. Per-fragment peak is bounded; results
    # stream into `merged` exactly as the unfragmented evaluation would
    # (constraints are local: cur at x, nxt at x*g = +shift positions).
    m_frag = min(m, 1 << 20)

    def frag(x: GF, a: int, off: int) -> GF:
        i0 = a + off
        if i0 + m_frag <= m:
            return x[..., i0:i0 + m_frag]
        k = m - i0            # wraparound (last fragment's nxt frame)
        return gf_concat([x[..., i0:], x[..., :m_frag - k]], axis=-1)

    # x over the LDE domain + divisor inverses: transcript-independent,
    # computed once per air in one compiled module and reused across
    # proofs (see _ceval_static)
    _sp = span("constraint_prelude"); _sp.__enter__()
    x_dom, zt_inv, denom_inv, points = _ceval_static(air)
    assertions = air.get_assertions()
    point_row = {p: i for i, p in enumerate(points)}
    t_adjust = air.transition_adjustments()
    b_adjust = air.boundary_adjustments()

    # static per-assertion routing (column source + divisor row); the
    # VALUES travel as arrays so the jitted fragment module is reusable
    # across proofs of the same shape
    asrt_route = [(asrt.column < air.main_width,
                   asrt.column if asrt.column < air.main_width
                   else asrt.column - air.main_width,
                   point_row[F.exp(g_trace, asrt.step)])
                  for asrt in assertions]
    cc_t_arr = to_gf(np.array(cc_transition, dtype=np.uint64))   # (nt, 2)
    cc_b_arr = to_gf(np.array(cc_boundary, dtype=np.uint64))     # (na, 2)
    bvals = to_gf(np.array([int(a.value) % F.P for a in assertions],
                           dtype=np.uint64))
    rand_gf = [to_gf(np.uint64(int(r) % F.P)) for r in st.aux_rand]
    _sp.__exit__(None, None, None)

    def frag_fn(main_cur, main_nxt, aux_cur, aux_nxt, x_frag, zt_inv_f,
                dinv_f, cc_t_a, cc_b_a, bvals_a, rands):
        t_evals = air.evaluate_transitions(main_cur, main_nxt,
                                           aux_cur, aux_nxt, rands)
        xp_cache: Dict[int, GF] = {}

        def xp(adj: int) -> GF:
            if adj not in xp_cache:
                xp_cache[adj] = pow_loop(x_frag, adj)
            return xp_cache[adj]

        merged = gf_full((m_frag,), 0)
        for i, (ev, adj) in enumerate(zip(t_evals, t_adjust)):
            k = add(cc_t_a[i, 0], mul(xp(adj), cc_t_a[i, 1]))
            merged = add(merged, mul(mul(k, ev), zt_inv_f))
        for j, ((is_main, c, prow), adj) in enumerate(zip(asrt_route,
                                                          b_adjust)):
            col = main_cur[c] if is_main else aux_cur[c]
            ev = sub(col, bvals_a[j])
            k = add(cc_b_a[j, 0], mul(xp(adj), cc_b_a[j, 1]))
            merged = add(merged, mul(mul(k, ev), dinv_f[prow]))
        return merged

    # one compiled module per fragment SHAPE (not per proof): all
    # transcript-dependent values arrive as arrays. Eager on CPU (the
    # XLA:CPU jit of this module is pathologically slow — see
    # air/miden.py _build_aux_device); jitted on TPU, where the eager
    # alternative costs ~20k relay dispatches per proof. The jit wrapper
    # is CACHED on the air instance: a fresh jax.jit(frag_fn) per proof
    # would retrace the 112-constraint module and re-load it through the
    # axon relay every time (~60 s of the 68 s warm fib proof, r4).
    import jax
    if jax.default_backend() == "cpu":
        runner = frag_fn
    else:
        runner = getattr(air, "_frag_jit", None)
        if runner is None or getattr(air, "_frag_jit_mfrag", None) != m_frag:
            runner = jax.jit(frag_fn)
            air._frag_jit = runner
            air._frag_jit_mfrag = m_frag

    merged_parts = []
    with span("frag_eval", n_frags=m // m_frag):
        for a0 in range(0, m, m_frag):
            merged_parts.append(runner(
                frag(st.main_lde, a0, 0), frag(st.main_lde, a0, shift),
                frag(st.aux_lde, a0, 0) if st.aux_lde is not None else None,
                frag(st.aux_lde, a0, shift) if st.aux_lde is not None else None,
                x_dom[a0:a0 + m_frag], zt_inv[a0:a0 + m_frag],
                denom_inv[:, a0:a0 + m_frag], cc_t_arr, cc_b_arr, bvals,
                rand_gf))
        merged = (merged_parts[0] if len(merged_parts) == 1
                  else gf_concat(merged_parts, axis=-1))

    # composition polynomial -> ce columns -> LDE -> commit
    # iNTT over the coset: divide out offset powers
    with span("composition_intt_lde"):
        cc, tail_nonzero = _composition_post(merged, ce * n, F.inv(offset))
        # degree check on device: coefficients past ce*n must vanish (one
        # scalar fetch instead of downloading the whole polynomial)
        assert not bool(tail_nonzero), "composition degree overflow"
        st.col_coeffs = GF(cc.lo[:ce * n].reshape(n, ce).T,
                           cc.hi[:ce * n].reshape(n, ce).T)
        # chunked (12-col-padded) LDE: shares the (12, n) modules with
        # the trace segments instead of compiling an (8, n) pair
        st.constraint_lde = _lde_chunked(st.col_coeffs, log_blowup, offset)
    with span("constraint_commit"):
        st.constraint_tree = commit_columns(st.constraint_lde)
    st.commitments.append(st.constraint_tree.root)
    st.coin.reseed(st.constraint_tree.root)


def stage_ood_frames(air: Air, st: ProverState) -> None:
    ce = air.ce_blowup
    st.z = st.coin.draw()
    zg = F.mul(st.z, air.trace_generator)
    z_m = F.exp(st.z, ce)
    # ALL OOD evaluations in one multi-point module: the stacked
    # (main ++ aux ++ composition) coefficient rows evaluated at
    # {z, z*g, z^m} at once (six eval_polys_at calls cost ~1.4 s of
    # module loads + sync floors per proof)
    from ..field import eval_polys_multi
    w_main = st.main_polys.shape[0]
    segs = [st.main_polys]
    if air.aux_width:
        segs.append(st.aux_polys)
    segs.append(st.col_coeffs)
    stacked = segs[0] if len(segs) == 1 else gf_concat(segs, axis=0)
    evals = eval_polys_multi(stacked, [st.z, zg, z_m])    # (3, w+ce)
    w_trace = w_main + (air.aux_width or 0)
    st.cur_row = [int(v) for v in evals[0, :w_trace]]
    st.nxt_row = [int(v) for v in evals[1, :w_trace]]
    st.coin.reseed(hash_elements(st.cur_row))
    st.coin.reseed(hash_elements(st.nxt_row))

    st.ood_evals = [int(v) for v in evals[2, w_trace:]]
    st.coin.reseed(hash_elements(st.ood_evals))
    # the coefficient arrays are never read past this stage (queries
    # open the LDE arrays); free their HBM before DEEP/FRI (~0.7 GB at
    # the 2^20-row scale)
    st.main_polys = None
    st.aux_polys = None
    st.col_coeffs = None


def stage_deep_composition(air: Air, st: ProverState) -> None:
    n = air.trace_length
    m = n * air.options.blowup_factor
    ce = air.ce_blowup
    w_lde = air.lde_generator
    n_cols = air.main_width + air.aux_width
    zg = F.mul(st.z, air.trace_generator)
    z_m = F.exp(st.z, ce)

    deep_trace = [st.coin.draw_elements(3) for _ in range(n_cols)]
    deep_constraints = st.coin.draw_elements(ce)
    lam, mu = st.coin.draw_pair()

    x_dom = _ceval_static(air)[0]     # cached per air

    def vec(ints) -> GF:
        return to_gf(np.array([int(v) % F.P for v in ints],
                              dtype=np.uint64))

    def sc(v) -> GF:
        return to_gf(np.uint64(int(v) % F.P))

    import jax
    runner = (_deep_core if jax.default_backend() == "cpu"
              else _deep_core_jit)
    # domain-fragmented like stage_constraint_eval: bounds both the
    # runtime HBM footprint and the compile-time working set (the
    # full-domain module OOM-killed the TPU-side compile helper)
    m_frag = min(m, 1 << 20)
    args = (vec(st.cur_row), vec(st.nxt_row), vec(st.ood_evals),
            vec([deep_trace[c][0] for c in range(n_cols)]),
            vec([deep_trace[c][1] for c in range(n_cols)]),
            vec(deep_constraints),
            sc(st.z), sc(zg), sc(z_m), sc(lam), sc(mu))
    parts = []
    for a0 in range(0, m, m_frag):
        sl = slice(a0, a0 + m_frag)
        parts.append(runner(
            st.main_lde[:, sl],
            st.aux_lde[:, sl] if air.aux_width else None,
            st.constraint_lde[:, sl], x_dom[sl], *args))
    st.deep = parts[0] if len(parts) == 1 else gf_concat(parts, axis=-1)


def _deep_core(main_lde: GF, aux_lde: Optional[GF], constraint_lde: GF,
               x_dom: GF, cur: GF, nxt: GF, ood: GF,
               a_vec: GF, b_vec: GF, c_vec: GF,
               z: GF, zg: GF, zm: GF, lam: GF, mu: GF) -> GF:
    """DEEP composition as weighted column reductions — one module on
    TPU (the eager per-column loop costs ~1000 relay dispatches at the
    2^20-row scale), eager on CPU (XLA:CPU jit pathology)."""
    from ..field import gf_sum
    m = x_dom.shape[-1]
    dz = sub(x_dom, z)
    dzg = sub(x_dom, zg)
    dzm = sub(x_dom, zm)
    dinv = batch_inv(gf_concat([d.reshape(1, m) for d in (dz, dzg, dzm)],
                               axis=0), axis=-1)

    def wsum(lde_: GF, vals: GF, weights: GF) -> GF:
        k = lde_.shape[0]
        t = mul(sub(lde_, vals.reshape(k, 1)), weights.reshape(k, 1))
        return gf_sum(t, axis=0).reshape(m)

    w_main = main_lde.shape[0]
    num_cur = wsum(main_lde, cur[:w_main], a_vec[:w_main])
    num_nxt = wsum(main_lde, nxt[:w_main], b_vec[:w_main])
    if aux_lde is not None:
        num_cur = add(num_cur, wsum(aux_lde, cur[w_main:], a_vec[w_main:]))
        num_nxt = add(num_nxt, wsum(aux_lde, nxt[w_main:], b_vec[w_main:]))
    deep = add(mul(num_cur, dinv[0]), mul(num_nxt, dinv[1]))
    deep = add(deep, mul(wsum(constraint_lde, ood, c_vec), dinv[2]))
    return mul(deep, add(lam, mul(x_dom, mu)))


import jax as _jax  # noqa: E402  (module-level jit wrapper)

_deep_core_jit = _jax.jit(_deep_core)


def stage_fri_pow(air: Air, st: ProverState) -> None:
    opts = air.options
    m = air.trace_length * opts.blowup_factor
    ff = opts.fri_folding_factor
    layers, alphas, remainder, rem_tree = commit_fri(
        st.deep, st.coin, ff, opts.fri_max_remainder_size)
    st.fri_layers = layers
    st.fri_remainder = remainder
    st.rem_tree = rem_tree
    for layer in layers:
        st.commitments.append(layer.tree.root)
    st.commitments.append(rem_tree.root)

    st.pow_nonce = _grind_pow(st.coin, opts.grinding_factor)
    st.coin.reseed_with_int(st.pow_nonce)
    st.positions = st.coin.draw_integers(opts.num_queries, m)


def stage_queries_serialize(air: Air, st: ProverState) -> None:
    opts = air.options
    m = air.trace_length * opts.blowup_factor
    ff = opts.fri_folding_factor

    def open_tree(tree, cols: GF, idxs: List[int]) -> Queries:
        # gather the queried columns on device, transpose the tiny result
        picked = gf_take(cols, np.array(idxs), axis=-1)     # GF[w, q]
        rows = from_gf(GF(picked.lo.T, picked.hi.T))        # (q, w)
        values = felts_to_bytes(rows.reshape(-1).tolist())
        proof = tree.prove_batch(idxs)
        return Queries(values=values, paths=proof.serialize_nodes())

    trace_queries = [open_tree(st.main_tree, st.main_lde, st.positions)]
    if air.aux_width:
        trace_queries.append(open_tree(st.aux_tree, st.aux_lde, st.positions))
    constraint_queries = open_tree(st.constraint_tree, st.constraint_lde,
                                   st.positions)

    fri_layers_ser: List[FriProofLayer] = []
    idxs = list(st.positions)
    size = m
    for layer in st.fri_layers:
        target = size // ff
        folded: List[int] = []
        for p in idxs:
            fp = p % target
            if fp not in folded:
                folded.append(fp)
        rows = from_gf(layer.rows_at(folded))
        values = felts_to_bytes(rows.reshape(-1).tolist())
        proof = layer.tree.prove_batch(folded)
        fri_layers_ser.append(FriProofLayer(values=values,
                                            paths=proof.serialize_nodes()))
        idxs = folded
        size = target

    fri_proof = FriProof(layers=fri_layers_ser,
                         remainder=felts_to_bytes(st.fri_remainder),
                         num_partitions=0)
    ood_frame = OodFrame(trace_states=felts_to_bytes(st.cur_row + st.nxt_row),
                         evaluations=felts_to_bytes(st.ood_evals))
    st.proof = StarkProof(
        context=air.context(),
        commitments=st.commitments,
        trace_queries=trace_queries,
        constraint_queries=constraint_queries,
        ood_frame=ood_frame,
        fri_proof=fri_proof,
        pow_nonce=st.pow_nonce,
    )


_STAGE_FNS = (stage_trace_commit, stage_aux_commit, stage_constraint_eval,
              stage_ood_frames, stage_deep_composition, stage_fri_pow,
              stage_queries_serialize)


# ----------------------------------------------------------------- frontend

def prove(air: Air, main_trace: GF, pub_inputs) -> StarkProof:
    """Run the full staged pipeline in-process."""
    st = ProverState(pub_inputs=pub_inputs, main_trace=main_trace)
    with span("prove_program"):
        for name, fn in zip(STAGES, _STAGE_FNS):
            with span(name):
                fn(air, st)
            st.stage += 1
    return st.proof


def prove_resumable(air: Air, main_trace: GF, pub_inputs,
                    checkpoint_dir: str) -> StarkProof:
    """prove() with stage-level checkpoint/resume.

    After each stage the full ProverState is persisted to
    <checkpoint_dir>/state.pkl; on re-invocation completed stages are
    skipped and the pipeline continues from the first unfinished one.
    (The reference splits its prover into resumable stages through the
    winterfell fork APIs but keeps no persistent state; here a killed
    long-running proof resumes instead of restarting.)
    """
    import os
    import pickle
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, "state.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            st = pickle.load(f).to_device()
    else:
        st = ProverState(pub_inputs=pub_inputs, main_trace=main_trace)
    with span("prove_program", resume_from=st.stage):
        for i, (name, fn) in enumerate(zip(STAGES, _STAGE_FNS)):
            if i < st.stage:
                continue
            with span(name):
                fn(air, st)
            st.stage += 1
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(st.to_host(), f)
            os.replace(tmp, path)
            st.to_device()
    return st.proof
