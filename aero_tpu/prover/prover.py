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
 8. FRI commit/fold (device) + PoW grinding (host)
 9. query openings + winterfell-compatible serialization (host)

The proof it emits verifies under aero_tpu.spec.verifier with the AIR's OOD
constraint check enabled (the check the reference's Cairo verifier stubs).
"""

from __future__ import annotations

from typing import Dict, List, Optional

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
from .fri import commit_fri, FriLayer


def _columns_to_rows(cols: GF) -> GF:
    """GF[w, m] -> GF[m, w] (leaf rows)."""
    return GF(cols.lo.T, cols.hi.T)


def _tile(vals: List[int], m: int) -> GF:
    """Tile a short periodic host list over a domain of size m."""
    arr = np.array(vals, dtype=np.uint64)
    reps = m // len(vals)
    return to_gf(np.tile(arr, reps))


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


def prove(air: Air, main_trace: GF, pub_inputs) -> StarkProof:
    n = air.trace_length
    opts = air.options
    blowup = opts.blowup_factor
    log_blowup = blowup.bit_length() - 1
    m = n * blowup                      # LDE domain size
    ce = air.ce_blowup                  # composition columns
    offset = F.DOMAIN_OFFSET
    g_trace = air.trace_generator
    w_lde = air.lde_generator
    main_w, aux_w = air.main_width, air.aux_width

    coin = RandomCoin(hash_elements(pub_inputs.elements()))
    commitments: List[bytes] = []

    # ---- 1+2: main trace polynomials, LDE, commitment ----
    main_polys = intt(main_trace)                       # GF[w, n]
    main_lde = lde(main_polys, log_blowup, offset)      # GF[w, m]
    main_tree = commit_columns(main_lde)
    commitments.append(main_tree.root)
    coin.reseed(main_tree.root)

    # ---- 3: auxiliary segment ----
    aux_rand: List[int] = []
    aux_polys = aux_lde = aux_tree = None
    if aux_w:
        aux_rand = coin.draw_elements(air.aux_rands)
        aux_trace = air.build_aux_trace(main_trace, aux_rand)
        aux_polys = intt(aux_trace)
        aux_lde = lde(aux_polys, log_blowup, offset)
        aux_tree = commit_columns(aux_lde)
        commitments.append(aux_tree.root)
        coin.reseed(aux_tree.root)

    cc_transition = [coin.draw_pair() for _ in range(air.num_transition_constraints)]
    cc_boundary = [coin.draw_pair() for _ in range(air.num_assertions)]

    # ---- 4: constraint evaluation over the LDE domain ----
    shift = m // n   # frame "next" offset in domain positions
    def rolled(x: GF) -> GF:
        return GF(jnp.roll(x.lo, -shift, axis=-1), jnp.roll(x.hi, -shift, axis=-1))

    t_evals = air.evaluate_transitions(
        main_lde, rolled(main_lde),
        aux_lde, rolled(aux_lde) if aux_lde is not None else None,
        aux_rand)

    # x over the LDE domain and x^adj per distinct adjustment
    x_dom = power_series(w_lde, m, offset)
    adjT = air.transition_adjustments()
    adjB = air.boundary_adjustments()
    xp_cache: Dict[int, GF] = {}
    def xp(adj: int) -> GF:
        if adj not in xp_cache:
            xp_cache[adj] = pow_loop(x_dom, adj)
        return xp_cache[adj]

    # transition divisor inverse: 1/Zt = (x - g^{n-1}) / (x^n - 1)
    wn = F.exp(w_lde, n)                       # order `blowup`
    on = F.exp(offset, n)
    zt_vals = [F.sub(F.mul(on, F.exp(wn, t)), 1) for t in range(blowup)]
    zt_inv_tiled = _tile(F.batch_inv(zt_vals), m)
    zt_inv = mul(sub(x_dom, gf_full((m,), F.exp(g_trace, n - 1))), zt_inv_tiled)

    merged = gf_full((m,), 0)
    for ev, (a, b), adj in zip(t_evals, cc_transition, adjT):
        k = add(gf_full((m,), a), mul_scalar(xp(adj), b))
        merged = add(merged, mul(mul(k, ev), zt_inv))

    # boundary terms: group by assertion point
    assertions = air.get_assertions()
    points = sorted({F.exp(g_trace, asrt.step) for asrt in assertions})
    denom = gf_concat([sub(x_dom, gf_full((1, m), p)).reshape(1, m)
                       for p in points], axis=0)
    denom_inv = batch_inv(denom, axis=-1)
    point_row = {p: i for i, p in enumerate(points)}

    all_lde = main_lde if not aux_w else gf_concat([main_lde, aux_lde], axis=0)
    for asrt, (a, b), adj in zip(assertions, cc_boundary, adjB):
        col = all_lde[asrt.column]
        ev = sub(col, gf_full((m,), asrt.value))
        dinv = denom_inv[point_row[F.exp(g_trace, asrt.step)]]
        k = add(gf_full((m,), a), mul_scalar(xp(adj), b))
        merged = add(merged, mul(mul(k, ev), dinv))

    # ---- 5: composition polynomial -> ce columns -> LDE -> commit ----
    # iNTT over the coset: divide out offset powers
    c_coeffs = mul(intt(merged), power_series(F.inv(offset), m))
    comp = from_gf(c_coeffs)
    assert np.all(comp[ce * n:] == 0), "composition degree overflow"
    col_coeffs = to_gf(comp[:ce * n].reshape(n, ce).T)   # col_i = coeffs[ce*k+i]
    constraint_lde = lde(col_coeffs, log_blowup, offset)  # GF[ce, m]
    constraint_tree = commit_columns(constraint_lde)
    commitments.append(constraint_tree.root)
    coin.reseed(constraint_tree.root)

    # ---- 6: OOD frames ----
    z = coin.draw()
    zg = F.mul(z, g_trace)
    ood_main_cur = eval_polys_at(main_polys, z).tolist()
    ood_main_nxt = eval_polys_at(main_polys, zg).tolist()
    if aux_w:
        ood_aux_cur = eval_polys_at(aux_polys, z).tolist()
        ood_aux_nxt = eval_polys_at(aux_polys, zg).tolist()
    else:
        ood_aux_cur = ood_aux_nxt = []
    cur_row = ood_main_cur + ood_aux_cur
    nxt_row = ood_main_nxt + ood_aux_nxt
    coin.reseed(hash_elements(cur_row))
    coin.reseed(hash_elements(nxt_row))

    z_m = F.exp(z, ce)
    ood_evals = eval_polys_at(col_coeffs, z_m).tolist()
    coin.reseed(hash_elements(ood_evals))

    # ---- 7: DEEP composition over the LDE domain ----
    n_cols = main_w + aux_w
    deep_trace = [coin.draw_elements(3) for _ in range(n_cols)]
    deep_constraints = coin.draw_elements(ce)
    lam, mu = coin.draw_pair()

    dz = sub(x_dom, gf_full((m,), z))
    dzg = sub(x_dom, gf_full((m,), zg))
    dzm = sub(x_dom, gf_full((m,), z_m))
    dstack = gf_concat([d.reshape(1, m) for d in (dz, dzg, dzm)], axis=0)
    dinv = batch_inv(dstack, axis=-1)
    inv_z, inv_zg, inv_zm = dinv[0], dinv[1], dinv[2]

    num_cur = gf_full((m,), 0)
    num_nxt = gf_full((m,), 0)
    for c in range(n_cols):
        col = all_lde[c]
        num_cur = add(num_cur, mul_scalar(
            sub(col, gf_full((m,), cur_row[c])), deep_trace[c][0]))
        num_nxt = add(num_nxt, mul_scalar(
            sub(col, gf_full((m,), nxt_row[c])), deep_trace[c][1]))
    deep = add(mul(num_cur, inv_z), mul(num_nxt, inv_zg))

    num_c = gf_full((m,), 0)
    for i in range(ce):
        num_c = add(num_c, mul_scalar(
            sub(constraint_lde[i], gf_full((m,), ood_evals[i])),
            deep_constraints[i]))
    deep = add(deep, mul(num_c, inv_zm))
    deep = mul(deep, add(gf_full((m,), lam), mul_scalar(x_dom, mu)))

    # ---- 8: FRI + PoW ----
    ff = opts.fri_folding_factor
    layers, alphas, remainder, rem_tree = commit_fri(
        deep, coin, ff, opts.fri_max_remainder_size)
    for layer in layers:
        commitments.append(layer.tree.root)
    commitments.append(rem_tree.root)

    pow_nonce = _grind_pow(coin, opts.grinding_factor)
    coin.reseed_with_int(pow_nonce)
    positions = coin.draw_integers(opts.num_queries, m)

    # ---- 9: query openings ----
    def open_tree(tree: DeviceMerkleTree, cols: GF, idxs: List[int]) -> Queries:
        rows = from_gf(gf_take(_columns_to_rows(cols), np.array(idxs), axis=0))
        values = felts_to_bytes(rows.reshape(-1).tolist())
        proof = tree.prove_batch(idxs)
        return Queries(values=values, paths=proof.serialize_nodes())

    trace_queries = [open_tree(main_tree, main_lde, positions)]
    if aux_w:
        trace_queries.append(open_tree(aux_tree, aux_lde, positions))
    constraint_queries = open_tree(constraint_tree, constraint_lde, positions)

    fri_layers_ser: List[FriProofLayer] = []
    idxs = list(positions)
    size = m
    for layer in layers:
        target = size // ff
        folded: List[int] = []
        for p in idxs:
            fp = p % target
            if fp not in folded:
                folded.append(fp)
        rows = from_gf(gf_take(layer.rows, np.array(folded), axis=0))
        values = felts_to_bytes(rows.reshape(-1).tolist())
        proof = layer.tree.prove_batch(folded)
        fri_layers_ser.append(FriProofLayer(values=values,
                                            paths=proof.serialize_nodes()))
        idxs = folded
        size = target

    fri_proof = FriProof(layers=fri_layers_ser,
                         remainder=felts_to_bytes(remainder),
                         num_partitions=0)

    ood_frame = OodFrame(trace_states=felts_to_bytes(cur_row + nxt_row),
                         evaluations=felts_to_bytes(ood_evals))

    return StarkProof(
        context=air.context(),
        commitments=commitments,
        trace_queries=trace_queries,
        constraint_queries=constraint_queries,
        ood_frame=ood_frame,
        fri_proof=fri_proof,
        pow_nonce=pow_nonce,
    )
