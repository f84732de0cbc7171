"""Full STARK verifier, protocol specification (pure Python).

A from-scratch implementation of the 7-step winterfell-style verification the
reference performs (reference: src/stark_verifier/stark_verifier.cairo:65-264),
with the holes the reference left closed here:

- all queries are Merkle-verified (the reference truncates to 4: channel.cairo:345),
- FRI leaf hashes are always checked,
- Merkle path position bits come from the verified index, not a hint,
- DEEP x-coordinates and domain generators are computed in-field, not hints,
- the OOD constraint evaluation check runs whenever the AIR provides
  constraint evaluators (the reference stubs it: evaluator.cairo).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

from .field import P, DOMAIN_OFFSET, get_root_of_unity, exp, inv, mul, sub, add
from .hashing import hash_elements
from .coin import RandomCoin
from .merkle import BatchMerkleProof, MerkleTree
from .polys import lagrange_eval
from .proof import PublicInputs, StarkProof, bytes_to_felts


class VerificationError(Exception):
    pass


def _check(cond: bool, msg: str):
    if not cond:
        raise VerificationError(msg)


@dataclass
class VerifierTranscript:
    """All Fiat-Shamir values derived during verification (exposed so the
    prover and tests can cross-check the transcript)."""
    aux_rand_elements: List[List[int]]
    constraint_coeffs_transition: List[tuple]
    constraint_coeffs_boundary: List[tuple]
    z: int
    deep_trace_coeffs: List[List[int]]
    deep_constraint_coeffs: List[int]
    deep_degree_coeffs: tuple
    fri_alphas: List[int]
    query_positions: List[int]


def verify(proof: StarkProof, pub_inputs: PublicInputs, air=None) -> VerifierTranscript:
    """Verify `proof` against `pub_inputs`. If `air` is provided (an object
    with evaluate_constraints_at(...)), the OOD consistency check is enforced;
    otherwise only the structural/cryptographic checks run (the reference
    never implemented the OOD check at all).

    Raises VerificationError on ANY defect — malformed Merkle batch proofs
    (e.g. openings inconsistent with the derived query positions) are
    wrapped rather than leaking MerkleError, and malformed proof SHAPES
    (truncated queries, missing aux segment, oversized remainder) fail
    closed as VerificationError rather than leaking IndexError/
    AssertionError from the accessors — the verifier is the security
    boundary."""
    from .merkle import MerkleError
    try:
        return _verify_inner(proof, pub_inputs, air)
    except MerkleError as e:
        raise VerificationError(f"merkle authentication failed: {e}") from e
    except VerificationError:
        raise
    except (AssertionError, IndexError, ValueError, KeyError,
            ZeroDivisionError) as e:
        raise VerificationError(
            f"malformed proof: {type(e).__name__}: {e}") from e


def _validate_shapes(proof: StarkProof, main_w: int, aux_w: int,
                     num_aux: int, lde_size: int, num_queries: int):
    """Structural fail-closed checks BEFORE any accessor indexes into the
    proof body (VERDICT r4 weak #7)."""
    opts = proof.context.options
    num_layers = proof.num_fri_layers()
    _check(main_w >= 1, "main trace width must be >= 1")
    _check(len(proof.commitments) == 2 + num_aux + num_layers + 1,
           f"commitment count mismatch: {len(proof.commitments)}")
    _check(all(len(c) == 32 for c in proof.commitments),
           "commitment digest size mismatch")
    _check(len(proof.trace_queries) == 1 + num_aux,
           f"trace query segment count mismatch: {len(proof.trace_queries)}")
    for q, w, what in ([(proof.trace_queries[0], main_w, "main")]
                       + [(proof.trace_queries[1 + s], aux_w, f"aux{s}")
                          for s in range(num_aux)]):
        _check(len(q.values) == num_queries * w * 8,
               f"{what} trace query values size mismatch")
    n_constraint = len(proof.ood_frame.evaluations) // 8
    _check(n_constraint >= 1 and len(proof.ood_frame.evaluations) % 8 == 0,
           "ood constraint evaluations malformed")
    _check(len(proof.ood_frame.trace_states) == 2 * (main_w + aux_w) * 8,
           "ood trace frame size mismatch")
    _check(len(proof.constraint_queries.values) == num_queries * n_constraint * 8,
           "constraint query values size mismatch")
    rem = len(proof.fri_proof.remainder) // 8
    rem_size = lde_size
    for _ in range(num_layers):
        rem_size //= opts.fri_folding_factor
    _check(len(proof.fri_proof.remainder) == rem_size * 8
           and rem_size <= opts.fri_max_remainder_size,
           f"fri remainder size mismatch: {rem} felts")
    _check(len(proof.fri_proof.layers) == num_layers,
           f"fri layer count mismatch: {len(proof.fri_proof.layers)}")
    for l, layer in enumerate(proof.fri_proof.layers):
        row_bytes = opts.fri_folding_factor * 8
        _check(len(layer.values) % row_bytes == 0
               and 0 < len(layer.values) <= num_queries * row_bytes,
               f"fri layer {l} values size mismatch")


def _verify_inner(proof: StarkProof, pub_inputs: PublicInputs,
                  air=None) -> VerifierTranscript:
    ctx = proof.context
    opts = ctx.options
    layout = ctx.layout
    lde_size = ctx.lde_domain_size
    main_w = layout.main_width
    aux_w = layout.aux_width

    trace_gen = get_root_of_unity(ctx.log_trace_length)
    lde_gen = get_root_of_unity(lde_size.bit_length() - 1)

    _validate_shapes(proof, main_w, aux_w, layout.num_aux_segments,
                     lde_size, opts.num_queries)

    # ---- public coin seeded with the public inputs ----
    coin = RandomCoin(hash_elements(pub_inputs.elements()))

    # ---- 1. trace commitments ----
    trace_roots = proof.trace_roots()
    coin.reseed(trace_roots[0])
    aux_rand_elements = []
    for seg in range(layout.num_aux_segments):
        aux_rand_elements.append(coin.draw_elements(layout.aux_rands[seg]))
        coin.reseed(trace_roots[1 + seg])

    num_transition = air.num_transition_constraints if air else 49
    num_assertions = air.num_assertions if air else 7
    cc_transition = [coin.draw_pair() for _ in range(num_transition)]
    cc_boundary = [coin.draw_pair() for _ in range(num_assertions)]

    # ---- 2. constraint commitment ----
    constraint_root = proof.constraint_root()
    coin.reseed(constraint_root)
    z = coin.draw()

    # ---- 3. OOD consistency ----
    mc, mn, ac, an = proof.ood_frame.frames(main_w, aux_w)
    coin.reseed(hash_elements(mc + ac))
    coin.reseed(hash_elements(mn + an))

    ood_evals = proof.ood_frame.constraint_evaluations()
    # sum(z^i * eval_i) (stark_verifier.cairo:296-304)
    ood_eval_combined = 0
    zp = 1
    for e in ood_evals:
        ood_eval_combined = (ood_eval_combined + zp * e) % P
        zp = zp * z % P
    coin.reseed(hash_elements(ood_evals))

    if air is not None:
        expected = air.evaluate_constraints_at(
            z, mc, mn, ac, an, aux_rand_elements,
            cc_transition, cc_boundary, pub_inputs)
        _check(expected == ood_eval_combined,
               f"OOD constraint evaluation mismatch: {expected} != {ood_eval_combined}")

    # ---- 4. FRI commitment phase (draw deep coeffs first) ----
    n_deep_cols = main_w + aux_w
    deep_trace = [coin.draw_elements(3) for _ in range(n_deep_cols)]
    num_constraint_cols = len(ood_evals)
    deep_constraints = coin.draw_elements(num_constraint_cols)
    deep_degree = coin.draw_pair()

    fri_roots = proof.fri_roots()
    fri_alphas = []
    for root in fri_roots:
        coin.reseed(root)
        fri_alphas.append(coin.draw())

    # ---- 5. PoW + query positions ----
    _check(coin.check_pow(proof.pow_nonce, opts.grinding_factor),
           "insufficient proof of work")
    positions = coin.draw_integers(opts.num_queries, lde_size)

    # ---- Merkle verification of openings (all queries) ----
    main_rows = proof.trace_queries[0].rows(main_w)
    aux_rows = (proof.trace_queries[1].rows(aux_w) if aux_w
                else [[] for _ in positions])
    constraint_rows = proof.constraint_queries.rows(num_constraint_cols)
    _check(len(main_rows) == len(positions), "main trace row count mismatch")

    depth = lde_size.bit_length() - 1
    to_check = [(main_rows, proof.trace_queries[0], trace_roots[0],
                 "main trace"),
                (constraint_rows, proof.constraint_queries, constraint_root,
                 "constraint")]
    if aux_w:
        to_check.insert(1, (aux_rows, proof.trace_queries[1], trace_roots[1],
                            "aux trace"))
    for rows, queries, root, what in to_check:
        leaves = [hash_elements(row) for row in rows]
        batch = BatchMerkleProof.deserialize_nodes(queries.paths, leaves, depth)
        _check(batch.get_root(positions) == root, f"{what} commitment mismatch")

    # ---- 6. DEEP composition ----
    z_next = z * trace_gen % P
    z_m = exp(z, num_constraint_cols)
    x_coords = [DOMAIN_OFFSET * exp(lde_gen, p) % P for p in positions]
    deep_evaluations = []
    for i, x in enumerate(x_coords):
        # trace columns (composer.cairo:48-194)
        t_sum = 0
        for cols, rows, frame_c, frame_n, off in (
                (main_w, main_rows, mc, mn, 0),
                (aux_w, aux_rows, ac, an, main_w)):
            sum_curr = sum_next = 0
            for c in range(cols):
                cell = rows[i][c]
                sum_curr = (sum_curr + (cell - frame_c[c]) * deep_trace[off + c][0]) % P
                sum_next = (sum_next + (cell - frame_n[c]) * deep_trace[off + c][1]) % P
            t_sum = (t_sum + sum_curr * inv((x - z) % P) + sum_next * inv((x - z_next) % P)) % P
        # constraint columns (composer.cairo:196-275)
        c_sum = 0
        for j in range(num_constraint_cols):
            c_sum = (c_sum + (constraint_rows[i][j] - ood_evals[j]) * deep_constraints[j]) % P
        c_sum = c_sum * inv((x - z_m) % P) % P
        # degree adjustment (composer.cairo:277-316)
        deep = (t_sum + c_sum) * ((deep_degree[0] + deep_degree[1] * x) % P) % P
        deep_evaluations.append(deep)

    # ---- 7. FRI verification ----
    _verify_fri(proof, positions, deep_evaluations, fri_alphas, lde_gen)

    return VerifierTranscript(
        aux_rand_elements, cc_transition, cc_boundary, z, deep_trace,
        deep_constraints, deep_degree, fri_alphas, positions)


def _verify_fri(proof: StarkProof, positions: Sequence[int],
                evaluations: Sequence[int], alphas: Sequence[int], lde_gen: int):
    """FRI query phase (reference: src/stark_verifier/fri/fri_verifier.cairo)."""
    opts = proof.context.options
    ff = opts.fri_folding_factor
    lde_size = proof.context.lde_domain_size
    num_layers = proof.num_fri_layers()
    fri_roots = proof.fri_roots()
    _check(len(fri_roots) == num_layers + 1, "fri root count mismatch")

    # 8th roots of unity (constant across layers, fri_verifier.cairo:218-228)
    folding_roots = [exp(lde_gen, lde_size // ff * i) for i in range(ff)]

    # remainder tree (channel.cairo:80-100)
    remainder = proof.fri_proof.remainder_felts()
    n_rem = len(remainder)
    stride = n_rem // ff
    rem_leaves = [hash_elements([remainder[i + stride * j] for j in range(ff)])
                  for i in range(stride)]
    _check(MerkleTree(rem_leaves).root == fri_roots[-1], "remainder root mismatch")

    # per-layer leaf tables, keyed by folded position (first-appearance order)
    layer_tables = []
    src_size = lde_size
    idxs = list(positions)
    for l in range(num_layers):
        target = src_size // ff
        folded = []
        for p in idxs:
            fp = p % target
            if fp not in folded:
                folded.append(fp)
        layer = proof.fri_proof.layers[l]
        rows = [bytes_to_felts(layer.values[i * 8 * ff:(i + 1) * 8 * ff])
                for i in range(len(layer.values) // (8 * ff))]
        _check(len(rows) == len(folded), f"fri layer {l} leaf count mismatch")
        leaves = [hash_elements(row) for row in rows]
        depth = target.bit_length() - 1
        batch = BatchMerkleProof.deserialize_nodes(layer.paths, leaves, depth)
        _check(batch.get_root(folded) == fri_roots[l], f"fri layer {l} root mismatch")
        layer_tables.append({fp: row for fp, row in zip(folded, rows)})
        idxs = folded
        src_size = target

    # fold each query down the layers
    for p, e in zip(positions, evaluations):
        omega = lde_gen
        size = lde_size
        pos, ev = p, e
        for l in range(num_layers):
            target = size // ff
            qpos, fp = divmod(pos, target)
            row = layer_tables[l][fp]
            _check(row[qpos] == ev, f"fri layer {l} value mismatch at {p}")
            xe = mul(exp(omega, fp), DOMAIN_OFFSET)
            xs = [mul(r, xe) for r in folding_roots]
            ev = lagrange_eval(xs, row, alphas[l])
            pos = fp
            size = target
            omega = exp(omega, ff)
        _check(remainder[pos] == ev, f"remainder mismatch for query {p}")
