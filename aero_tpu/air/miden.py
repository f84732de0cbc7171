"""Miden-compatible AIR: 72 main + 9 aux columns, 16 aux rand elements,
49 transition constraints, 7 assertions — the exact proof shape of the
reference's ProcessorAir (src/stark_verifier/air/air_instance.cairo:95-111),
so proofs are structurally identical to the golden vector and pass every
live check of the reference's Cairo verifier (which never evaluates the
AIR's constraints: its evaluator is stubbed, stark_verifier.cairo:152-159).

The constraint *semantics* are a from-scratch re-design for the aero-tpu VM
(aero_tpu/vm/core/vm.cpp layout): the forked miden-vm's own AIR is not
recoverable (empty submodule). Opcodes use a two-level one-hot encoding
(6 group + 8 member selector columns; op flag = g_i * m_j, degree 2) so the
48-op instruction set (field/stack ops + u32 family + memory) fits the
49-constraint budget — booleanity costs 6+8 constraints instead of one
per op. u32add/u32sub are exact (h0 = carry/borrow witness, booleanity
merged into constraint 33); the remaining u32/memory ops' top results are
free witnesses pending the range-check/bitwise/memory chiplets
(NONDET_TOP_OPS, same trust model the reference's own verifier applies to
EVERYTHING — its constraint evaluator is stubbed).

Transition constraints (49):
   0      clk' = clk + 1
   1-6    group selector booleanity
   7-14   member selector booleanity
   15     group one-hot sum = 1
   16     member one-hot sum = 1
   17-32  stack slot updates s0'..s15' (flag-weighted per-op updates)
   33     inverse-witness soundness (eq/neq/eqz/inv, flag-exclusive merge)
   34     assert: flag_assert * (s0 - 1) = 0
   35     boolean input s0 for and/or/not
   36     boolean input s1 for and/or
   37     h0 hygiene: h0 = 0 except under eq/neq/eqz/inv
   38     depth' = depth
   39     ovf' = ovf + down - up (net overflow-table size counter)
   40     overflow bus: aux0'*del = aux0*ins — multiset argument over the
          LIFO overflow table rows (addr=clk+1, value, prev), rands 12-15;
          with the aux0[0]=aux0[n-1]=1 boundary this makes every value
          restored into s15 by a window-up op SOUND (it must equal a
          previously parked value, in LIFO order via the prev chain)
   41     b1 (overflow-top address, col 35) bookkeeping
   42-43  emptiness flag soundness: e=1 <=> b1=0 (cols 36-37, inv witness)
   44     pop from an empty table refills s15 with 0
   45-48  filler running products on aux1-aux4 (golden-shape padding;
          aux5-aux8 are unconstrained padding columns)

Assertions (35): clk[0]=0, s0..s15[0] bound to the full input stack,
s0..s15[n-1] bound to the full output stack, aux0[0]=1, aux0[n-1]=1
(overflow table drained — proved programs must end with a balanced
overflow table). The golden vector's 7-assertion shape bound only
s0/s1; binding all 16 slots closes the claimed-output forgery hole at
the cost of a documented assertion-count change (proof layout is
unchanged; only the number of boundary coefficient draws grows).

Documented gaps (also flagged in vm.cpp): program-ROM binding of the
executed ops to the program hash, u32/range/bitwise/memory chiplets
(columns 38-71 are committed as zeros and constrained only implicitly by
the boundary of the zero polynomial).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp

from ..spec import field as F
from ..spec.proof import PublicInputs
from ..field import (GF, add, sub, mul, mul_scalar, gf_full, gf_zeros,
                     to_gf)
from ..vm import (COL_CLK, COL_G, COL_M, NUM_GROUPS, NUM_MEMBERS, COL_IMM,
                  COL_STACK, COL_DEPTH, COL_OVF, COL_H0, COL_B1, COL_E,
                  COL_K, NUM_OPS, OPS)
from .air import Air, Assertion, TransitionDegree

OP = {name: i for i, name in enumerate(OPS)}

# ops that shift the stack window down (new value enters at s0)
DOWN_OPS = ("push", "advpush", "dup0", "dup1", "dup2", "dup3", "dup4",
            "dup5", "dup6", "dup7")
# ops that shift the stack window up (top consumed/merged)
UP_OPS = ("drop", "add", "sub", "mul", "eq", "neq", "and", "or", "assert",
          "u32add", "u32sub", "u32mul", "u32div", "u32mod", "u32and",
          "u32or", "u32xor", "u32shl", "u32shr", "u32lt", "memstore")
# ops that leave slots j >= 1 unchanged
STAY_OPS = ("nop", "halt", "neg", "not", "inv", "eqz",
            "u32lo", "u32hi", "u32not", "memload")
# ops whose top-of-stack result is nondeterministic in-AIR (pending the
# range-check/bitwise/memory chiplets — documented gap; vm.cpp:40-43): the
# next s0 is a free witness like advpush. u32add/u32sub are NOT here: they
# are constrained exactly via the h0 carry/borrow witness.
NONDET_TOP_OPS = ("advpush", "u32lo", "u32hi", "u32not", "u32mul", "u32div",
                  "u32mod", "u32and", "u32or", "u32xor", "u32shl", "u32shr",
                  "u32lt", "memload")
# permutation ops: map j -> source slot (slots not listed stay)
PERM = {
    "swap": {0: 1, 1: 0},
    "movup2": {0: 2, 1: 0, 2: 1},
    "movup3": {0: 3, 1: 0, 2: 1, 3: 2},
    "movup4": {0: 4, 1: 0, 2: 1, 3: 2, 4: 3},
    "movdn2": {0: 1, 1: 2, 2: 0},
    "movdn3": {0: 1, 1: 2, 2: 3, 3: 0},
    "movdn4": {0: 1, 1: 2, 2: 3, 3: 4, 4: 0},
}


class MidenAir(Air):
    main_width = 72
    aux_width = 9
    aux_rands = 16

    @property
    def ce_blowup(self) -> int:
        # fixed at 8 for golden-vector shape compatibility (8 OOD columns),
        # matching the max constraint degree (5 plus divisor headroom)
        return 8

    def transition_degrees(self) -> List[TransitionDegree]:
        degs = [TransitionDegree(1)]                      # clk
        degs += [TransitionDegree(2)] * 14                # booleanity g+m
        degs += [TransitionDegree(1)] * 2                 # one-hot sums
        degs += [TransitionDegree(4)] * 16                # stack updates
        degs += [TransitionDegree(5)]                     # inverse witness
        degs += [TransitionDegree(3)]                     # assert
        degs += [TransitionDegree(4)] * 2                 # boolean inputs
        degs += [TransitionDegree(3)]                     # h0 hygiene
        degs += [TransitionDegree(1)]                     # depth
        degs += [TransitionDegree(2)]                     # ovf counter
        degs += [TransitionDegree(5)]                     # overflow bus
        degs += [TransitionDegree(4)]                     # b1 update
        degs += [TransitionDegree(2)] * 2                 # emptiness e/k
        degs += [TransitionDegree(4)]                     # s15' = 0 on empty pop
        degs += [TransitionDegree(2)] * 4                 # filler aux products
        assert len(degs) == 49
        return degs

    def get_assertions(self) -> List[Assertion]:
        """ALL 16 input and output stack slots are bound (35 assertions).

        The golden vector's shape is 7 assertions (air_instance.cairo:111)
        which binds only a prefix; that left output slots 2-15 of the
        claimed PublicInputs unconstrained — a soundness hole this AIR
        closes at the cost of a documented shape change (the assertion
        count only affects how many composition-coefficient pairs are
        drawn; proof layout is unchanged). The reference binds full
        program outputs (miden-proof-generator/src/main.rs:35-38)."""
        n = self.trace_length
        pub = self.pub_inputs
        # stack_inputs are serialized bottom-first in the golden encoding;
        # reverse to get the top-first execution view
        top_in = (list(reversed(pub.stack_inputs)) + [0] * 16)[:16]
        out = (list(pub.output_stack) + [0] * 16)[:16]
        asserts = [Assertion(COL_CLK, 0, 0)]
        for j in range(16):
            asserts.append(Assertion(COL_STACK + j, 0, top_in[j]))
            asserts.append(Assertion(COL_STACK + j, n - 1, out[j]))
        asserts += [
            # overflow bus boundary: aux0 starts AND ends at 1 — the
            # multiset of inserted overflow rows equals the multiset of
            # deleted ones, i.e. the table is empty again on the final row
            # (proved programs must drain their overflow table)
            Assertion(72, n - 1, 1, is_aux=True),
            Assertion(72, 0, 1, is_aux=True),   # aux0[0] = 1
        ]
        return asserts

    # ------------------------------------------------------------ constraints

    def evaluate_transitions(self, main_cur: GF, main_nxt: GF,
                             aux_cur: Optional[GF], aux_nxt: Optional[GF],
                             aux_rand: Sequence) -> List[GF]:
        m = main_cur.shape[-1]
        one = gf_full((m,), 1)

        def c(i):
            return main_cur[i]

        def nx(i):
            return main_nxt[i]

        g_sel = [c(COL_G + i) for i in range(NUM_GROUPS)]
        m_sel = [c(COL_M + i) for i in range(NUM_MEMBERS)]
        flag = {name: mul(g_sel[i // 8], m_sel[i % 8])
                for i, name in enumerate(OPS)}
        s = [c(COL_STACK + j) for j in range(16)]
        sn = [nx(COL_STACK + j) for j in range(16)]
        imm = c(COL_IMM)
        h0 = c(COL_H0)

        out: List[GF] = []
        # 0: clk
        out.append(sub(nx(COL_CLK), add(c(COL_CLK), one)))
        # 1-14: booleanity
        for sel in g_sel + m_sel:
            out.append(sub(mul(sel, sel), sel))
        # 15-16: one-hot sums
        for sels in (g_sel, m_sel):
            total = gf_zeros((m,))
            for sel in sels:
                total = add(total, sel)
            out.append(sub(total, one))

        # per-op top-of-stack results
        d01 = sub(s[0], s[1])
        dh = mul(d01, h0)            # 1 iff s0 != s1 (witnessed)
        zh = mul(s[0], h0)           # 1 iff s0 != 0 (witnessed)
        s0s1 = mul(s[0], s[1])
        two32 = gf_full((m,), 1 << 32)
        top_result = {
            "nop": s[0], "halt": s[0],
            "push": imm, "drop": s[1],
            "add": add(s[0], s[1]), "sub": sub(s[1], s[0]),
            "mul": s0s1, "neg": sub(gf_zeros((m,)), s[0]),
            "eq": sub(one, dh), "neq": dh,
            "eqz": sub(one, zh), "inv": h0,
            "not": sub(one, s[0]),
            "and": s0s1, "or": sub(add(s[0], s[1]), s0s1),
            "assert": s[1],
            # u32 wrap-around, exact via h0 carry/borrow (sound given u32
            # operands; operand range checks are the chiplet gap):
            #   u32add: s0' = a + b - carry*2^32   (a=s1, b=s0)
            #   u32sub: s0' = a - b + borrow*2^32
            "u32add": sub(add(s[0], s[1]), mul(h0, two32)),
            "u32sub": add(sub(s[1], s[0]), mul(h0, two32)),
            "memstore": s[1],   # pop addr; stored value stays on top
        }
        for k in range(8):
            top_result[f"dup{k}"] = s[k]
        for name in NONDET_TOP_OPS:
            top_result[name] = sn[0]    # free witness (chiplet gap)

        # 17-32: stack updates. For j >= 1 every non-permutation op behaves
        # as its shift class (down: s[j-1], up: s[j+1], stay: s[j]), so the
        # op-weighted sum collapses to three class-flag terms plus the
        # handful of permutation ops — ~3x fewer field muls in the hottest
        # constraint group (same polynomial identity).
        def class_flag(names):
            f = gf_zeros((m,))
            for nm in names:
                f = add(f, flag[nm])
            return f

        down_f = class_flag(DOWN_OPS)
        up_f = class_flag(UP_OPS)
        stay_f = class_flag(STAY_OPS)
        zeros = gf_zeros((m,))

        for j in range(16):
            if j == 0:
                expr = gf_zeros((m,))
                for name in OPS:
                    src0 = (s[PERM[name][0]] if name in PERM
                            else top_result[name])
                    expr = add(expr, mul(flag[name], src0))
            else:
                expr = mul(down_f, s[j - 1])
                # j=15 under window-up: the slot is refilled from the LIFO
                # overflow table (vm.cpp push_shift/pop_shift) — value
                # nondeterministic in-AIR, only the net counter is
                # constrained (constraint 39); full value soundness needs
                # the overflow-bus argument (documented gap)
                expr = add(expr, mul(up_f, s[j + 1] if j < 15 else sn[15]))
                expr = add(expr, mul(stay_f, s[j]))
                for name, perm in PERM.items():
                    expr = add(expr, mul(flag[name], s[perm.get(j, j)]))
            out.append(sub(sn[j], expr))

        # 33: inverse-witness soundness (flag-exclusive merge — at most one
        # flag is 1 per row, enforced by the one-hot constraints):
        #   eq/neq: (s0-s1) * (1 - (s0-s1)*h0) = 0
        #   eqz   : s0 * (1 - s0*h0) = 0
        #   inv   : s0*h0 - 1 = 0
        w = mul(mul(add(flag["eq"], flag["neq"]), d01), sub(one, dh))
        w = add(w, mul(mul(flag["eqz"], s[0]), sub(one, zh)))
        w = add(w, mul(flag["inv"], sub(zh, one)))
        #   u32add/u32sub: h0 is the carry/borrow bit -> boolean
        carry_ops = add(flag["u32add"], flag["u32sub"])
        w = add(w, mul(carry_ops, mul(h0, sub(h0, one))))
        out.append(w)
        # 34: assert pops a 1
        out.append(mul(flag["assert"], sub(s[0], one)))
        # 35-36: boolean inputs for logic ops
        logic0 = add(add(flag["and"], flag["or"]), flag["not"])
        out.append(mul(mul(logic0, s[0]), sub(s[0], one)))
        logic1 = add(flag["and"], flag["or"])
        out.append(mul(mul(logic1, s[1]), sub(s[1], one)))
        # 37: h0 hygiene — zero outside its witnessing ops
        users = add(add(flag["eq"], flag["neq"]), add(flag["eqz"],
                                                      flag["inv"]))
        users = add(users, carry_ops)
        out.append(mul(sub(one, users), h0))
        # 38-39: depth constant; overflow net counter tracks the table size
        # exactly: ovf' = ovf + (window-down) - (window-up)
        out.append(sub(nx(COL_DEPTH), c(COL_DEPTH)))
        out.append(sub(nx(COL_OVF), sub(add(c(COL_OVF), down_f), up_f)))

        # 40-48: overflow bus (aux0) + bookkeeping + filler aux products
        rands = [r if isinstance(r, GF) else gf_full((m,), r)
                 for r in aux_rand]

        def bcast(r: GF) -> GF:
            return GF(jnp.broadcast_to(r.lo, (m,)),
                      jnp.broadcast_to(r.hi, (m,)))

        g = [bcast(r) if r.shape != (m,) else r for r in rands]

        # Overflow-table multiset bus on aux column 0 (rands 12-15):
        # every window-down op inserts the row (addr=clk+1, value=s15,
        # prev=b1); every window-up op on a non-empty table deletes the
        # row (b1, s15', b1') — the restored s15' and the new table top
        # b1' are forced (Schwartz-Zippel over the drawn alphas) to match
        # a previously inserted row, and addr uniqueness + the prev
        # pointer chain force LIFO order. aux0'*del = aux0*ins; boundary
        # aux0[0] = aux0[n-1] = 1 proves the table drains.
        b1 = c(COL_B1)
        bn1 = nx(COL_B1)
        e = c(COL_E)
        kinv = c(COL_K)
        clk = c(COL_CLK)
        l_ins = add(add(g[12], mul(g[13], add(clk, one))),
                    add(mul(g[14], s[15]), mul(g[15], b1)))
        l_del = add(add(g[12], mul(g[13], b1)),
                    add(mul(g[14], sn[15]), mul(g[15], bn1)))
        ins_f = add(one, mul(down_f, sub(l_ins, one)))
        pop_f = mul(up_f, sub(one, e))      # pop from a non-empty table
        del_f = add(one, mul(pop_f, sub(l_del, one)))
        out.append(sub(mul(aux_nxt[0], del_f), mul(aux_cur[0], ins_f)))
        # 41: b1 bookkeeping — down: b1'=clk+1; up on empty: b1'=0 (stays
        # empty); stay/perm: b1'=b1. (up on non-empty leaves b1' free: the
        # bus pins it to the deleted row's prev pointer.)
        c_b1 = mul(down_f, sub(bn1, add(clk, one)))
        c_b1 = add(c_b1, mul(mul(up_f, e), bn1))
        c_b1 = add(c_b1, mul(sub(one, add(down_f, up_f)), sub(bn1, b1)))
        out.append(c_b1)
        # 42-43: emptiness flag soundness: e=1 <=> b1=0 (k = b1^-1 witness)
        out.append(mul(e, b1))
        out.append(sub(mul(b1, kinv), sub(one, e)))
        # 44: pop from an EMPTY table refills s15 with 0
        out.append(mul(mul(up_f, e), sn[15]))
        # 45-48: filler running products (columns aux1-aux4, golden-shape
        # padding; aux5-aux8 are unconstrained padding columns)
        for k in range(1, 5):
            factor = add(add(g[2 * k], s[k * 2]),
                         mul(g[2 * k + 1], s[k * 2 + 1]))
            out.append(sub(aux_nxt[k], mul(aux_cur[k], factor)))

        assert len(out) == 49
        return out

    # ------------------------------------------------------------- aux trace

    def build_aux_trace(self, main_trace: GF, aux_rand: Sequence[int]) -> GF:
        """aux0 = overflow-bus running product (host-exact, the factors
        come straight off the committed trace columns); aux1-aux8 =
        golden-shape filler running products."""
        import jax
        from ..field import mul as gmul, from_gf
        n = main_trace.shape[-1]
        s = [main_trace[COL_STACK + j] for j in range(16)]
        clk = main_trace[COL_CLK]

        # --- aux0: overflow bus ------------------------------------------
        tr = from_gf(main_trace)   # (72, n) uint64 on host
        p = F.P
        r12, r13, r14, r15 = (int(aux_rand[i]) % p for i in (12, 13, 14, 15))
        gsel = tr[COL_G:COL_G + NUM_GROUPS].argmax(axis=0)
        msel = tr[COL_M:COL_M + NUM_MEMBERS].argmax(axis=0)
        ops = gsel * 8 + msel
        down = {OP[nm] for nm in DOWN_OPS}
        up = {OP[nm] for nm in UP_OPS}
        s15 = tr[COL_STACK + 15]
        b1 = tr[COL_B1]
        clk_h = tr[COL_CLK]
        bus = [1]
        acc = 1
        for i in range(n - 1):
            o = int(ops[i])
            if o in down:
                ins = (r12 + r13 * (int(clk_h[i]) + 1) + r14 * int(s15[i])
                       + r15 * int(b1[i])) % p
                acc = acc * ins % p
            elif o in up and int(b1[i]) != 0:
                dl = (r12 + r13 * int(b1[i]) + r14 * int(s15[i + 1])
                      + r15 * int(b1[i + 1])) % p
                acc = acc * pow(dl, p - 2, p) % p
            bus.append(acc)
        aux0 = to_gf(bus)

        # --- aux1-aux8: filler products ----------------------------------
        factors = []
        for k in range(1, 8):
            factor = add(add(gf_full((n,), aux_rand[2 * k]), s[2 * k]),
                         mul_scalar(s[2 * k + 1], aux_rand[2 * k + 1]))
            factors.append(factor)
        factors.append(add(gf_full((n,), aux_rand[0]),
                           mul_scalar(clk, aux_rand[1])))
        stacked = GF(jnp.stack([f.lo for f in factors]),
                     jnp.stack([f.hi for f in factors]))
        prod = jax.lax.associative_scan(gmul, stacked, axis=-1)
        # aux[i] = product of factors[0..i-1]; aux[0] = 1
        onecol = gf_full((8, 1), 1)
        fill_lo = jnp.concatenate([onecol.lo, prod.lo[:, :-1]], axis=1)
        fill_hi = jnp.concatenate([onecol.hi, prod.hi[:, :-1]], axis=1)
        return GF(jnp.concatenate([aux0.lo[None, :], fill_lo], axis=0),
                  jnp.concatenate([aux0.hi[None, :], fill_hi], axis=0))


def make_public_inputs(program_hash: List[int],
                       stack_inputs_topfirst: List[int],
                       output_stack: List[int]) -> PublicInputs:
    """Build golden-encoding public inputs: stack_inputs stored bottom-first,
    outputs as the full 16-slot final stack (top-first), empty overflow."""
    outs = (list(output_stack) + [0] * 16)[:16]
    return PublicInputs(
        program_hash=list(program_hash),
        stack_inputs=list(reversed(stack_inputs_topfirst)),
        output_stack=outs,
        overflow_addrs=[],
    )
