"""Tests for the widened VM instruction set (two-level opcode encoding):
dup.0-7, movup/movdn.2-4, inv/div/eqz/assert, immediate forms, if/else,
advice tape — each proved + verified end-to-end where it matters."""

import numpy as np
import pytest

from aero_tpu.vm import (execute, program_hash, VmError, OPS, COL_G, COL_M,
                         NUM_GROUPS, NUM_MEMBERS)
from aero_tpu.air.miden import MidenAir, make_public_inputs
from aero_tpu.field import to_gf
from aero_tpu.spec.proof import ProofOptions
from aero_tpu.spec.verifier import verify, VerificationError

OPTS = ProofOptions(num_queries=7, blowup_factor=8, grinding_factor=2)

P = (1 << 64) - (1 << 32) + 1


def run(src, inputs=(), advice=None):
    _, out = execute(src, list(inputs), advice_tape=advice)
    return out


class TestNewOps:
    def test_dup_high(self):
        out = run("begin dup.5 end", [10, 11, 12, 13, 14, 15])
        assert out[0] == 15 and out[1] == 10
        out = run("begin dup.7 end", [1, 2, 3, 4, 5, 6, 7, 8])
        assert out[0] == 8

    def test_movup_movdn_4(self):
        out = run("begin movup.4 end", [1, 2, 3, 4, 5])
        assert out[:5] == [5, 1, 2, 3, 4]
        out = run("begin movdn.4 end", [1, 2, 3, 4, 5])
        assert out[:5] == [2, 3, 4, 5, 1]

    def test_inv_div(self):
        out = run("begin inv end", [4])
        assert out[0] * 4 % P == 1
        out = run("begin div end", [4, 12])   # s0=4, s1=12 -> 3
        assert out[0] == 3
        out = run("begin div.5 end", [35])
        assert out[0] == 7

    def test_inv_zero_errors(self):
        with pytest.raises(VmError, match="inv of zero"):
            run("begin inv end", [0])

    def test_eqz(self):
        assert run("begin eqz end", [0])[0] == 1
        assert run("begin eqz end", [7])[0] == 0

    def test_assert(self):
        out = run("begin assert end", [1, 42])
        assert out[0] == 42
        with pytest.raises(VmError, match="assertion failed"):
            run("begin assert end", [2])

    def test_imm_forms(self):
        assert run("begin add.5 end", [10])[0] == 15
        assert run("begin sub.3 end", [10])[0] == 7
        assert run("begin mul.4 end", [10])[0] == 40
        assert run("begin eq.10 end", [10])[0] == 1
        assert run("begin neq.10 end", [10])[0] == 0

    def test_boolean_guards(self):
        with pytest.raises(VmError, match="non-boolean"):
            run("begin and end", [2, 1])
        with pytest.raises(VmError, match="non-boolean"):
            run("begin not end", [5])

    def test_if_else(self):
        src = """
        begin
            if.true push.100 else push.200 end
        end
        """
        assert run(src, [1])[0] == 100
        assert run(src, [0])[0] == 200

    def test_if_no_else(self):
        src = "begin if.true push.7 end end"
        assert run(src, [1])[0] == 7
        assert run(src, [0, 9])[0] == 9

    def test_nested_if(self):
        src = """
        begin
            if.true
                if.true push.1 else push.2 end
            else
                if.true push.3 else push.4 end
            end
        end
        """
        assert run(src, [1, 1])[0] == 1
        assert run(src, [1, 0])[0] == 2
        assert run(src, [0, 1])[0] == 3
        assert run(src, [0, 0])[0] == 4

    def test_advice_tape(self):
        src = "begin adv.push adv.push add end"
        assert run(src, [], advice=[30, 12])[0] == 42
        with pytest.raises(VmError, match="advice tape exhausted"):
            run(src, [], advice=[30])

    def test_collatz_program(self):
        # collatz steps with nondeterministic parity advice: each step the
        # prover supplies the branch bit p, the program asserts p is
        # boolean (p*p == p) before branching
        src = """
        begin
            repeat.5
                dup.0 eq.1
                if.true
                    nop
                else
                    adv.push dup.0 dup.0 dup.0 mul eq assert
                    if.true
                        div.2
                    else
                        mul.3 add.1
                    end
                end
            end
        end
        """
        # n=6: 6 ->3 ->10 ->5 ->16 ->8 ; parity advice (1=even branch)
        out = run(src, [6], advice=[1, 0, 1, 0, 1])
        assert out[0] == 8

    def test_selectors_always_one_hot(self):
        src = "begin adv.push if.true inv else eqz end push.1 assert end"
        tr, _ = execute(src, [5], advice_tape=[1], min_rows=16)
        assert np.all(tr[COL_G:COL_G + NUM_GROUPS].sum(axis=0) == 1)
        assert np.all(tr[COL_M:COL_M + NUM_MEMBERS].sum(axis=0) == 1)


@pytest.fixture(scope="module")
def wide_proof():
    """Prove + verify a program exercising every new op family."""
    src = """
    proc.square dup.0 mul end
    begin
        adv.push             # nondeterministic witness w
        dup.0 exec.square    # w^2
        movup.4 drop         # churn the window
        dup.3 dup.5
        add.7 sub.2 mul.3
        eqz
        if.true push.11 else push.13 end
        movdn.4
        inv
        push.1 assert
        eqz
        drop drop drop      # drain the overflow table (net-0 requirement:
                            # the bus boundary asserts it empties)
    end
    """
    trace, out_stack = execute(src, [3, 1, 4, 1, 5], advice_tape=[9],
                               min_rows=64)
    pub = make_public_inputs(program_hash(src), [3, 1, 4, 1, 5],
                             out_stack)
    air = MidenAir(trace.shape[1], pub, OPTS, program=src)
    from aero_tpu.prover import prove
    proof = prove(air, to_gf(trace), pub)
    return proof, pub, air


@pytest.mark.slow
class TestWideProof:
    def test_verifies_with_full_constraint_check(self, wide_proof):
        proof, pub, air = wide_proof
        verify(proof, pub, air=air)

    def test_shape_still_reference(self, wide_proof):
        proof, pub, air = wide_proof
        ctx = proof.context
        assert ctx.layout.main_width == 72
        assert ctx.layout.aux_widths == [9]
        assert air.num_transition_constraints == 112
        assert air.num_assertions == 46

    def test_rejects_wrong_output(self, wide_proof):
        proof, pub, air = wide_proof
        bad = make_public_inputs(pub.program_hash,
                                 list(reversed(pub.stack_inputs)),
                                 [999])
        bad_air = MidenAir(air.trace_length, bad, OPTS, program=air.program)
        with pytest.raises(VerificationError):
            verify(proof, bad, air=bad_air)


class TestAuxBuilders:
    def test_device_aux_equals_host_oracle(self):
        """The vectorized device bus builders (batched inverse +
        associative-scan prefix products) must reproduce the host-exact
        bigint oracle column for column on a trace exercising every bus:
        overflow, chiplet (u32 + bitwise + shift + memory + sortedness),
        ROM LogUp and ROM product."""
        src = """
        begin
            push.4294967295 push.1 u32add
            push.3 u32sub
            push.12 push.10 u32xor
            push.48 push.4 u32shr
            mem.store.5 drop mem.load.5
            push.17 push.5 u32div
            drop drop drop drop drop
        end
        """
        trace, out = execute(src, [0, 0], min_rows=64)
        pub = make_public_inputs(program_hash(src), [0, 0], out)
        air = MidenAir(trace.shape[1], pub, OPTS, program=src)
        from aero_tpu.field import from_gf
        rands = [(7919 * (i + 1) ** 3) % ((1 << 64) - (1 << 32) + 1)
                 for i in range(16)]
        g = to_gf(trace)
        dev = from_gf(air.build_aux_trace(g, rands))
        host = from_gf(air.build_aux_trace_host(g, rands))
        assert np.array_equal(dev, host)
