"""VM + AIR tests for the u32 family, random-access memory, and the
stack-overflow table (groups 4-5 of the ISA; vm.cpp).

Reference analog: the miden v0.3 u32/memory instruction families used by
the stdlib (SURVEY.md 2.10); the reference's own AIR for them is not
recoverable (empty submodule), so semantics here are KAT-tested against
plain integer arithmetic.
"""

import numpy as np
import pytest

from aero_tpu.vm import execute, program_hash, VmError
from aero_tpu.air.miden import MidenAir, make_public_inputs
from aero_tpu.field import to_gf
from aero_tpu.spec.proof import ProofOptions
from aero_tpu.spec.verifier import verify, VerificationError

M32 = (1 << 32) - 1


def run(src_body, inputs=(), **kw):
    _, out = execute(f"begin {src_body} end", list(inputs), **kw)
    return out


class TestU32Semantics:
    def test_wrapping_arith(self):
        # u32add wraps with carry; u32sub wraps with borrow
        assert run(f"push.{M32} push.1 u32add")[0] == 0
        assert run("push.3 push.5 u32sub")[0] == (3 - 5) & M32
        assert run("push.65536 push.65537 u32mul")[0] == (65536 * 65537) & M32
        assert run("push.17 push.5 u32div")[0] == 3
        assert run("push.17 push.5 u32mod")[0] == 2

    def test_bitwise_shift_compare(self):
        assert run("push.12 push.10 u32and")[0] == 12 & 10
        assert run("push.12 push.10 u32or")[0] == 12 | 10
        assert run("push.12 push.10 u32xor")[0] == 12 ^ 10
        assert run("push.0 u32not")[0] == M32
        assert run("push.3 push.4 u32shl")[0] == 3 << 4
        assert run("push.48 push.4 u32shr")[0] == 3
        assert run("push.3 push.4 u32lt")[0] == 1
        assert run("push.4 push.3 u32lt")[0] == 0

    def test_split_and_lohi(self):
        v = (7 << 32) | 12345
        out = run(f"push.{v} u32split")
        assert out[0] == 12345 and out[1] == 7
        assert run(f"push.{v} u32lo")[0] == 12345
        assert run(f"push.{v} u32hi")[0] == 7

    def test_immediate_forms(self):
        assert run("push.10 u32add.5")[0] == 15
        assert run("push.10 u32sub.3")[0] == 7

    def test_traps(self):
        with pytest.raises(VmError):
            run("push.4294967296 push.1 u32add")  # non-u32 operand
        with pytest.raises(VmError):
            run("push.1 push.0 u32div")
        with pytest.raises(VmError):
            run("push.1 push.32 u32shl")


class TestMemory:
    def test_load_store(self):
        # store 99 at addr 7, overwrite, load back
        out = run("push.99 mem.store.7 drop push.5 mem.load.7 add")
        assert out[0] == 104
        out = run("push.1 mem.store.3 drop push.2 mem.store.3 drop "
                  "mem.load.3")
        assert out[0] == 2

    def test_uninitialized_is_zero(self):
        assert run("mem.load.123")[0] == 0


class TestOverflowTable:
    def test_deep_stack_lifo_restore(self):
        # push 20 values past the 16-slot window, then pop back: values
        # parked in the overflow table must return LIFO-intact
        body = " ".join(f"push.{i}" for i in range(1, 21))
        body += " " + " ".join("drop" for _ in range(19))
        out = run(body, [77])
        assert out[0] == 1 and out[1] == 77

    def test_ovf_column_tracks_net(self):
        from aero_tpu.vm import COL_OVF
        tr, _ = execute("begin push.1 push.2 add drop end", [])
        # rows: push(0) push(1) add(2) drop(1) halt... net = col values
        assert list(tr[COL_OVF][:5]) == [0, 1, 2, 1, 0]


@pytest.mark.slow
class TestU32Proofs:
    OPTS = ProofOptions(num_queries=13, blowup_factor=8, grinding_factor=4)

    def _prove(self, src, inputs):
        trace, out_stack = execute(src, inputs, min_rows=64)
        pub = make_public_inputs(program_hash(src), list(inputs), out_stack)
        air = MidenAir(trace.shape[1], pub, self.OPTS, program=src)
        from aero_tpu.prover import prove
        return prove(air, to_gf(trace), pub), pub, air

    def test_u32_mem_overflow_program_proves_and_verifies(self):
        # exercises: exact-witness u32add/u32sub (carry/borrow in h0),
        # nondet u32 ops, memory, and the overflow counter constraint
        src = f"""
        begin
            push.{M32} push.1 u32add        # 0 (carry=1)
            push.3 u32sub                   # wrap borrow
            push.12 push.10 u32xor
            mem.store.5 drop
            mem.load.5
            push.1 push.2 push.3 push.4 push.5 push.6 push.7 push.8
            push.9 push.10 push.11 push.12 push.13 push.14 push.15
            drop drop drop drop drop drop drop drop
            drop drop drop drop drop drop drop
            drop drop     # drain the overflow table (bus boundary: empty)
        end
        """
        proof, pub, air = self._prove(src, [0, 0])
        verify(proof, pub, air=air)

    def test_forged_overflow_restore_rejected(self):
        # the overflow-bus multiset argument (aux0 + cols 35-37) makes the
        # value restored into s15 by a window-up op SOUND: tampering it in
        # the trace must fail verification. Program parks a REAL value
        # (77 dup'd past the window) and restores it.
        src = ("begin " + " ".join(f"push.{i}" for i in range(1, 18))
               + " " + " ".join("drop" for _ in range(17)) + " end")
        trace, out_stack = execute(src, [77], min_rows=64)
        from aero_tpu.vm import COL_STACK, COL_B1
        # find a pop row where s15 was restored from the table (b1 shrank)
        rows = np.where(trace[COL_B1][1:] < trace[COL_B1][:-1])[0]
        rowi = int(rows[0]) + 1
        trace[COL_STACK + 15, rowi] = 4242
        pub = make_public_inputs(program_hash(src), [77], out_stack)
        air = MidenAir(trace.shape[1], pub, self.OPTS, program=src)
        from aero_tpu.prover import prove
        proof = prove(air, to_gf(trace), pub)
        with pytest.raises(VerificationError):
            verify(proof, pub, air=air)

    def test_forged_u32add_carry_rejected(self):
        # u32add is exactly constrained: tampering the result in the trace
        # must fail the full (air=) verification
        # balanced program (net-0 overflow) so the honest version would
        # verify and the forgery is what gets rejected
        src = "begin push.7 push.8 u32add drop end"
        trace, out_stack = execute(src, [0, 0], min_rows=64)
        rowi = 3  # row AFTER u32add executes carries its result in s0
        from aero_tpu.vm import COL_STACK
        trace[COL_STACK, rowi] = 999  # forge the sum on that row only
        pub = make_public_inputs(program_hash(src), [0, 0], out_stack)
        air = MidenAir(trace.shape[1], pub, self.OPTS, program=src)
        from aero_tpu.prover import prove
        proof = prove(air, to_gf(trace), pub)
        with pytest.raises(VerificationError):
            verify(proof, pub, air=air)


@pytest.mark.slow
class TestNonEmptyOverflow:
    OPTS = ProofOptions(num_queries=7, blowup_factor=8, grinding_factor=1)

    def _setup(self):
        from aero_tpu.vm import execute_full
        # net-positive stack growth: the final overflow table keeps 18
        # rows, carried in PublicInputs (addresses + parked values)
        src = ("begin " + " ".join(f"push.{i}" for i in range(1, 21))
               + " drop drop end")
        trace, out, ovf = execute_full(src, [7, 8], min_rows=64)
        assert len(ovf) == 18
        return src, trace, out, ovf

    def test_unbalanced_program_proves_and_verifies(self):
        from aero_tpu.prover import prove
        src, trace, out, ovf = self._setup()
        pub = make_public_inputs(program_hash(src), [7, 8], out,
                                 overflow=ovf)
        air = MidenAir(trace.shape[1], pub, self.OPTS, program=src)
        proof = prove(air, to_gf(trace), pub)
        verify(proof, pub, air=air)

    def test_tampered_overflow_claim_rejected(self):
        from aero_tpu.prover import prove
        src, trace, out, ovf = self._setup()
        pub = make_public_inputs(program_hash(src), [7, 8], out,
                                 overflow=ovf)
        air = MidenAir(trace.shape[1], pub, self.OPTS, program=src)
        proof = prove(air, to_gf(trace), pub)
        # tamper one parked value in the claimed table
        forged = [(a, v + 1 if i == 5 else v)
                  for i, (a, v) in enumerate(ovf)]
        bad = make_public_inputs(program_hash(src), [7, 8], out,
                                 overflow=forged)
        bad_air = MidenAir(trace.shape[1], bad, self.OPTS, program=src)
        with pytest.raises(VerificationError):
            verify(proof, bad, air=bad_air)
