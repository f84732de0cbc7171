"""Adversarial forgery suite: per-family trace-surgery attacks that MUST
be rejected by the full verifier (air= OOD constraint check enabled).

Each test forges a specific soundness property the chiplet/ROM machinery
claims to enforce — including the two forgeries the round-3 review
probe-confirmed as ACCEPTED (u32add carry, u32lo non-canonical split)
and the three chiplet-layout attacks from the round-3 advisory (start
at nonzero pc, memory row at row 0, split memory runs). The honest
variants of these workloads prove and verify in test_vm_u32_mem /
test_miden_pipeline; here only the forged versions appear, and every
one must raise VerificationError.

Reference analog: the fully range-checked ProcessorAir u32 semantics
(src/stark_verifier/air/air_instance.cairo:95-111) and the miden
chiplet ordering design (SURVEY.md 2.10).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from aero_tpu.vm import (execute, program_hash, rom_listing,
                         COL_STACK, COL_H0, COL_PC, COL_IMM,
                         CH_CA, CH_CM, CH_CF, CH_CL, CH_C1, CH_C2,
                         CH_BITS, CH_ACC, CH_ACCZ, CH_SH, CH_P2, CH_CW,
                         CH_MA, CH_MCLK, CH_MV, CH_MW, CH_MG, CH_MD)
from aero_tpu.air.miden import MidenAir, make_public_inputs
from aero_tpu.field import to_gf
from aero_tpu.prover import prove
from aero_tpu.spec.proof import ProofOptions
from aero_tpu.spec.verifier import verify, VerificationError

M32 = (1 << 32) - 1
OPTS = ProofOptions(num_queries=7, blowup_factor=8, grinding_factor=1)


def prove_forged(src, trace, out_stack, inputs):
    pub = make_public_inputs(program_hash(src), list(inputs), out_stack)
    air = MidenAir(trace.shape[1], pub, OPTS, program=src)
    proof = prove(air, to_gf(trace), pub)
    with pytest.raises(VerificationError):
        verify(proof, pub, air=air)


def write_range4_block(trace, row0, values):
    """Overwrite 8 chiplet rows with a RANGE4 block certifying `values`
    (up to 4 u32s) — the attacker's tool for forging bus responses."""
    trace[38:72, row0:row0 + 8] = 0
    for j in range(8):
        r = row0 + j
        trace[CH_CA, r] = 1
        trace[CH_CF, r] = 1 if j == 0 else 0
        trace[CH_CL, r] = 1  # L_RANGE4
        shift = 4 * (7 - j)
        for k, v in enumerate(values):
            nib = (v >> shift) & 0xF
            for t in range(4):
                trace[CH_BITS + 4 * k + t, r] = (nib >> t) & 1
            trace[CH_ACC + k, r] = v >> shift
        trace[CH_P2, r] = 1
        trace[CH_CW, r] = 16 ** j


def write_mem_row(trace, r, addr, clk, val, w, same=0, md=0):
    trace[38:72, r] = 0
    trace[CH_CM, r] = 1
    trace[CH_MA, r] = addr
    trace[CH_MCLK, r] = clk
    trace[CH_MV, r] = val
    trace[CH_MW, r] = w
    trace[CH_MG, r] = same
    trace[CH_MD, r] = md


def write_rom_rows(trace, row0, listing, mults):
    for i, ((pc, op, imm), mult) in enumerate(zip(listing, mults)):
        r = row0 + i
        trace[38:72, r] = 0
        trace[CH_MA, r] = 1  # CR flag
        trace[CH_MCLK, r] = pc
        trace[CH_MV, r] = op
        trace[CH_MW, r] = imm
        trace[CH_MG, r] = mult


class TestU32Forgeries:
    def test_forged_u32add_carry(self):
        # the round-3 probe: claim u32add(2^32-1, 1) = 2^32 by forging
        # carry = 0. The result now rides the RANGE4 request: 2^32 has
        # no 8-nibble decomposition, so the bus cannot balance.
        src = f"begin push.{M32} push.1 u32add drop drop drop end"
        trace, out = execute(src, [0, 0], min_rows=64)
        trace[COL_H0, 2] = 0            # forged carry on the u32add row
        trace[COL_STACK, 3] = 1 << 32   # forged result (consumed by drop)
        prove_forged(src, trace, out, [0, 0])

    def test_forged_u32sub_borrow(self):
        # claim u32sub(5, 3) = 2 + 2^32 via a forged borrow = 1
        src = "begin push.5 push.3 u32sub drop drop drop end"
        trace, out = execute(src, [0, 0], min_rows=64)
        trace[COL_H0, 2] = 1
        trace[COL_STACK, 3] = 2 + (1 << 32)
        prove_forged(src, trace, out, [0, 0])

    def test_forged_u32lo_noncanonical_split(self):
        # the round-3 probe: u32lo(5) = 6 via the non-canonical split
        # (hi = 2^32-1, lo = 6), valid mod p because 2^64-2^32 === -1.
        # The attacker patches the RANGE4 block to certify (2^32-1, 6)
        # — both genuine u32s — so only the canonical-split constraint
        # (107/108) rejects it.
        src = "begin push.5 u32lo drop drop drop end"
        trace, out = execute(src, [0, 0], min_rows=64)
        rowi = 1  # the u32lo row (row 0 = push.5)
        trace[COL_H0, rowi] = M32          # forged hi
        trace[COL_IMM, rowi] = 0           # witness: d = 0 -> z = 1
        trace[COL_STACK, rowi + 1] = 6     # forged lo
        write_range4_block(trace, 1, [M32, 6])
        prove_forged(src, trace, out, [0, 0])

    def test_forged_u32mul_result(self):
        # regression (probe-verified rejected in round 3): 2^16 * 2^16
        # with forged (q=0, r=2^32) — identity holds mod p, range fails
        src = "begin push.65536 push.65536 u32mul drop drop drop end"
        trace, out = execute(src, [0, 0], min_rows=64)
        trace[COL_H0, 2] = 0
        trace[COL_STACK, 3] = 1 << 32
        prove_forged(src, trace, out, [0, 0])

    def test_forged_u32div_nonu32_dividend(self):
        # the round-3 advisory (medium): prove u32div on a dividend the
        # VM's checked semantics trap on. The dividend arrives via the
        # (attacker-chosen) input stack, so every transition constraint
        # holds for the forged claim: a = b*q + r is EXACT over the
        # integers (no field wrap), q, r, b, b-1-r are all genuine u32s
        # — only the new dividend range check can reject it.
        a, b = (1 << 33) + 6, 3
        q, r = a // b, a % b
        assert q < (1 << 32)
        src = "begin u32div end"
        trace, out = execute(src, [b, 9], min_rows=64)   # honest 9/3
        trace[COL_STACK + 1, 0] = a      # forged dividend (claimed input)
        trace[COL_H0, 0] = r
        for i in range(1, trace.shape[1]):
            trace[COL_STACK, i] = q      # forged quotient to the end
        forged_out = [q] + list(out[1:])
        # patch the certifying block for the forged division; the
        # dividend block (rows 9-16) cannot certify a >= 2^32 — leave
        # the attacker's best effort (a mod 2^32) in place
        write_range4_block(trace, 1, [b, q, r, b - 1 - r])
        write_range4_block(trace, 9, [a & M32])
        prove_forged(src, trace, forged_out, [b, a])

    def test_forged_u32and_result(self):
        # regression (probe-verified rejected in round 3)
        src = "begin push.12 push.10 u32and drop drop drop end"
        trace, out = execute(src, [0, 0], min_rows=64)
        trace[COL_STACK, 3] = 9    # honest 12 & 10 = 8
        prove_forged(src, trace, out, [0, 0])


class TestMemoryForgeries:
    def test_forged_memload_value(self):
        # regression (probe-verified rejected in round 3): load returns
        # a value never stored
        src = "begin push.99 mem.store.7 drop mem.load.7 drop drop drop end"
        trace, out = execute(src, [0, 0], min_rows=64)
        load_rows = np.where(trace[COL_IMM] == 7)[0]
        rowi = int(load_rows[1]) + 1     # row of mem.load (after push.7)
        trace[COL_STACK, rowi + 1] = 55  # forged loaded value
        prove_forged(src, trace, out, [0, 0])

    def test_forged_fresh_read_at_row0(self):
        # round-3 advisory (high): a CM memory row placed at row 0
        # escaped the fresh-read-zero constraint (which only gates
        # transitions into rows >= 1) and could answer a memload with
        # an arbitrary value. CH_CM[0] = 0 boundary assertion kills it.
        src = "begin mem.load.123 drop drop drop end"
        trace, out = execute(src, [0, 0], min_rows=64)
        clk = int(trace[0, 1])           # the mem.load row's clk
        forged_out = list(out)
        # forged load result 777, consumed by the drop
        trace[COL_STACK, 2] = 777
        # move the answering memory row from row 1 to row 0
        trace[38:72, 1] = 0
        write_mem_row(trace, 0, 123, clk, 777, 0)
        prove_forged(src, trace, forged_out, [0, 0])

    def test_forged_split_memory_runs(self):
        # round-3 advisory (high): split the memory rows into disjoint
        # runs so a read of a written address restarts as "fresh" and
        # legally returns 0. The contiguity constraint (110) kills it.
        src = "begin push.99 mem.store.5 drop mem.load.5 drop drop drop end"
        trace, out = execute(src, [0, 0], min_rows=64)
        mem_rows = np.where(trace[CH_CM] == 1)[0]
        assert len(mem_rows) == 2
        r_w, r_r = int(mem_rows[0]), int(mem_rows[1])
        w_row = trace[38:72, r_w].copy()
        r_row = trace[38:72, r_r].copy()
        load_rows = np.where(trace[COL_IMM] == 5)[0]
        rowi = int(load_rows[1]) + 1     # the mem.load row
        trace[COL_STACK, rowi + 1] = 0   # forged load = 0
        # drop the sortedness block (rows 1-8: no adjacent pair remains
        # to request it) and lay the two memory rows out as DISJOINT
        # runs: write at row 1 (legal start), read at row 4 "fresh"
        trace[38:72, 1:r_r + 1] = 0
        trace[38:72, 1] = w_row
        trace[CH_MG, 1] = 0
        trace[CH_MD, 1] = 0
        trace[38:72, 4] = r_row
        trace[CH_MV, 4] = 0              # fresh read "legally" returns 0
        trace[CH_MG, 4] = 0
        trace[CH_MD, 4] = 0
        prove_forged(src, trace, out, [0, 0])


class TestProgramForgeries:
    def test_prove_a_claim_b(self):
        # regression (probe-verified rejected in round 3): execute
        # program A but claim program B with the same outputs
        src_a = "begin push.7 drop drop drop end"
        src_b = "begin nop push.7 drop drop drop end"
        trace, out = execute(src_a, [0, 0], min_rows=64)
        pub = make_public_inputs(program_hash(src_b), [0, 0], out)
        air = MidenAir(trace.shape[1], pub, OPTS, program=src_b)
        proof = prove(air, to_gf(trace), pub)
        with pytest.raises(VerificationError):
            verify(proof, pub, air=air)

    def test_skip_assert_prefix(self):
        # round-3 advisory (high): without a pc[0] boundary the prover
        # could start execution past an assert prefix. Forge: execute
        # only the suffix "push.7 drop..." of a program whose prefix
        # asserts a condition that is FALSE for these inputs, shift the
        # pc column by the prefix length, and commit the full program's
        # ROM. Every transition constraint holds; only the new
        # Assertion(pc, 0, 0) rejects it.
        full = "begin push.0 assert push.7 drop drop drop end"
        suffix = "begin push.7 drop drop drop end"
        trace, out = execute(suffix, [0, 0], min_rows=64)
        n = trace.shape[1]
        rom_full = rom_listing(full)       # pcs 0..4 + halt@5... entries
        rom_suffix = rom_listing(suffix)
        shift = len(rom_full) - len(rom_suffix)   # prefix length = 2
        # shift the executed pcs past the prefix
        trace[COL_PC] += shift
        # ordinary drop/nop rows carry imm = pc+1: re-point them
        drop_sel = (trace[1 + 1] == 1) & (trace[7 + 0] == 1)  # group1 m0
        trace[COL_IMM][drop_sel] += shift
        # rewrite the ROM chiplet with the FULL listing; multiplicities
        # from the patched trace (rows 0..n-2)
        rom_rows = np.where((trace[CH_MA] == 1) & (trace[CH_CA] == 0)
                            & (trace[CH_CM] == 0))[0]
        row0 = int(rom_rows[0])
        trace[38:72, rom_rows] = 0
        counts = [int(np.sum(trace[COL_PC][:n - 1] == pc))
                  for pc, _, _ in rom_full]
        write_rom_rows(trace, row0, rom_full, counts)
        pub = make_public_inputs(program_hash(full), [0, 0], out)
        air = MidenAir(n, pub, OPTS, program=full)
        proof = prove(air, to_gf(trace), pub)
        with pytest.raises(VerificationError):
            verify(proof, pub, air=air)
