"""Stdlib module system: use.std::math::u64 (SURVEY §2.10 — the
reference assembles with Assembler::with_module_provider(StdLibrary)).

Every u64 op desugars onto the constrained core ISA, so stdlib results
are sound in-AIR for free; the e2e test proves and verifies a program
that exercises the module."""

import random

import numpy as np
import pytest

from aero_tpu.vm import execute, program_hash
from aero_tpu.vm.stdlib import resolve_imports, StdlibError

M64 = (1 << 64) - 1


def _run(op, a, b):
    src = f"use.std::math::u64\nbegin exec.u64::{op} end"
    _, out = execute(src, [b >> 32, b & 0xFFFFFFFF, a >> 32, a & 0xFFFFFFFF])
    return out


class TestU64Module:
    CASES = [(0, 0), (M64, 1), (M64, M64), (1 << 32, 1 << 32),
             (0xFFFFFFFF, 1), (5, 5)]

    @classmethod
    def setup_class(cls):
        rng = random.Random(1234)
        cls.CASES = cls.CASES + [(rng.getrandbits(64), rng.getrandbits(64))
                                 for _ in range(6)]

    def test_wrapping_arith(self):
        for a, b in self.CASES:
            out = _run("wrapping_add", a, b)
            assert (out[0] << 32) | out[1] == (a + b) & M64
            out = _run("wrapping_sub", a, b)
            assert (out[0] << 32) | out[1] == (a - b) & M64
            out = _run("wrapping_mul", a, b)
            assert (out[0] << 32) | out[1] == (a * b) & M64

    def test_overflowing_add(self):
        for a, b in self.CASES:
            out = _run("overflowing_add", a, b)
            assert out[0] == (1 if a + b > M64 else 0)
            assert (out[1] << 32) | out[2] == (a + b) & M64

    def test_comparisons(self):
        for a, b in self.CASES:
            assert _run("eq", a, b)[0] == int(a == b)
            assert _run("lt", a, b)[0] == int(a < b)
            assert _run("gt", a, b)[0] == int(a > b)
            assert _run("lte", a, b)[0] == int(a <= b)
            assert _run("gte", a, b)[0] == int(a >= b)

    def test_eqz(self):
        for a in (0, 1, 1 << 32, M64):
            src = "use.std::math::u64\nbegin exec.u64::eqz end"
            _, out = execute(src, [a >> 32, a & 0xFFFFFFFF])
            assert out[0] == int(a == 0)


class TestResolution:
    def test_unknown_module_rejected(self):
        with pytest.raises(StdlibError):
            resolve_imports("use.std::does::not::exist\nbegin nop end")

    def test_no_imports_is_identity(self):
        src = "begin push.1 drop end"
        assert resolve_imports(src) is src

    def test_duplicate_use_injected_once(self):
        src = ("use.std::math::u64\nuse.std::math::u64\n"
               "begin exec.u64::eq end")
        resolved = resolve_imports(src)
        assert resolved.count("proc.u64::wrapping_add") == 1

    def test_program_hash_covers_module_bodies(self, monkeypatch):
        """The MAST commitment must change when an imported procedure
        BODY changes, not just the call site."""
        from aero_tpu.vm import stdlib as sl
        src = "use.std::math::u64\nbegin exec.u64::eq end"
        h1 = program_hash(src)
        patched = dict(sl.MODULES)
        patched["std::math::u64"] = sl.MODULES["std::math::u64"].replace(
            "movup.2 eq", "swap movup.2 eq swap swap")
        monkeypatch.setattr(sl, "MODULES", patched)
        assert program_hash(src) != h1


class TestStdlibProve:
    def test_prove_verify_u64_program(self):
        """A program mixing stdlib u64 arithmetic with core ops proves
        and verifies under the full MidenAir constraint set."""
        from aero_tpu.air.miden import MidenAir, make_public_inputs
        from aero_tpu.field import to_gf
        from aero_tpu.spec.proof import ProofOptions
        from aero_tpu.prover.prover import prove
        from aero_tpu.spec.verifier import verify
        from aero_tpu.vm import execute_full

        a = 0xDEADBEEF_CAFEBABE
        b = 0x01234567_89ABCDEF
        src = """
        use.std::math::u64
        begin
            exec.u64::wrapping_mul
            exec.u64::eqz
        end
        """
        inputs = [b >> 32, b & 0xFFFFFFFF, a >> 32, a & 0xFFFFFFFF]
        trace, out_stack, overflow = execute_full(src, inputs, min_rows=64)
        assert out_stack[0] == 0  # product nonzero -> eqz false
        pub = make_public_inputs(program_hash(src), inputs, out_stack,
                                 overflow=overflow)
        opts = ProofOptions(num_queries=7, blowup_factor=8,
                            grinding_factor=1)
        air = MidenAir(trace.shape[1], pub, opts, program=src)
        proof = prove(air, to_gf(trace), pub)
        vair = MidenAir(trace.shape[1], pub, opts, program=src)
        verify(proof, pub, air=vair)
