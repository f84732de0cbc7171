"""miden v0.3 ISA sugar: exp.N, cswap, word memory (padw/dropw/loadw/
storew), and proc locals (proc.name.K + loc_load/loc_store) — all
desugared by the assembler onto the constrained core ops, so no new AIR
surface. Reference: the fork's v0.3 instruction set (README.md:49-53).
"""

import pytest

from aero_tpu.vm import execute, program_hash, VmError
from aero_tpu.air.miden import MidenAir, make_public_inputs
from aero_tpu.field import to_gf
from aero_tpu.spec.proof import ProofOptions
from aero_tpu.spec.verifier import verify, VerificationError

P = (1 << 64) - (1 << 32) + 1


def run(body, inputs=(), advice=None):
    _, out = execute(f"begin {body} end", list(inputs),
                     advice_tape=advice)
    return out


class TestExp:
    def test_small(self):
        assert run("push.3 exp.5")[0] == 3 ** 5
        assert run("push.7 exp.0")[0] == 1
        assert run("push.7 exp.1")[0] == 7

    def test_field_wrap(self):
        assert run("push.2 exp.64")[0] == pow(2, 64, P)
        assert run("push.12345 exp.1000")[0] == pow(12345, 1000, P)


class TestCswap:
    def test_swap_and_keep(self):
        # stack [c, b, a]: c=1 swaps the pair under it
        assert run("push.20 push.10 push.1 cswap")[:2] == [20, 10]
        assert run("push.20 push.10 push.0 cswap")[:2] == [10, 20]

    def test_non_boolean_condition_traps(self):
        with pytest.raises(VmError):
            run("push.20 push.10 push.2 cswap")


class TestWordMemory:
    def test_padw_dropw(self):
        out = run("push.9 padw")
        assert out[:5] == [0, 0, 0, 0, 9]
        assert run("push.9 padw dropw")[0] == 9

    def test_storew_loadw_roundtrip(self):
        out = run("push.4 push.3 push.2 push.1 storew.5 dropw padw loadw.5")
        assert out[:4] == [1, 2, 3, 4]

    def test_storew_keeps_values(self):
        out = run("push.4 push.3 push.2 push.1 storew.0")
        assert out[:4] == [1, 2, 3, 4]

    def test_words_do_not_alias(self):
        out = run("push.4 push.3 push.2 push.1 storew.0 dropw "
                  "padw loadw.1")
        assert out[:4] == [0, 0, 0, 0]


class TestProcLocals:
    def test_locals(self):
        src = """
        proc.acc.2
            loc_store.0
            loc_load.0 loc_load.0 add
            loc_store.1
            loc_load.1
        end
        begin push.21 exec.acc end
        """
        _, out = execute(src, [])
        assert out[0] == 42

    def test_two_procs_do_not_alias(self):
        src = """
        proc.a.1 loc_store.0 loc_load.0 end
        proc.b.1 loc_store.0 loc_load.0 end
        begin push.5 exec.a drop push.7 exec.b drop
              push.0 exec.a end
        """
        # calling a again must see ITS slot (last stored 5 -> now 0),
        # never b's 7
        _, out = execute(src, [])
        assert out[0] == 0

    def test_out_of_range_local(self):
        src = "proc.f.1 loc_store.1 end begin push.1 exec.f end"
        with pytest.raises(VmError):
            execute(src, [])


@pytest.mark.slow
class TestSugarProof:
    def test_proves_and_verifies(self):
        # one program through every sugar family, proven end-to-end
        src = """
        proc.poly.1
            loc_store.0
            loc_load.0 exp.3
            loc_load.0 add
        end
        begin
            push.4 push.3 push.2 push.1 storew.2 dropw
            padw loadw.2 drop drop drop      # leaves w3 = 4 on top
            push.5 exec.poly add              # 4 + 5^3 + 5 = 134
            push.0 cswap                      # no-op swap (c = 0)
            swap drop                         # drain the overflow table
        end
        """
        trace, out = execute(src, [0, 0], min_rows=64)
        assert out[0] == 134
        pub = make_public_inputs(program_hash(src), [0, 0], out)
        opts = ProofOptions(num_queries=7, blowup_factor=8,
                            grinding_factor=1)
        air = MidenAir(trace.shape[1], pub, opts, program=src)
        from aero_tpu.prover import prove
        proof = prove(air, to_gf(trace), pub)
        verify(proof, pub, air=air)


class TestAdvLoadw:
    def test_overwrites_top_word_from_tape(self):
        out = run("push.9 padw adv.loadw", advice=[1, 2, 3, 4])
        assert out[:5] == [4, 3, 2, 1, 9]
