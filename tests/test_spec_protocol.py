"""Known-answer tests for the protocol specification layer.

KAT sources: the reference's integration tests
(tests/integration/test_verifier.cairo:44,104,108) and unit tests
(tests/unit/test_math_g.cairo), plus the golden proof artifact
(proofs/fib.bin, mounted read-only at /root/reference).
"""

import os

import pytest

from aero_tpu.spec import field as F
from aero_tpu.spec.coin import RandomCoin
from aero_tpu.spec.hashing import hash_elements
from aero_tpu.spec.merkle import MerkleTree, BatchMerkleProof
from aero_tpu.spec.polys import ntt_naive, eval_poly_on_coset, lagrange_eval, interpolate, poly_eval
from aero_tpu.spec.proof import load_proof_file, dump_proof_file
from aero_tpu.spec.verifier import verify

GOLDEN = "/root/reference/proofs/fib.bin"
needs_golden = pytest.mark.skipif(not os.path.exists(GOLDEN),
                                  reason="golden proof not available")

# program-hash KAT (test_verifier.cairo:44-47)
FIB_PROGRAM_HASH = [2541413064022245539, 7129587402699328827,
                    5589074863266416554, 8033675306619022710]
FIB_PUB_ELEMENTS = FIB_PROGRAM_HASH + [1, 0] + [55, 34] + [0] * 14


class TestField:
    def test_basic(self):
        # wraparound cases from tests/unit/test_math_g.cairo:10-38
        assert F.sub(1, 2) == F.P - 1
        assert F.add(F.P - 1, 2) == 1
        assert F.mul(F.P - 1, F.P - 1) == 1
        for a in [1, 2, 7, 1234567, F.P - 1, 2**63]:
            assert F.mul(a, F.inv(a)) == 1
            assert F.div(F.mul(a, 13), 13) == a

    def test_roots_of_unity(self):
        for logn in [1, 2, 10, 13, 20]:
            w = F.get_root_of_unity(logn)
            assert F.exp(w, 1 << logn) == 1
            assert F.exp(w, 1 << (logn - 1)) == F.P - 1

    def test_batch_inv(self):
        xs = [3, 5, 7, 11, F.P - 2, 123456789]
        assert F.batch_inv(xs) == [F.inv(x) for x in xs]


class TestCoin:
    def test_first_draw_kat(self):
        # test_verifier.cairo:104
        coin = RandomCoin(hash_elements(FIB_PUB_ELEMENTS))
        assert coin.draw() == 15636605459427237624

    def test_draw_integers_kat(self):
        # test_verifier.cairo:108-110
        coin = RandomCoin(hash_elements(FIB_PUB_ELEMENTS))
        coin.draw()
        assert coin.draw_integers(20, 64) == [
            55, 46, 17, 44, 61, 8, 43, 39, 19, 3, 26, 31, 30, 4, 37, 40,
            49, 7, 56, 29]


class TestPolys:
    def test_ntt_roundtrip(self):
        import random
        rng = random.Random(0)
        coeffs = [rng.randrange(F.P) for _ in range(64)]
        evals = ntt_naive(coeffs)
        w = F.get_root_of_unity(6)
        # spot-check a few evaluations
        for i in [0, 1, 5, 63]:
            assert evals[i] == poly_eval(coeffs, F.exp(w, i))
        assert ntt_naive(evals, invert=True) == coeffs

    def test_lde(self):
        import random
        rng = random.Random(1)
        coeffs = [rng.randrange(F.P) for _ in range(16)]
        lde = eval_poly_on_coset(coeffs, 3, 7)
        w = F.get_root_of_unity(7)
        for i in [0, 3, 127]:
            assert lde[i] == poly_eval(coeffs, F.mul(7, F.exp(w, i)))

    def test_lagrange(self):
        import random
        rng = random.Random(2)
        coeffs = [rng.randrange(F.P) for _ in range(8)]
        xs = [rng.randrange(F.P) for _ in range(8)]
        ys = [poly_eval(coeffs, x) for x in xs]
        at = rng.randrange(F.P)
        assert lagrange_eval(xs, ys, at) == poly_eval(coeffs, at)
        assert interpolate(xs, ys) == coeffs


class TestMerkle:
    def test_batch_roundtrip(self):
        import random
        rng = random.Random(3)
        leaves = [hash_elements([i]) for i in range(256)]
        tree = MerkleTree(leaves)
        for trial in range(5):
            k = rng.randrange(1, 40)
            idxs = rng.sample(range(256), k)
            proof = tree.prove_batch(idxs)
            assert proof.get_root(idxs) == tree.root
            # serialization roundtrip
            blob = proof.serialize_nodes()
            p2 = BatchMerkleProof.deserialize_nodes(blob, proof.leaves, tree.depth)
            assert p2.get_root(idxs) == tree.root
            # single-path decompression agrees with direct paths
            paths = proof.into_paths(idxs)
            for idx, path in zip(idxs, paths):
                assert path == tree.prove(idx)


@needs_golden
class TestGoldenProof:
    def test_parse_roundtrip_bit_exact(self):
        pub, proof = load_proof_file(GOLDEN)
        assert pub.program_hash == FIB_PROGRAM_HASH
        assert proof.pow_nonce == 45692
        assert dump_proof_file(pub, proof) == open(GOLDEN, "rb").read()

    def test_full_verification(self):
        pub, proof = load_proof_file(GOLDEN)
        t = verify(proof, pub)
        assert len(t.query_positions) == 27

    def test_verification_rejects_tampering(self):
        pub, proof = load_proof_file(GOLDEN)
        proof.pow_nonce += 1
        with pytest.raises(Exception):
            verify(proof, pub)


class TestMalformedProofsFailClosed:
    """Malformed SHAPES must raise VerificationError, never IndexError/
    AssertionError — the verifier is the security boundary (VERDICT r4
    weak #7)."""

    def _expect(self, mutate):
        from aero_tpu.spec.verifier import VerificationError
        pub, proof = load_proof_file(GOLDEN)
        mutate(proof)
        with pytest.raises(VerificationError):
            verify(proof, pub)

    def test_missing_aux_segment_queries(self):
        self._expect(lambda p: p.trace_queries.pop())

    def test_no_trace_queries_at_all(self):
        self._expect(lambda p: p.trace_queries.clear())

    def test_truncated_main_query_values(self):
        def m(p):
            q = p.trace_queries[0]
            q.values = q.values[:-8]
        self._expect(m)

    def test_truncated_constraint_query_values(self):
        def m(p):
            p.constraint_queries.values = p.constraint_queries.values[:40]
        self._expect(m)

    def test_oversized_remainder(self):
        def m(p):
            p.fri_proof.remainder = p.fri_proof.remainder * 9
        self._expect(m)

    def test_empty_remainder(self):
        def m(p):
            p.fri_proof.remainder = b""
        self._expect(m)

    def test_missing_fri_layer(self):
        self._expect(lambda p: p.fri_proof.layers.pop())

    def test_truncated_ood_frame(self):
        def m(p):
            p.ood_frame.trace_states = p.ood_frame.trace_states[:-16]
        self._expect(m)

    def test_empty_ood_evaluations(self):
        def m(p):
            p.ood_frame.evaluations = b""
        self._expect(m)

    def test_missing_commitment(self):
        self._expect(lambda p: p.commitments.pop())

    def test_truncated_commitment_digest(self):
        def m(p):
            p.commitments[0] = p.commitments[0][:31]
        self._expect(m)

    def test_fri_layer_values_truncated(self):
        def m(p):
            p.fri_proof.layers[0].values = p.fri_proof.layers[0].values[:64]
        self._expect(m)
