"""MAST-style program commitment (vm/mast.py) — the reference binds
proofs to the Miden MAST root (miden-proof-generator/src/main.rs:35);
ours is the same block-tree commitment structure over our AST."""

import pytest

from aero_tpu.vm.mast import mast_root, mast_root_felts
from aero_tpu.vm import program_hash, fibonacci_source


class TestMastRoot:
    def test_formatting_invariant(self):
        a = "begin\n  push.1 push.2\n  add\nend"
        b = "begin push.1   push.2 add end  # trailing comment"
        assert mast_root(a) == mast_root(b)

    def test_content_sensitive(self):
        a = "begin push.1 push.2 add end"
        b = "begin push.1 push.3 add end"
        assert mast_root(a) != mast_root(b)

    def test_structure_sensitive(self):
        # same token multiset, different tree
        a = "begin repeat.2 swap end add end"
        b = "begin swap repeat.2 add end end"
        assert mast_root(a) != mast_root(b)

    def test_repeat_count_committed(self):
        a = "begin repeat.2 add end end"
        b = "begin repeat.3 add end end"
        assert mast_root(a) != mast_root(b)

    def test_if_else_split(self):
        a = "begin if.true add else sub end end"
        b = "begin if.true sub else add end end"
        assert mast_root(a) != mast_root(b)

    def test_proc_commitment_by_digest(self):
        a = "proc.f swap add end begin exec.f exec.f end"
        b = "proc.f swap add end begin exec.f end"
        assert mast_root(a) != mast_root(b)
        # proc NAME does not enter the digest of the call site's body
        # beyond the decl binding — a renamed proc with the same body
        # and locals count commits identically
        c = "proc.g swap add end begin exec.g exec.g end"
        assert mast_root(a) != mast_root(c)  # decl (incl. name) committed

    def test_locals_count_committed(self):
        a = "proc.f.2 loc_store.0 loc_load.0 end begin push.1 exec.f end"
        b = "proc.f.3 loc_store.0 loc_load.0 end begin push.1 exec.f end"
        assert mast_root(a) != mast_root(b)

    def test_program_hash_is_mast_root(self):
        src = fibonacci_source(10)
        assert program_hash(src) == mast_root_felts(src)
        assert all(0 <= v < (1 << 64) - (1 << 32) + 1
                   for v in program_hash(src))

    def test_no_begin_block_raises(self):
        with pytest.raises(ValueError):
            mast_root("proc.f add end")
