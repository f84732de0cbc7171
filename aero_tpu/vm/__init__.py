"""Miden-assembly-subset VM: Python binding over the native C++ core.

The executor (aero_tpu/vm/core/vm.cpp) assembles and runs the program,
emitting the 72-column execution trace directly into a numpy buffer
(column-major). The reference analog is the forked miden-vm processor
invoked at aero-sdk/miden-wasm/src/proving_worker.rs:225-234; the advice
tape mirrors ProgramInputs.advice_tape (miden_prover.proto).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "core", "libaerovm.so")
_SRC = os.path.join(_DIR, "core", "vm.cpp")

NUM_COLS = 72
# column indices (must match vm.cpp)
COL_CLK = 0
COL_G = 1        # 6 opcode group selectors
COL_M = 7        # 8 opcode member selectors
NUM_GROUPS = 6
NUM_MEMBERS = 8
COL_IMM = 15
COL_STACK = 16   # s0..s15
COL_DEPTH = 32
COL_OVF = 33
COL_H0 = 34
COL_B1 = 35   # newest overflow-row address (0 = table empty)
COL_E = 36    # emptiness flag (1 iff b1 == 0)
COL_K = 37    # inverse witness b1^-1

# op index = group*8 + member; order must match vm.cpp's enum
OPS = [
    # group 0: window-down
    "push", "advpush", "dup0", "dup1", "dup2", "dup3", "dup4", "dup5",
    # group 1: window-up
    "drop", "add", "sub", "mul", "and", "or", "eq", "neq",
    # group 2: in-place
    "nop", "halt", "neg", "not", "inv", "eqz", "assert", "swap",
    # group 3: permutations + high dups
    "movup2", "movup3", "movup4", "movdn2", "movdn3", "movdn4",
    "dup6", "dup7",
    # group 4: u32 family (checked-wrapping; in-place lo/hi, binary rest)
    "u32lo", "u32hi", "u32add", "u32sub", "u32mul", "u32div",
    "u32mod", "u32and",
    # group 5: u32 bitwise/shift/compare + random-access memory
    "u32or", "u32xor", "u32not", "u32shl", "u32shr", "u32lt",
    "memload", "memstore",
]
NUM_OPS = len(OPS)


def set_op_selectors(row: np.ndarray, op_name: str) -> None:
    """Zero + set the two-level selector columns of a trace row (host-side
    trace surgery in tests / halt padding)."""
    idx = OPS.index(op_name)
    row[COL_G:COL_G + NUM_GROUPS] = 0
    row[COL_M:COL_M + NUM_MEMBERS] = 0
    row[COL_G + idx // 8] = 1
    row[COL_M + idx % 8] = 1


def _ensure_built():
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                       check=True)


_lib = None


def _load():
    global _lib
    if _lib is None:
        _ensure_built()
        _lib = ctypes.CDLL(_SO)
        _lib.vm_execute.restype = ctypes.c_longlong
        _lib.vm_execute.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint64)]
        _lib.vm_last_error.restype = ctypes.c_char_p
    return _lib


class VmError(Exception):
    pass


def execute(source: str, stack_inputs: Sequence[int],
            advice_tape: Optional[Sequence[int]] = None,
            max_rows: int = 1 << 22, min_rows: int = 8
            ) -> Tuple[np.ndarray, List[int]]:
    """Assemble + execute. stack_inputs are top-first; advice_tape feeds
    adv.push (nondeterministic inputs, not part of the public statement).

    Returns (trace, output_stack): trace uint64[72, n] with n a power of 2,
    output_stack = final 16 stack slots (top-first)."""
    lib = _load()
    inputs = np.asarray(list(stack_inputs), dtype=np.uint64)
    adv = np.asarray(list(advice_tape or []), dtype=np.uint64)
    trace = np.zeros(NUM_COLS * max_rows, dtype=np.uint64)
    stack_out = np.zeros(16, dtype=np.uint64)
    n = lib.vm_execute(
        source.encode(),
        inputs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(inputs),
        adv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(adv),
        trace.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        max_rows, stack_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    if n < 0:
        raise VmError(lib.vm_last_error().decode())
    n = int(n)
    tr = trace[:NUM_COLS * n].reshape(NUM_COLS, n).copy()
    if n < min_rows:
        # extend with halt rows (state frozen, clk advances)
        ext = np.zeros((NUM_COLS, min_rows), dtype=np.uint64)
        ext[:, :n] = tr
        for r in range(n, min_rows):
            ext[:, r] = ext[:, n - 1]
            ext[COL_CLK, r] = r
            set_op_selectors(ext[:, r], "halt")
        tr = ext
    return tr, [int(x) for x in stack_out]


def program_hash(source: str) -> List[int]:
    """Program commitment: blake2s-256 of the canonical source tokens,
    as 4 field elements (u64 LE words reduced mod p).

    The reference uses the miden MAST root (program.hash(), main.rs:35);
    binding of this hash to the executed trace is a documented gap
    (requires the program-ROM bus argument)."""
    P = (1 << 64) - (1 << 32) + 1
    canon = " ".join(source.split()).encode()
    d = hashlib.blake2s(canon).digest()
    return [int.from_bytes(d[i * 8:(i + 1) * 8], "little") % P
            for i in range(4)]


def fibonacci_source(n_iters: int) -> str:
    """The fib program in our Miden-assembly subset (reference shape:
    miden-proof-generator/src/main.rs:55-74)."""
    return f"""
    # Computes {n_iters} Fibonacci iterations: (a, b) -> (a+b, a)
    proc.fib_iter
        swap dup.1 add
    end
    begin
        repeat.{n_iters}
            exec.fib_iter
        end
    end
    """
