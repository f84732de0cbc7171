"""Fibonacci AIR — the framework's first end-to-end "model".

Two main columns (a, b) advancing two Fibonacci numbers per step, plus one
auxiliary running-product column driven by 2 random elements to exercise the
full aux-segment machinery (commitment, rand drawing, aux OOD frames) that
the Miden pipeline needs (reference analog: the fib programs proved at
miden-proof-generator/src/main.rs:55-74 and demo fib(1000)).

Transitions (degrees 1, 1, 2):
  C0: a' - (a + b)
  C1: b' - (a + 2b)
  C2: p' - p * (r0 + a + r1 * b)
Assertions: a[0] = 1, b[0] = 2, b[n-1] = result, p[0] = 1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

from ..spec import field as F
from ..field import (GF, add, sub, mul, mul_scalar, gf_full, to_gf)
from .air import Air, Assertion, TransitionDegree


@dataclass
class FibPublicInputs:
    """Public inputs: the claimed value of column b at the last step."""
    result: int
    n_steps: int

    def elements(self) -> List[int]:
        return [self.result, self.n_steps]

    def to_bytes(self) -> bytes:
        import struct
        return struct.pack("<QQ", self.result, self.n_steps)

    @classmethod
    def from_bytes(cls, data: bytes) -> "FibPublicInputs":
        import struct
        return cls(*struct.unpack("<QQ", data))


def fib_result(n_steps: int) -> int:
    a, b = 1, 2
    for _ in range(n_steps - 1):
        a, b = (a + b) % F.P, (a + 2 * b) % F.P
    return b


def build_fib_trace(n_steps: int) -> GF:
    """GF[2, n_steps] main trace."""
    import numpy as np
    tr = np.zeros((2, n_steps), dtype=np.uint64)
    a, b = 1, 2
    for i in range(n_steps):
        tr[0, i], tr[1, i] = a, b
        a, b = (a + b) % F.P, (a + 2 * b) % F.P
    return to_gf(tr)


class FibAir(Air):
    main_width = 2
    aux_width = 1
    aux_rands = 2

    def transition_degrees(self) -> List[TransitionDegree]:
        return [TransitionDegree(1), TransitionDegree(1), TransitionDegree(2)]

    def get_assertions(self) -> List[Assertion]:
        n = self.trace_length
        return [
            Assertion(0, 0, 1),
            Assertion(1, 0, 2),
            Assertion(1, n - 1, self.pub_inputs.result),
            Assertion(2, 0, 1, is_aux=True),
        ]

    def evaluate_transitions(self, main_cur: GF, main_nxt: GF,
                             aux_cur: Optional[GF], aux_nxt: Optional[GF],
                             aux_rand: Sequence[int]) -> List[GF]:
        import jax.numpy as jnp
        a, b = main_cur[0], main_cur[1]
        an, bn = main_nxt[0], main_nxt[1]
        c0 = sub(an, add(a, b))
        c1 = sub(bn, add(a, mul_scalar(b, 2)))
        p, pn = aux_cur[0], aux_nxt[0]

        def rand_term(r, shape):
            # rand elements arrive as host ints (prover/verifier path) or as
            # traced GF scalars (fused sharded path)
            if isinstance(r, GF):
                return GF(jnp.broadcast_to(r.lo, shape),
                          jnp.broadcast_to(r.hi, shape))
            return gf_full(shape, r)

        r0 = rand_term(aux_rand[0], a.shape)
        r1 = rand_term(aux_rand[1], a.shape)
        mix = add(r0, add(a, mul(b, r1)))
        c2 = sub(pn, mul(p, mix))
        return [c0, c1, c2]

    def build_aux_trace(self, main_trace: GF, aux_rand: Sequence[int]) -> GF:
        import numpy as np
        from ..field import from_gf
        main = from_gf(main_trace)
        n = main.shape[1]
        p = np.zeros((1, n), dtype=np.uint64)
        acc = 1
        r0, r1 = aux_rand
        for i in range(n):
            p[0, i] = acc
            acc = acc * ((r0 + int(main[0, i]) + r1 * int(main[1, i])) % F.P) % F.P
        return to_gf(p)
