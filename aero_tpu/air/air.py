"""AIR (algebraic intermediate representation) abstraction.

Winterfell-0.4-compatible semantics (the reference's AIRs are ProcessorAir in
the forked miden crate and the hardcoded instance at
src/stark_verifier/air/air_instance.cairo:95-111):

- transition constraints hold on every step except the last; divisor
  Zt(x) = (x^n - 1) / (x - g^{n-1});
- boundary assertions pin single (column, step) cells; divisor (x - g^step);
- each constraint is degree-adjusted to the composition degree with a
  random pair: (alpha_i + beta_i * x^adj_i) * C_i(x) / divisor_i(x);
- the composition polynomial is split into `ce_blowup` columns col_i of
  degree < n with C(x) = sum_i x^i * col_i(x^ce_blowup).

Constraint evaluators are written as **vectorized device functions** over the
whole evaluation domain at once (GF arrays), the TPU-native analog of the
reference's per-fragment workers (constraints_worker.rs:56-70).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

from ..spec import field as F
from ..spec.proof import TraceLayout, ProofOptions, Context
from ..field import GF


@dataclass(frozen=True)
class Assertion:
    column: int      # absolute column index (main: 0..main_w; aux: offset by main_w)
    step: int        # trace step the assertion pins
    value: int       # asserted field value
    is_aux: bool = False


@dataclass(frozen=True)
class TransitionDegree:
    base: int = 1    # algebraic degree in the trace columns


class Air:
    """Base class. Subclasses define layout, constraints and assertions."""

    main_width: int
    aux_width: int = 0
    aux_rands: int = 0
    options: ProofOptions

    def __init__(self, trace_length: int, pub_inputs, options: ProofOptions):
        self.trace_length = trace_length
        self.pub_inputs = pub_inputs
        self.options = options

    # ---- layout / context ----

    @property
    def layout(self) -> TraceLayout:
        if self.aux_width:
            return TraceLayout(self.main_width, [self.aux_width], [self.aux_rands])
        return TraceLayout(self.main_width, [], [])

    @property
    def lde_domain_size(self) -> int:
        return self.trace_length * self.options.blowup_factor

    @property
    def ce_blowup(self) -> int:
        """Number of composition-poly columns (= constraint domain blowup)."""
        max_deg = max([d.base for d in self.transition_degrees()] + [1])
        ce = 1
        while ce < max_deg:
            ce *= 2
        return max(2, ce)

    @property
    def trace_generator(self) -> int:
        return F.get_root_of_unity(self.trace_length.bit_length() - 1)

    @property
    def lde_generator(self) -> int:
        return F.get_root_of_unity(self.lde_domain_size.bit_length() - 1)

    def context(self) -> Context:
        return Context(
            layout=self.layout,
            log_trace_length=self.trace_length.bit_length() - 1,
            meta=b"",
            field_modulus_bytes=F.P.to_bytes(8, "little"),
            options=self.options,
        )

    # ---- to be provided by subclasses ----

    def transition_degrees(self) -> List[TransitionDegree]:
        """Degrees of all transition constraints (main then aux)."""
        raise NotImplementedError

    @property
    def num_transition_constraints(self) -> int:
        return len(self.transition_degrees())

    def get_assertions(self) -> List[Assertion]:
        """All boundary assertions (main then aux)."""
        raise NotImplementedError

    @property
    def num_assertions(self) -> int:
        return len(self.get_assertions())

    def evaluate_transitions(self, main_cur: GF, main_nxt: GF,
                             aux_cur: Optional[GF], aux_nxt: Optional[GF],
                             aux_rand: Sequence[int]) -> List[GF]:
        """Vectorized transition evaluation.

        Inputs are GF[width, m] column-major evaluations over m domain points
        (cur at x, nxt at x*g). Returns one GF[m] per transition constraint,
        ordered to match transition_degrees()."""
        raise NotImplementedError

    def build_aux_trace(self, main_trace: GF, aux_rand: Sequence[int]) -> Optional[GF]:
        """GF[main_width, n] -> GF[aux_width, n] (or None if no aux)."""
        return None

    # ---- scalar (host) evaluation used by the verifier's OOD check ----

    def evaluate_transitions_scalar(self, main_cur: Sequence[int],
                                    main_nxt: Sequence[int],
                                    aux_cur: Sequence[int],
                                    aux_nxt: Sequence[int],
                                    aux_rand: Sequence[int]) -> List[int]:
        """Single-point (OOD) evaluation wrapping the vectorized evaluator
        through 1-element GF arrays — ONE source of truth for the
        constraint semantics on both prover and verifier sides.

        Always runs on the HOST CPU backend: the ~1k tiny eager ops cost
        ~0.1 s there, while through the TPU axon relay each dispatch
        carries a ~30 ms sync floor (~60 s per verification) and jitting
        the module costs a fresh TPU compile per air instance. The
        in-process CpuDevice exists even when the default platform is
        the TPU plugin."""
        import jax
        import numpy as np
        from ..field import to_gf, from_gf

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            def col(vals):
                return to_gf(np.array([[v] for v in vals],
                                      dtype=np.uint64)) if vals else None

            outs = self.evaluate_transitions(
                col(list(main_cur)), col(list(main_nxt)),
                col(list(aux_cur)), col(list(aux_nxt)),
                [to_gf(np.uint64(int(r) % F.P)) for r in aux_rand])
            return [int(from_gf(o)[0]) for o in outs]

    # ---- degree adjustment (shared prover/verifier) ----

    def composition_degree(self) -> int:
        return self.ce_blowup * self.trace_length - 1

    def transition_adjustments(self) -> List[int]:
        n = self.trace_length
        cd = self.composition_degree()
        out = []
        for d in self.transition_degrees():
            eval_degree = d.base * (n - 1)
            quotient_degree = eval_degree - (n - 1)   # divisor degree n-1
            out.append(cd - quotient_degree)
        return out

    def boundary_adjustments(self) -> List[int]:
        n = self.trace_length
        cd = self.composition_degree()
        # (T(x) - v)/(x - p): quotient degree n-2
        return [cd - (n - 2) for _ in self.get_assertions()]

    # ---- verifier-side OOD consistency ----

    def evaluate_constraints_at(self, z, mc, mn, ac, an, aux_rand_elements,
                                cc_transition, cc_boundary, pub_inputs):
        """Combined constraint evaluation at the OOD point z, to be compared
        against sum(z^i * ood_eval_i). (The reference stubs this check:
        stark_verifier.cairo:152-159.)"""
        n = self.trace_length
        g = self.trace_generator
        aux_rand = aux_rand_elements[0] if aux_rand_elements else []
        # rand-dependent boundary assertion values (e.g. MidenAir's ROM
        # static-product boundary) read the rands off the air instance
        self._aux_rand = list(aux_rand) or None

        t_evals = self.evaluate_transitions_scalar(mc, mn, ac, an, aux_rand)
        assert len(t_evals) == self.num_transition_constraints

        # transition divisor: (z^n - 1) / (z - g^{n-1})
        zn = F.exp(z, n)
        zt = F.div(F.sub(zn, 1), F.sub(z, F.exp(g, n - 1)))
        zt_inv = F.inv(zt)

        acc = 0
        for ev, (a, b), adj in zip(t_evals, cc_transition,
                                   self.transition_adjustments()):
            k = F.add(a, F.mul(b, F.exp(z, adj)))
            acc = F.add(acc, F.mul(F.mul(k, ev), zt_inv))

        full = list(mc) + list(ac)
        for asrt, (a, b), adj in zip(self.get_assertions(), cc_boundary,
                                     self.boundary_adjustments()):
            t_z = full[asrt.column]
            ev = F.sub(t_z, asrt.value)
            div = F.sub(z, F.exp(g, asrt.step))
            k = F.add(a, F.mul(b, F.exp(z, adj)))
            acc = F.add(acc, F.mul(F.mul(k, ev), F.inv(div)))
        return acc
