"""Abstract AIR trace table.

TPU-first redesign of the reference `Table` (`table.py:8-341`):

  - the trace matrix is a numpy/JAX u64 column tensor, not a list of
    field-element objects;
  - AIR constraints are single-source builder methods over an abstract
    algebra (see `interp.py`): instantiated symbolically for degree bounds
    and as fused vectorized evaluators for codeword-wide quotient
    computation;
  - the randomized LDE runs as subgroup INTT + blinding + coset NTT
    (see `ops/ntt.lde_columns`), replacing per-column recursive
    interpolation (`table.py:112-136`);
  - quotient evaluation is a whole-codeword map: constraint evaluator ×
    precomputed zerofier-inverse tensors (`table.py:155-292` did this
    pointwise per domain index with symbolic polynomials).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..ops import field as f
from ..ops import ntt as nt
from ..ops import xfield as xf
from .interp import ArrayAlgebra, AVal, SymbolicAlgebra
from .symbolic import SymExpr

U64 = np.uint64


def roundup_npo2(n: int) -> int:
    """Next power of two; 0 stays 0 (ref table.py:22-28)."""
    if n == 0:
        return 0
    if n == 1:
        return 1
    return 1 << (n - 1).bit_length()


def derive_omicron(height: int) -> int:
    """Generator of the order-`height` subgroup; 1 for heights 0/1 (matches
    ref table.py:30-35, where squaring past order 1 also lands on 1)."""
    if height <= 1:
        return 1
    return f.primitive_nth_root(height)


class Table:
    name: str = "table"
    base_width: int = 0
    full_width: int = 0

    def __init__(self, length: int, num_randomizers: int):
        self.length = length
        self.num_randomizers = num_randomizers
        self.height = roundup_npo2(length)
        self.omicron = derive_omicron(self.height)
        self.matrix: Optional[np.ndarray] = None  # (rows, base_width) u64
        self.xcolumns = None  # (height, n_ext, 3) after extend

    # -- geometry -----------------------------------------------------------

    @property
    def num_ext_columns(self) -> int:
        return self.full_width - self.base_width

    def unit_distance(self, omega_order: int) -> int:
        return 0 if self.height == 0 else omega_order // self.height

    def interpolation_domain_length(self) -> int:
        return self.height + self.num_randomizers

    def interpolant_degree(self) -> int:
        return self.interpolation_domain_length() - 1

    # -- constraint builders (override in subclasses) -----------------------
    # v: operand list; A: algebra; challenges/terminals: operand lists

    def base_transition_constraints(self, A, v) -> List:
        raise NotImplementedError

    def base_boundary_constraints(self, A, v) -> List:
        raise NotImplementedError

    def transition_constraints_ext(self, A, v, challenges) -> List:
        raise NotImplementedError

    def boundary_constraints_ext(self, A, v, challenges) -> List:
        raise NotImplementedError

    def terminal_constraints_ext(self, A, v, challenges, terminals) -> List:
        raise NotImplementedError

    def pad(self):
        raise NotImplementedError

    terminal_names: tuple = ()

    def extend_pure(self, matrix, challenges, initials, xp):
        """Pure/jittable extension-column computation.

        matrix: (H, base_width) u64; challenges: (11, 3); initials: (2, 3).
        Returns ((H, n_ext, 3) columns, (n_terminals, 3) terminals)."""
        raise NotImplementedError

    def extend(self, challenges, initials, xp):
        """Convenience wrapper: runs extend_pure, stores xcolumns, and
        converts terminals to host tuples keyed by terminal_names."""
        ch = xp.asarray(np.asarray(challenges, dtype=U64))
        ini = xp.asarray(np.asarray(initials, dtype=U64))
        cols, terms = self.extend_pure(xp.asarray(self.matrix), ch, ini, xp)
        self.xcolumns = cols
        terms = np.asarray(terms)
        self.terminals = {
            n: tuple(int(v) for v in terms[i])
            for i, n in enumerate(self.terminal_names)
        }
        return self.xcolumns

    # -- symbolic instantiation --------------------------------------------

    def _sym(self, n_vars: int, challenges_h, terminals_h=None, kind="transition"):
        A = SymbolicAlgebra(n_vars)
        v = SymExpr.variables(n_vars)
        ch = [SymExpr.constant(c) for c in challenges_h]
        if kind == "transition":
            return self.transition_constraints_ext(A, v, ch)
        if kind == "boundary":
            return self.boundary_constraints_ext(A, v, ch)
        tm = [SymExpr.constant(t) for t in terminals_h]
        return self.terminal_constraints_ext(A, v, ch, tm)

    def symbolic_transition_constraints(self, challenges_h) -> List[SymExpr]:
        return self._sym(2 * self.full_width, challenges_h, kind="transition")

    def symbolic_boundary_constraints(self, challenges_h) -> List[SymExpr]:
        return self._sym(self.full_width, challenges_h, kind="boundary")

    def symbolic_terminal_constraints(self, challenges_h, terminals_h) -> List[SymExpr]:
        return self._sym(self.full_width, challenges_h, terminals_h, kind="terminal")

    # -- degree bounds (ref table.py:180-184, 238-247, 288-292) ------------

    def boundary_quotient_degree_bounds(self, challenges_h) -> List[int]:
        d = [self.interpolant_degree()] * self.full_width
        return [
            c.symbolic_degree_bound(d) - 1
            for c in self.symbolic_boundary_constraints(challenges_h)
        ]

    def transition_quotient_degree_bounds(self, challenges_h) -> List[int]:
        d = [self.interpolant_degree()] * (2 * self.full_width)
        return [
            c.symbolic_degree_bound(d) - self.height + 1
            for c in self.symbolic_transition_constraints(challenges_h)
        ]

    def terminal_quotient_degree_bounds(self, challenges_h, terminals_h) -> List[int]:
        d = [self.interpolant_degree()] * self.full_width
        return [
            c.symbolic_degree_bound(d) - 1
            for c in self.symbolic_terminal_constraints(challenges_h, terminals_h)
        ]

    def all_quotient_degree_bounds(self, challenges_h, terminals_h) -> List[int]:
        return (
            self.boundary_quotient_degree_bounds(challenges_h)
            + self.transition_quotient_degree_bounds(challenges_h)
            + self.terminal_quotient_degree_bounds(challenges_h, terminals_h)
        )

    def num_quotients(self, challenges_h, terminals_h) -> int:
        return len(self.all_quotient_degree_bounds(challenges_h, terminals_h))

    # -- trace self-tests (ref table.py:48-110) ----------------------------

    def test(self):
        """Assert every base AIR constraint vanishes on the recorded trace."""
        if self.matrix is None or len(self.matrix) == 0:
            return
        rows = [
            [xf.h_from_base(int(v)) for v in row] for row in np.asarray(self.matrix)
        ]
        w = self.base_width
        A = SymbolicAlgebra(w)
        for i, c in enumerate(self.base_boundary_constraints(A, SymExpr.variables(w))):
            val = c.evaluate(rows[0])
            assert val == xf.H_ZERO, f"{self.name}: boundary constraint {i} != 0"
        A2 = SymbolicAlgebra(2 * w)
        constraints = self.base_transition_constraints(A2, SymExpr.variables(2 * w))
        for r in range(len(rows) - 1):
            point = rows[r] + rows[r + 1]
            for i, c in enumerate(constraints):
                assert c.evaluate(point) == xf.H_ZERO, (
                    f"{self.name}: transition constraint {i} failed at row {r}"
                )

    def xtest(self, challenges_h, terminals_h):
        """Assert extension AIR constraints vanish on the extended trace."""
        if self.matrix is None or self.height == 0:
            return
        base = np.asarray(self.matrix)
        ext = np.asarray(self.xcolumns)
        rows = []
        for r in range(self.height):
            row = [xf.h_from_base(int(v)) for v in base[r]]
            row += [tuple(int(c) for c in ext[r, j]) for j in range(ext.shape[1])]
            rows.append(row)
        for i, c in enumerate(self.symbolic_boundary_constraints(challenges_h)):
            assert c.evaluate(rows[0]) == xf.H_ZERO, (
                f"{self.name}: ext boundary constraint {i} != 0"
            )
        constraints = self.symbolic_transition_constraints(challenges_h)
        for r in range(self.height - 1):
            point = rows[r] + rows[r + 1]
            for i, c in enumerate(constraints):
                assert c.evaluate(point) == xf.H_ZERO, (
                    f"{self.name}: ext transition constraint {i} failed at row {r}"
                )
        for i, c in enumerate(
            self.symbolic_terminal_constraints(challenges_h, terminals_h)
        ):
            assert c.evaluate(rows[-1]) == xf.H_ZERO, (
                f"{self.name}: ext terminal constraint {i} != 0"
            )

    # -- LDE ----------------------------------------------------------------

    def base_codewords(
        self, matrix, intt_pack, scale, fwd_pack, fri_length, randomizers, xp
    ):
        """(base_width, fri_length) codewords of the randomized LDE.
        Pure/jittable given the (H, W) matrix array and precomputed
        twiddle packs (see ops/ntt.TwiddlePack)."""
        if self.height == 0:
            return xp.zeros((self.base_width, fri_length), dtype=xp.uint64)
        trace = matrix.T  # (W, H)
        return nt.lde_columns_with(
            trace, randomizers, intt_pack, scale, fwd_pack, fri_length, xp
        )

    def ext_codewords(
        self, xcolumns, intt_pack, scale, fwd_pack, fri_length, randomizers, xp
    ):
        """(n_ext, fri_length, 3) codewords of the extension columns.
        Pure/jittable given the (H, n_ext, 3) column array."""
        if self.height == 0:
            return xp.zeros(
                (self.num_ext_columns, fri_length, 3), dtype=xp.uint64
            )
        trace = xp.moveaxis(xcolumns, 0, 1)  # (n_ext, H, 3)
        return nt.lde_xcolumns_with(
            trace, randomizers, intt_pack, scale, fwd_pack, fri_length, xp
        )

    # -- quotient evaluation (device or host; alg picks the backend) --------

    def quotients(
        self,
        alg: ArrayAlgebra,
        point: List[AVal],
        point_next: List[AVal],
        challenges: List[AVal],
        terminals: List[AVal],
        zerofier_inv: Dict[str, object],
    ) -> List:
        """All quotient codewords for this table, in reference order
        boundary → transition → terminal (ref table.py:294-301).

        point/point_next: full_width operand lists over the evaluation
        domain; zerofier_inv: base-field arrays {'boundary', 'transition',
        'terminal'} (transition is all-zero when height == 0, reproducing
        ref table.py:196-199)."""
        xp = alg.xp
        out = []
        for c in self.boundary_constraints_ext(alg, point, challenges):
            out.append(
                xf.mul_base(ArrayAlgebra.to_ext(c), zerofier_inv["boundary"], xp)
            )
        for c in self.transition_constraints_ext(
            alg, point + point_next, challenges
        ):
            out.append(
                xf.mul_base(ArrayAlgebra.to_ext(c), zerofier_inv["transition"], xp)
            )
        for c in self.terminal_constraints_ext(alg, point, challenges, terminals):
            out.append(
                xf.mul_base(ArrayAlgebra.to_ext(c), zerofier_inv["terminal"], xp)
            )
        return out
