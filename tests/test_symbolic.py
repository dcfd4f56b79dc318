"""Symbolic multivariate layer tests — mirrors ref test_multivariate.py's
degree-bound regressions plus evaluate/partial_evaluate/lift parity."""

import numpy as np
import pytest

from stark_brainfuck_tpu.models.symbolic import SymExpr
from stark_brainfuck_tpu.ops import xfield as xf


def test_degree_bound_skips_zero_coefficients():
    # (x0 - x0) has a stored zero-coefficient term; bound must ignore it
    v = SymExpr.variables(2)
    z = v[0] - v[0]
    assert z.is_zero()
    assert z.symbolic_degree_bound([5, 5]) == -1


def test_degree_bound_sum_of_exponents():
    v = SymExpr.variables(3)
    p = v[0] * v[0] * v[1] + v[2]
    # exponents (2,1,0) -> 3*md; (0,0,1) -> md
    assert p.symbolic_degree_bound([4, 4, 4]) == 12


def test_degree_bound_cancellation():
    v = SymExpr.variables(2)
    p = v[0] * v[1] + v[0] * v[1]
    q = p - v[0] * v[1] - v[0] * v[1]  # coefficients cancel to zero
    assert q.symbolic_degree_bound([7, 7]) == -1


def test_evaluate_matches_reference_semantics():
    v = SymExpr.variables(2)
    p = v[0] * v[0] + SymExpr.constant(3) * v[1] + SymExpr.constant(5)
    x = xf.h_from_base(11)
    y = xf.h_from_base(2)
    got = p.evaluate([x, y])
    assert got == xf.h_from_base(11 * 11 + 3 * 2 + 5)


def test_partial_evaluate():
    v = SymExpr.variables(2)
    p = v[0] * v[1] + v[1]
    q = p.partial_evaluate({0: xf.h_from_base(7)})
    # q(y) = 7y + y = 8y
    got = q.evaluate([xf.h_from_base(0), xf.h_from_base(3)])
    assert got == xf.h_from_base(24)


def test_evaluate_symbolic_composition():
    v = SymExpr.variables(1)
    p = v[0] * v[0] + SymExpr.constant(1)  # f(g) = g^2 + 1
    g = [xf.h_from_base(1), xf.h_from_base(2)]  # g(x) = 1 + 2x
    out = p.evaluate_symbolic([g])
    # (1+2x)^2 + 1 = 2 + 4x + 4x^2
    assert out == [xf.h_from_base(2), xf.h_from_base(4), xf.h_from_base(4)]


def test_lift():
    coeffs = [xf.h_from_base(3), xf.h_from_base(1)]  # 3 + x
    m = SymExpr.lift(coeffs, 2)  # in variable x2
    got = m.evaluate([xf.H_ZERO, xf.H_ZERO, xf.h_from_base(4)])
    assert got == xf.h_from_base(7)
