"""AIR constraint interpreters.

Each table's constraints are written ONCE as plain python functions over an
abstract algebra `A` (supporting const/one/zero) and operand objects with
`+ - *`. Two interpreters execute them:

  - `SymbolicAlgebra` — operands are `SymExpr` sparse polynomials; used at
    setup time for degree bounds (and in tiny host-side oracle checks).
  - `ArrayAlgebra` — operands wrap u64 ndarrays (base `(N,)` or extension
    `(N, 3)`); the constraint function then *is* the fused row evaluator,
    vectorized over an entire codeword — this replaces the reference's
    per-point `MPolynomial.evaluate` hot loop (`table.py:205-217`).

`ArrayAlgebra` works on both numpy (host verifier, a handful of points) and
jax.numpy (device prover, full FRI domain) backends.
"""

from __future__ import annotations

from typing import List, Union

import numpy as np

from ..ops import field as f
from ..ops import xfield as xf
from .symbolic import SymExpr


class SymbolicAlgebra:
    """Builds SymExpr operands; mirrors MPolynomial.variables/constant."""

    def __init__(self, num_variables: int):
        self.num_variables = num_variables

    def variables(self) -> List[SymExpr]:
        return SymExpr.variables(self.num_variables)

    def const(self, c) -> SymExpr:
        return SymExpr.constant(c, 1)

    def zero(self) -> SymExpr:
        return SymExpr.zero()

    def one(self) -> SymExpr:
        return SymExpr.constant(1, 1)


class AVal:
    """An array-backed field value: base ((...,)) or extension ((..., 3))."""

    __slots__ = ("arr", "ext", "alg")

    def __init__(self, arr, ext: bool, alg: "ArrayAlgebra"):
        self.arr = arr
        self.ext = ext
        self.alg = alg

    def _promote(self, other: "AVal"):
        xp = self.alg.xp
        a, b = self, other
        if a.ext == b.ext:
            return a.arr, b.arr, a.ext
        if a.ext:
            return a.arr, xf.from_base(b.arr, xp), True
        return xf.from_base(a.arr, xp), b.arr, True

    def __add__(self, other: "AVal") -> "AVal":
        xp = self.alg.xp
        a, b, ext = self._promote(other)
        return AVal(f.add(a, b, xp), ext, self.alg)

    def __sub__(self, other: "AVal") -> "AVal":
        xp = self.alg.xp
        a, b, ext = self._promote(other)
        return AVal(f.sub(a, b, xp), ext, self.alg)

    def __neg__(self) -> "AVal":
        return AVal(f.neg(self.arr, self.alg.xp), self.ext, self.alg)

    def __mul__(self, other: "AVal") -> "AVal":
        xp = self.alg.xp
        if self.ext and other.ext:
            return AVal(xf.mul(self.arr, other.arr, xp), True, self.alg)
        if self.ext != other.ext:
            e = self if self.ext else other
            b = other if self.ext else self
            return AVal(xf.mul_base(e.arr, b.arr, xp), True, self.alg)
        return AVal(f.mul(self.arr, other.arr, xp), False, self.alg)

    def __pow__(self, e: int) -> "AVal":
        xp = self.alg.xp
        if self.ext:
            return AVal(xf.pow_const(self.arr, e, xp), True, self.alg)
        return AVal(f.pow_const(self.arr, e, xp), False, self.alg)


class ArrayAlgebra:
    """Vectorized constraint evaluation over u64 arrays."""

    def __init__(self, xp=np):
        self.xp = xp

    def base(self, arr) -> AVal:
        return AVal(arr, False, self)

    def x(self, arr) -> AVal:
        return AVal(arr, True, self)

    def const(self, c: Union[int, tuple]) -> AVal:
        xp = self.xp
        if isinstance(c, tuple):
            return AVal(xp.asarray(c, dtype=xp.uint64), True, self)
        return AVal(xp.asarray(c % f.P, dtype=xp.uint64), False, self)

    def zero(self) -> AVal:
        return self.const(0)

    def one(self) -> AVal:
        return self.const(1)

    @staticmethod
    def to_ext(v: AVal):
        """Return the (..., 3) extension array of a value."""
        if v.ext:
            return v.arr
        return xf.from_base(v.arr, v.alg.xp)
