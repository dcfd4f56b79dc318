"""Generic fast polynomial algorithms vs the reference's ntt.py oracle
(and the scalar poly.py fallbacks when the reference isn't mounted)."""

import numpy as np
import pytest

from stark_brainfuck_tpu.ops import fastpoly as fp
from stark_brainfuck_tpu.ops import field as f
from stark_brainfuck_tpu.ops import poly as hp

from conftest import add_reference_to_path, reference_available

RNG = np.random.default_rng(5)


def rand_coeffs(n):
    return RNG.integers(0, f.P, size=(n,), dtype=np.uint64)


def rand_points(n):
    # distinct points
    out = []
    seen = set()
    while len(out) < n:
        v = int(RNG.integers(0, f.P, dtype=np.uint64))
        if v not in seen:
            seen.add(v)
            out.append(v)
    return np.asarray(out, dtype=np.uint64)


@pytest.mark.parametrize("la,lb", [(5, 3), (16, 16), (33, 20), (1, 7)])
def test_fast_multiply_matches_schoolbook(la, lb):
    a, b = rand_coeffs(la), rand_coeffs(lb)
    got = fp.fast_multiply(a, b, np)
    want = hp.mul([int(v) for v in a], [int(v) for v in b])
    assert [int(v) for v in got] == [v % f.P for v in want]


@pytest.mark.parametrize("n", [1, 2, 3, 7, 8, 13, 32])
def test_fast_zerofier(n):
    pts = rand_points(n)
    got = [int(v) for v in fp.fast_zerofier(pts, np)]
    want = hp.zerofier([int(v) for v in pts])
    assert got == want


@pytest.mark.parametrize("deg,npts", [(7, 5), (20, 33), (0, 4), (15, 16)])
def test_fast_evaluate(deg, npts):
    coeffs = rand_coeffs(deg + 1)
    pts = rand_points(npts)
    got = fp.fast_evaluate(coeffs, pts, np)
    want = [hp.evaluate([int(v) for v in coeffs], int(x)) for x in pts]
    assert [int(v) for v in got] == want


@pytest.mark.parametrize("n", [2, 3, 8, 21])
def test_fast_interpolate(n):
    pts = rand_points(n)
    vals = rand_coeffs(n)
    got = fp.fast_interpolate(pts, vals, np)
    # interpolant hits every point
    back = fp.fast_evaluate(got, pts, np)
    assert np.array_equal(back, vals)
    # and has degree < n
    assert got.shape[0] == n
    want = hp.interpolate([int(v) for v in pts], [int(v) for v in vals])
    want = want + [0] * (n - len(want))
    assert [int(v) for v in got] == [v % f.P for v in want]


@pytest.mark.parametrize("qdeg,bdeg", [(5, 3), (12, 1), (20, 20)])
def test_fast_coset_divide_exact(qdeg, bdeg):
    q = rand_coeffs(qdeg + 1)
    b = rand_coeffs(bdeg + 1)
    b[-1] = 1  # monic, nonzero
    a = fp.fast_multiply(q, b, np)
    got = fp.fast_coset_divide(
        a, b, f.GENERATOR, f.primitive_nth_root(64), 64, np
    )
    assert np.array_equal(got[: qdeg + 1], q)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_against_reference_oracle():
    add_reference_to_path()
    from algebra import BaseField
    from ntt import (
        fast_evaluate as ref_eval,
        fast_interpolate as ref_interp,
        fast_zerofier as ref_zerofier,
    )

    field = BaseField.main()
    n = 16
    root_order = 32
    root = field.primitive_nth_root(root_order)
    pts = rand_points(n)
    vals = rand_coeffs(n)
    ref_pts = [field(int(v)) for v in pts]
    ref_vals = [field(int(v)) for v in vals]
    z_ref = ref_zerofier(ref_pts, root, root_order)
    z = fp.fast_zerofier(pts, np)
    assert [c.value for c in z_ref.coefficients] == [int(v) for v in z]

    f_ref = ref_interp(ref_pts, ref_vals, root, root_order)
    ours = fp.fast_interpolate(pts, vals, np)
    ref_c = [c.value for c in f_ref.coefficients]
    ref_c += [0] * (n - len(ref_c))
    assert ref_c == [int(v) for v in ours]

    coeffs = rand_coeffs(12)
    from univariate import Polynomial

    poly_ref = Polynomial([field(int(v)) for v in coeffs])
    vals_ref = ref_eval(poly_ref, ref_pts, root, root_order)
    ours_vals = fp.fast_evaluate(coeffs, pts, np)
    assert [v.value for v in vals_ref] == [int(v) for v in ours_vals]
