"""Unit tests for Goldilocks base/extension field kernels.

Oracle: pure-python big-int arithmetic mod p (and, where available, the
reference implementation's object classes)."""

import numpy as np
import pytest

from stark_brainfuck_tpu.ops import field as f
from stark_brainfuck_tpu.ops import xfield as xf

RNG = np.random.default_rng(0)


def rand_elems(n):
    return RNG.integers(0, f.P, size=n, dtype=np.uint64)


@pytest.mark.parametrize("xp_name", ["numpy", "jax"])
def test_base_ops_match_bigint(xp_name):
    if xp_name == "jax":
        import jax.numpy as xp
    else:
        xp = np
    a = rand_elems(257)
    b = rand_elems(257)
    # include edge values
    a[:4] = [0, 1, f.P - 1, f.P - 2]
    b[:4] = [0, f.P - 1, f.P - 1, 2]
    aa, bb = xp.asarray(a), xp.asarray(b)
    got_add = np.asarray(f.add(aa, bb, xp), dtype=np.uint64)
    got_sub = np.asarray(f.sub(aa, bb, xp))
    got_mul = np.asarray(f.mul(aa, bb, xp))
    got_neg = np.asarray(f.neg(aa, xp))
    for i in range(len(a)):
        x, y = int(a[i]), int(b[i])
        assert int(got_add[i]) == (x + y) % f.P
        assert int(got_sub[i]) == (x - y) % f.P
        assert int(got_mul[i]) == (x * y) % f.P
        assert int(got_neg[i]) == (-x) % f.P


def test_base_inverse():
    a = rand_elems(64)
    a[0] = 1
    a[1] = f.P - 1
    inv = f.inverse(a, np)
    for i in range(len(a)):
        assert (int(a[i]) * int(inv[i])) % f.P == 1


def test_pow_const():
    a = rand_elems(16)
    for e in [0, 1, 2, 3, 5, 1 << 20, f.P - 2]:
        got = f.pow_const(a, e, np)
        want = pow(int(a[3]), e, f.P)
        assert int(np.asarray(got)[3]) == want


def test_roots_of_unity():
    for logn in [0, 1, 2, 5, 16, 32]:
        n = 1 << logn
        r = f.primitive_nth_root(n)
        assert pow(r, n, f.P) == 1
        if n > 1:
            assert pow(r, n // 2, f.P) != 1


def test_powers_table():
    base = 7
    tbl = f.powers(base, 1000, np)
    want = 1
    for i in range(1000):
        assert int(tbl[i]) == want
        want = want * base % f.P


@pytest.mark.parametrize("xp_name", ["numpy", "jax"])
def test_xfield_mul_matches_host(xp_name):
    if xp_name == "jax":
        import jax.numpy as xp
    else:
        xp = np
    a = rand_elems((100, 3))
    b = rand_elems((100, 3))
    got = np.asarray(xf.mul(xp.asarray(a), xp.asarray(b), xp))
    for i in range(100):
        want = xf.h_mul(tuple(map(int, a[i])), tuple(map(int, b[i])))
        assert tuple(map(int, got[i])) == want


def test_xfield_h_mul_associative_and_modulus():
    # X * X * X == X - 1  (modulus X^3 - X + 1 => X^3 = X - 1)
    X = (0, 1, 0)
    x3 = xf.h_mul(xf.h_mul(X, X), X)
    assert x3 == ((-1) % f.P, 1, 0)


def test_xfield_inverse_roundtrip():
    a = rand_elems((50, 3))
    a[0] = [1, 0, 0]
    a[1] = [0, 1, 0]
    a[2] = [0, 0, 1]
    inv = xf.inverse(a, np)
    prod = xf.mul(a, inv, np)
    assert np.all(prod[:, 0] == 1)
    assert np.all(prod[:, 1:] == 0)
    # host scalar variant
    for i in range(5):
        hv = tuple(map(int, a[i]))
        hinv = xf.h_inverse(hv)
        assert xf.h_mul(hv, hinv) == xf.H_ONE


def test_xfield_inverse_matches_reference():
    from conftest import add_reference_to_path, reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    from extension_field import ExtensionField
    from univariate import Polynomial
    from algebra import BaseFieldElement, BaseField

    ref_x = ExtensionField.main()
    bf = BaseField.main()
    vals = rand_elems((10, 3))
    for row in vals:
        poly = Polynomial([BaseFieldElement(int(c), bf) for c in row])
        ref_el = ref_x.inverse(type(ref_x.zero())(poly, ref_x))
        coeffs = [c.value for c in ref_el.polynomial.coefficients]
        coeffs += [0] * (3 - len(coeffs))
        assert tuple(coeffs) == xf.h_inverse(tuple(map(int, row)))


def test_sample_bytes():
    assert f.sample_bytes(b"\x00" * 24) == 0
    acc = 0
    data = bytes(range(24))
    for b in data:
        acc = (acc << 8) ^ b
    assert f.sample_bytes(data) == acc % f.P
