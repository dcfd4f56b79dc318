"""NTT/INTT/LDE tests mirroring the reference's test_ntt.py strategy:
NTT vs naive evaluation, roundtrips, coset evaluation, randomized LDE."""

import numpy as np
import pytest

from stark_brainfuck_tpu.ops import field as f
from stark_brainfuck_tpu.ops import ntt as nt

RNG = np.random.default_rng(1)


def rand_elems(shape):
    return RNG.integers(0, f.P, size=shape, dtype=np.uint64)


def naive_dft(values, root):
    n = len(values)
    out = []
    for k in range(n):
        acc = 0
        for j in range(n):
            acc = (acc + int(values[j]) * pow(root, j * k, f.P)) % f.P
        out.append(acc)
    return out


@pytest.mark.parametrize("n", [1, 2, 4, 32, 128])
def test_ntt_matches_naive(n):
    root = f.primitive_nth_root(n)
    v = rand_elems(n)
    got = nt.ntt(v, root, np)
    assert [int(x) for x in got] == naive_dft(v, root)


@pytest.mark.parametrize("xp_name", ["numpy", "jax"])
def test_intt_roundtrip(xp_name):
    if xp_name == "jax":
        import jax.numpy as xp
    else:
        xp = np
    n = 256
    root = f.primitive_nth_root(n)
    v = rand_elems((5, n))
    vv = xp.asarray(v)
    back = np.asarray(nt.intt(nt.ntt(vv, root, xp), root, xp))
    assert np.array_equal(back, v)


def test_coset_evaluate_matches_naive():
    n, d = 64, 20
    root = f.primitive_nth_root(n)
    offset = f.GENERATOR
    coeffs = rand_elems(d)
    got = nt.coset_evaluate(coeffs, offset, root, n, np)
    for i in range(n):
        x = offset * pow(root, i, f.P) % f.P
        want = 0
        for j in reversed(range(d)):
            want = (want * x + int(coeffs[j])) % f.P
        assert int(got[i]) == want


def test_coset_interpolate_roundtrip():
    n = 128
    root = f.primitive_nth_root(n)
    v = rand_elems((3, n))
    coeffs = nt.coset_interpolate(v, f.GENERATOR, root, np)
    back = nt.coset_evaluate(coeffs, f.GENERATOR, root, n, np)
    assert np.array_equal(back, v)


def test_lde_agrees_on_trace_domain():
    """The randomized LDE must restrict to the trace on the omicron domain
    and have degree <= H + R - 1."""
    H, R, expansion = 16, 1, 4
    W = 3
    fri_len = (H + R).bit_length()  # placeholder, real computation below
    fri_len = 1 << ((H + R - 1).bit_length() + 2)  # comfortably larger
    omicron = f.primitive_nth_root(H)
    fri_root = f.primitive_nth_root(fri_len)
    trace = rand_elems((W, H))
    randos = rand_elems((W, R))
    cw = nt.lde_columns(trace, randos, omicron, f.GENERATOR, fri_root, fri_len, np)
    # interpolate codeword back to coefficients; degree must be < H+R
    coeffs = nt.coset_interpolate(cw, f.GENERATOR, fri_root, np)
    assert np.all(coeffs[:, H + R :] == 0)
    assert np.any(coeffs[:, H:] != 0)  # randomizer actually present
    # evaluate at omicron^i and compare to trace
    for w in range(W):
        for i in range(0, H, 5):
            x = pow(omicron, i, f.P)
            val = 0
            for j in reversed(range(H + R)):
                val = (val * x + int(coeffs[w, j])) % f.P
            assert val == int(trace[w, i])


def test_lde_no_randomizers():
    H = 8
    omicron = f.primitive_nth_root(H)
    fri_len = 32
    fri_root = f.primitive_nth_root(fri_len)
    trace = rand_elems((2, H))
    cw = nt.lde_columns(trace, None, omicron, f.GENERATOR, fri_root, fri_len, np)
    coeffs = nt.coset_interpolate(cw, f.GENERATOR, fri_root, np)
    assert np.all(coeffs[:, H:] == 0)


def test_ntt_matches_reference_impl():
    from conftest import add_reference_to_path, reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    from algebra import BaseField, BaseFieldElement
    from ntt import ntt as ref_ntt

    bf = BaseField.main()
    n = 64
    root_int = f.primitive_nth_root(n)
    root = BaseFieldElement(root_int, bf)
    v = rand_elems(n)
    ref_out = ref_ntt(root, [BaseFieldElement(int(x), bf) for x in v])
    got = nt.ntt(v, root_int, np)
    assert [int(x) for x in got] == [e.value for e in ref_out]
