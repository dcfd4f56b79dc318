"""Limb-representation and MXU-form NTT oracles (numpy backend; the int8
matmuls are exact int32 dots, identical math to the TPU lowering)."""

import numpy as np
import pytest

from stark_brainfuck_tpu.ops import field as f
from stark_brainfuck_tpu.ops import limb as L
from stark_brainfuck_tpu.ops import mxu_ntt as M
from stark_brainfuck_tpu.ops import ntt as nt

RNG = np.random.default_rng(42)


def rand_field(shape):
    return RNG.integers(0, f.P, size=shape, dtype=np.uint64)


def test_limb_roundtrip():
    x = rand_field((1 << 12,))
    # include boundary values
    x[:4] = [0, 1, f.P - 1, (1 << 64) - (1 << 32)]
    limbs = L.limbify(x)
    assert limbs.dtype == np.int8
    back = np.array([L.h_from_limbs(limbs[i]) for i in range(16)])
    np.testing.assert_array_equal(back, x[:16] % f.P)
    # vectorized plane path
    planes = L.u64_to_limb_planes(x, np)
    for i in range(9):
        np.testing.assert_array_equal(planes[i], limbs[..., i].astype(np.int32))
    y = L.limbs_to_u64(planes, np)
    np.testing.assert_array_equal(y, x)


def test_renorm_diagonals_bounds_and_value():
    # adversarial diagonals at the documented magnitude bound
    n = 4096
    c = RNG.integers(-(1 << 24) - (1 << 23), (1 << 24) + (1 << 23),
                     size=(L.DIAGS, n)).astype(np.int32)
    out = L.renorm_diagonals([c[u] for u in range(L.DIAGS)], np)
    assert all(np.all((o >= -128) & (o <= 127)) for o in out)
    # value check vs python bigints on a sample
    for i in range(64):
        want = sum(int(c[u, i]) << (8 * u) for u in range(L.DIAGS)) % f.P
        got = sum(int(out[j][i]) << (8 * j) for j in range(9)) % f.P
        assert got == want


def test_mul_conv_limbs_matches_field_mul():
    a = rand_field((2048,))
    b = rand_field((2048,))
    al = L.u64_to_limb_planes(a, np)
    bl = L.u64_to_limb_planes(b, np)
    out = L.mul_conv_limbs(al, bl, np)
    got = L.limbs_to_u64([o.astype(np.int32) for o in out], np)
    np.testing.assert_array_equal(got, f.mul(a, b, np))


@pytest.mark.parametrize("logn", [7, 8, 10, 13, 14])
def test_ntt_mxu_matches_u64_ntt(logn):
    n = 1 << logn
    root = f.primitive_nth_root(n)
    v = rand_field((3, n))
    plan = M.make_plan(n, root, False, np)
    got = M.ntt_mxu(v, plan, np)
    want = nt.ntt(v, root, np)
    np.testing.assert_array_equal(got, want)


def test_intt_mxu_roundtrip():
    n = 1 << 10
    root = f.primitive_nth_root(n)
    v = rand_field((2, n))
    fwd = M.make_plan(n, root, False, np)
    inv = M.make_plan(n, root, True, np)
    np.testing.assert_array_equal(M.ntt_mxu(M.ntt_mxu(v, fwd, np), inv, np), v)


def test_dft_rhs_band_structure():
    rhs = L.dft_rhs(4, f.h_pow(f.GENERATOR, (f.P - 1) // 4))
    # out-of-band entries are zero: u < s or u > s + 8
    for s in range(9):
        for u in range(17):
            if not (0 <= u - s < 9):
                assert not rhs[s::9, u::17].any()
