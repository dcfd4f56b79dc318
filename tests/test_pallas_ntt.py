"""Plane-major kernel math of ops/pallas_ntt.py on the numpy backend
(the exact computation the TPU kernels run, minus Mosaic lowering; the
compiled path is asserted bit-identical to ntt_with on hardware by
scripts/ and the prover bench)."""

import numpy as np
import pytest

from stark_brainfuck_tpu.ops import field as f
from stark_brainfuck_tpu.ops import limb as L
from stark_brainfuck_tpu.ops import ntt as nt
from stark_brainfuck_tpu.ops import pallas_ntt as PN

RNG = np.random.default_rng(7)


def _sub_plan_np(m, root):
    return PN._make_sub_plan(m, root, np)


def _run_sub_np(v, plan):
    """v: (B, m) u64 -> (B, m) u64 through the plane-major sub-NTT math."""
    B, m = v.shape
    planes = [p.astype(np.int8) for p in L.u64_to_limb_planes(v, np)]
    if plan.levels:
        (lp,) = plan.levels
        r1, r2 = lp.r1, lp.r2
        x = [
            np.ascontiguousarray(
                np.swapaxes(p.reshape(B, r1, r2), 1, 2)
            )
            for p in planes
        ]
    else:
        x = [p.reshape(B, 1, m) for p in planes]
    out = PN._subntt_planes(x, plan, np)
    out_planes = [o.reshape(B, m).astype(np.int32) for o in out]
    return L.limbs_to_u64(out_planes, np)


@pytest.mark.parametrize("logm", [5, 7, 10, 13])
def test_subntt_planes_matches_ntt(logm):
    m = 1 << logm
    root = f.primitive_nth_root(m)
    v = RNG.integers(0, f.P, size=(3, m), dtype=np.uint64)
    plan = _sub_plan_np(m, root)
    got = _run_sub_np(v, plan)
    np.testing.assert_array_equal(got, nt.ntt(v, root, np))


def test_rhs_padded_band_zero():
    rhs = PN._rhs_padded(64, f.primitive_nth_root(64))
    # rows beyond r in each s-block and cols beyond r in each u-block are 0
    for s in range(9):
        assert not rhs[s * 128 + 64 : (s + 1) * 128, :].any()
    for u in range(17):
        assert not rhs[:, u * 128 + 64 : (u + 1) * 128].any()


def test_outer_twiddle_factorization():
    # w^(b*c_idx) == w^(128*b_hi*c_idx) * w^(b_lo*c_idx)
    n, r = 1 << 16, 1 << 8
    c = n // r
    root = f.primitive_nth_root(n)
    hi = PN._tw_planes(c // 128, r, root, stride=128)
    lo = PN._tw_planes(128, r, root)
    for b in [0, 1, 127, 128, 255, c - 1]:
        for ci in [0, 1, r - 1]:
            want = f.h_pow(root, b * ci)
            vh = L.h_from_limbs(hi[:, b // 128, ci])
            vl = L.h_from_limbs(lo[:, b % 128, ci])
            assert f.h_mul(vh, vl) == want


@pytest.mark.parametrize("logn", [10, 14])
def test_ntt_pallas_interpret_mode(logn):
    """The REAL pallas_call plumbing (grid, BlockSpecs, index maps, and for
    n > SUB_MAX the composed two-sub-NTT + outer-twiddle pipeline) in
    interpret mode — a Mosaic-layout regression fails here on CPU instead
    of only on the TPU bench (VERDICT r2 item 7)."""
    import jax.numpy as jnp

    n = 1 << logn
    root = f.primitive_nth_root(n)
    plan = PN.make_pallas_plan(n, root, False, jnp)
    if logn > 13:
        assert plan.sub_c is not None, "case must cover the composed path"
    v = RNG.integers(0, f.P, size=(2, n), dtype=np.uint64)
    got = np.asarray(PN.ntt_pallas(jnp.asarray(v), plan, interpret=True))
    want = nt.ntt_with(v, nt.make_pack(n, root, False, np), np)
    np.testing.assert_array_equal(got, want)


def test_ntt_pallas_interpret_inverse():
    import jax.numpy as jnp

    n = 1 << 10
    root = f.primitive_nth_root(n)
    plan = PN.make_pallas_plan(n, root, True, jnp)
    v = RNG.integers(0, f.P, size=(1, n), dtype=np.uint64)
    got = np.asarray(PN.ntt_pallas(jnp.asarray(v), plan, interpret=True))
    want = nt.ntt_with(v, nt.make_pack(n, root, True, np), np)
    np.testing.assert_array_equal(got, want)


def test_outer_twiddle_call_multi_hi_rows():
    """_twiddle_outer_call with hi_rows > 1 (c > 128) — the path first
    exercised at full-NTT sizes N >= 2^21, where the per-block hi-table row
    is selected by the BlockSpec index map (an in-kernel mask/convert
    selection previously sent Mosaic's type legalizer into infinite
    recursion). Interpret mode; values checked against direct twiddling."""
    import jax.numpy as jnp

    n, r = 1 << 16, 1 << 8
    c = n // r  # 256 -> hi_rows = 2
    root = f.primitive_nth_root(n)
    plan = PN.PallasNttPlan(
        n, r, c, None, None,
        jnp.asarray(
            np.swapaxes(PN._tw_planes(c // 128, r, root, stride=128), 0, 1)
        ),
        jnp.asarray(PN._tw_planes(128, r, root)),
        None,
    )
    rows = 2 * c  # batch B=2
    v = RNG.integers(0, f.P, size=(rows, r), dtype=np.uint64)
    x = jnp.stack(
        [p.astype(jnp.int8) for p in L.u64_to_limb_planes(jnp.asarray(v), jnp)],
        axis=0,
    )
    out = PN._twiddle_outer_call(x, plan, interpret=True)
    got = np.asarray(L.limbs_to_u64(
        [np.asarray(out[s], dtype=np.int32) for s in range(9)], np
    ))
    # row g multiplies by root^((g % c) * c_idx)
    b = np.arange(rows)[:, None] % c
    ci = np.arange(r)[None, :]
    tw = np.asarray(
        [[f.h_pow(root, int(bb) * int(cc)) for cc in ci[0]] for bb in b[:, 0]],
        dtype=np.uint64,
    )
    want = f.mul(v, tw, np)
    np.testing.assert_array_equal(got, want)
