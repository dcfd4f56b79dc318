"""Pallas TPU execution of the MXU-form NTT (math in ops/limb.py; numpy
oracle in ops/mxu_ntt.py).

Layout: limb-PLANE-major. A batch of field elements is a (9, rows, m)
int8 array — plane s holds balanced byte-limb s of every element. All
in-kernel limb indexing is then a static leading-axis slice (Mosaic has
no general gather; a trailing limb axis of width 9 cannot be indexed on
the lane dimension), and every VPU op runs on full (rows, m) tiles.

DFT matmuls use 128-padded blocks: LHS (M, 9*128) = 9 lane-concatenated
limb planes (zero-padded beyond radix r), RHS (9*128, 17*128) with
RHS[(s*128+j), (u*128+k)] = limb_{u-s}(root^(jk)); output diagonal u is
the 128-aligned lane slice acc[:, 128u : 128u+r] — no gathers anywhere.

Kernels:
  - `_subntt_call`: full (<= 2^13)-point NTT per row block in VMEM
    (radix-128/64 levels + twiddle convolutions, MXU matmuls).
  - `_twiddle_outer_call`: elementwise w_N^(b*c_idx) limb convolution
    between the two sub-transforms of N = r*c, with the (c, r) table
    factored as w^(128*b_hi*c_idx) * w^(b_lo*c_idx).

`make_pallas_plan` + `ntt_pallas` compose them into full N-point
forward/inverse transforms (N <= 2^26), bit-identical to ntt.ntt_with.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from . import field as f
from . import limb as L

SUB_MAX = 1 << 13  # largest in-VMEM sub-transform
_Z = np.int32(0)


class SubLevel(NamedTuple):
    r1: int
    r2: int
    rhs: object  # (9*128, 17*128) int8, padded
    tw: object  # (9, r2, r1) int8 plane-major


class SubPlan(NamedTuple):
    m: int
    levels: Tuple[SubLevel, ...]
    base_r: int
    base_rhs: object  # (9*128, 17*128) int8, padded


class PallasNttPlan(NamedTuple):
    n: int
    r: int  # n = r * c; c == 1 for single-kernel sizes
    c: int
    sub_r: SubPlan
    sub_c: Optional[SubPlan]
    tw_hi: object  # (c//128, 9, r) int8 — hi-row-major so the
    #     per-block row is selectable by a leading-dim BlockSpec index
    tw_lo: object  # (9, 128, r) int8
    n_inv: Optional[int]


def _rhs_padded(r: int, root: int) -> np.ndarray:
    """128-padded limb DFT matrix (see module docstring)."""
    assert r <= 128
    idx = (np.arange(r)[:, None] * np.arange(r)[None, :]) % r
    Wl = L.limbify(f.powers(root, r, np)[idx])  # (j, k, 9)
    rhs = np.zeros((9 * 128, 17 * 128), dtype=np.int8)
    for s in range(9):
        for t in range(9):
            u = s + t
            rhs[s * 128 : s * 128 + r, u * 128 : u * 128 + r] = Wl[:, :, t]
    return rhs


def _tw_planes(rows: int, cols: int, root: int, stride: int = 1):
    t = L.twiddle_limbs(rows, cols, root, stride)  # (rows, cols, 9)
    return np.ascontiguousarray(np.moveaxis(t, -1, 0))  # (9, rows, cols)


def _make_sub_plan(m: int, root: int, xp) -> SubPlan:
    levels = []
    mm, w = m, root
    while mm > 128:
        r1 = 128
        r2 = mm // r1
        assert r2 <= 128, "sub-plan must fit two levels"
        levels.append(
            SubLevel(
                r1,
                r2,
                xp.asarray(_rhs_padded(r1, f.h_pow(w, r2))),
                xp.asarray(_tw_planes(r2, r1, w)),
            )
        )
        mm, w = r2, f.h_pow(w, r1)
    base_rhs = xp.asarray(_rhs_padded(mm, w))
    return SubPlan(m, tuple(levels), mm, base_rhs)


def make_pallas_plan(
    n: int, root: int, inverse: bool = False, xp=None
) -> PallasNttPlan:
    import jax.numpy as jnp

    xp = xp or jnp
    w = f.h_inverse(root) if inverse else root
    n_inv = f.h_inverse(n % f.P) if inverse else None
    if n <= SUB_MAX:
        return PallasNttPlan(
            n, n, 1, _make_sub_plan(n, w, xp), None, None, None, n_inv
        )
    logn = n.bit_length() - 1
    r = 1 << min(13, logn - 7)
    c = n // r
    assert c <= SUB_MAX and c % 128 == 0, (n, r, c)
    sub_r = _make_sub_plan(r, f.h_pow(w, c), xp)
    sub_c = _make_sub_plan(c, f.h_pow(w, r), xp)
    # (9, c//128, r) -> (c//128, 9, r): Mosaic requires the last two
    # block dims be 8/128-aligned or full, so the selected axis leads
    tw_hi = xp.asarray(
        np.swapaxes(_tw_planes(c // 128, r, w, stride=128), 0, 1)
    )
    tw_lo = xp.asarray(_tw_planes(128, r, w))
    return PallasNttPlan(n, r, c, sub_r, sub_c, tw_hi, tw_lo, n_inv)


# ---------------------------------------------------------------------------
# in-kernel math (jnp on VMEM values; also runs on numpy for tests)
# ---------------------------------------------------------------------------


def _dft_planes(planes: List, rhs, r: int, xp):
    """planes: 9 x (M, r) int8-valued; returns 9 x (M, r) int8 after the
    radix-r DFT (128-padded matmul) + renormalization."""
    M = planes[0].shape[0]
    if r < 128:
        pads = [
            xp.pad(p, ((0, 0), (0, 128 - r))) if xp is np
            else _lane_pad(p, 128 - r, xp)
            for p in planes
        ]
    else:
        pads = planes
    lhs = xp.concatenate(pads, axis=1)  # (M, 1152)
    if xp is np:
        acc = lhs.astype(np.int32) @ rhs.astype(np.int32)
    else:
        import jax

        acc = jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=xp.int32,
        )
    diags = [acc[:, 128 * u : 128 * u + r] for u in range(L.DIAGS)]
    out = L.renorm_diagonals(diags, xp)
    return [o.astype(xp.int8) for o in out]


def _lane_pad(p, amount: int, xp):
    from jax import lax

    return lax.pad(p, np.int8(0), ((0, 0, 0), (0, amount, 0)))


def _conv_planes(a: List, b: List, xp):
    out = L.mul_conv_limbs(a, b, xp)
    return [o.astype(xp.int8) for o in out]


def _subntt_planes(planes: List, plan: SubPlan, xp):
    """planes: 9 x (bb, r2, r1) [or (bb, m) when the plan has no levels];
    full sub-NTT. In-kernel-safe ops only: major-dim collapses, last-two-
    dim transposes, matmuls, elementwise."""
    if not plan.levels:
        bb, m = planes[0].shape[0], planes[0].shape[-1]
        flat = [p.reshape(-1, m) for p in planes]
        out = _dft_planes(flat, plan.base_rhs, m, xp)
        return [o.reshape(planes[0].shape) for o in out]
    (lp,) = plan.levels
    r1, r2 = lp.r1, lp.r2
    bb = planes[0].shape[0]
    # stage 1: DFT over a (lane dim r1) for each b
    y = _dft_planes([p.reshape(bb * r2, r1) for p in planes], lp.rhs, r1, xp)
    # twiddle w^(b*c): tw planes (r2, r1) broadcast over bb
    y3 = [p.reshape(bb, r2, r1) for p in y]
    y3 = _conv_planes(y3, [lp.tw[s][None] for s in range(9)], xp)
    # stage 2: DFT over b for each c: transpose to lane dim r2
    z = [xp.swapaxes(p, 1, 2) for p in y3]  # (bb, r1_c, r2_b)
    z = _dft_planes(
        [p.reshape(bb * r1, r2) for p in z], plan.base_rhs, r2, xp
    )
    # out[c + d*r1]: (bb, r1_c, r2_d) -> (bb, r2_d, r1_c)
    return [xp.swapaxes(p.reshape(bb, r1, r2), 1, 2) for p in z]


# ---------------------------------------------------------------------------
# pallas calls
# ---------------------------------------------------------------------------


def _subntt_call(x, plan: SubPlan, block_rows: int = 8, interpret=False):
    """x: (9, rows, m) int8 -> (9, rows, m) int8, NTT along the last axis.

    The lane-dim split m -> (r1, r2) happens in XLA (Mosaic cannot shape-
    cast across the lane boundary); the kernel sees (9, bb, r2, r1) blocks
    and performs only major collapses / minor transposes internally."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, rows, m = x.shape
    if plan.levels:
        (lp,) = plan.levels
        r1, r2 = lp.r1, lp.r2
        # j = a*r2 + b -> (b-major, a-lane)
        x4 = jnp.swapaxes(x.reshape(9, rows, r1, r2), 2, 3)
        tables = [lp.rhs, lp.tw, plan.base_rhs]
    else:
        r1, r2 = m, 1
        x4 = x.reshape(9, rows, 1, m)
        tables = [plan.base_rhs]
    br = block_rows
    while rows % br:
        br //= 2

    specs = [
        pl.BlockSpec(
            t.shape, lambda i, nd=t.ndim: (_Z,) * nd, memory_space=pltpu.VMEM
        )
        for t in tables
    ]

    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        t_refs = refs[:-1]
        if plan.levels:
            vplan = SubPlan(
                plan.m,
                (SubLevel(r1, r2, t_refs[0][...], t_refs[1][...]),),
                plan.base_r,
                t_refs[2][...],
            )
        else:
            vplan = SubPlan(plan.m, (), plan.base_r, t_refs[0][...])
        out = _subntt_planes([x_ref[s] for s in range(9)], vplan, jnp)
        for s in range(9):
            o_ref[s] = out[s]

    out4 = pl.pallas_call(
        kernel,
        grid=(rows // br,),
        out_shape=jax.ShapeDtypeStruct((9, rows, r2, r1), jnp.int8),
        in_specs=[
            pl.BlockSpec(
                (9, br, r2, r1),
                lambda i: (_Z, i, _Z, _Z),
                memory_space=pltpu.VMEM,
            )
        ]
        + specs,
        out_specs=pl.BlockSpec(
            (9, br, r2, r1),
            lambda i: (_Z, i, _Z, _Z),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(x4, *tables)
    # (9, rows, r2_d, r1_c) -> natural order k = c + d*r1
    return out4.reshape(9, rows, m)


def _twiddle_outer_call(y, plan: PallasNttPlan, interpret=False):
    """y: (9, rows, r) int8 with rows = B*c; multiply row g (b = g % c)
    by w^(b * c_idx) using the factored tables."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, rows, r = y.shape
    c = plan.c
    hi_rows = c // 128
    assert rows % 128 == 0
    # chunk the lane axis so the ~40 live int32 conv/renorm planes fit VMEM
    rc = min(r, 512)

    def kernel(y_ref, hi_ref, lo_ref, o_ref):
        a = [y_ref[s] for s in range(9)]  # (128, rc)
        lo = [lo_ref[s] for s in range(9)]
        t = _conv_planes(a, lo, jnp)
        # hi_ref is the (1, 9, rc) slab for THIS grid row, selected by the
        # BlockSpec index map (block i needs hi row i % hi_rows — the 128
        # consecutive b's of a block share one b_hi). An earlier in-kernel
        # mask-and-sum selection sent Mosaic's convert-type legalizer into
        # infinite recursion at hi_rows > 1 (first hit at N >= 2^21).
        hi_full = hi_ref[...]
        hi = [hi_full[0, s][None] for s in range(9)]  # (1, rc)
        out = _conv_planes(t, hi, jnp)
        for s in range(9):
            o_ref[s] = out[s]

    return pl.pallas_call(
        kernel,
        grid=(rows // 128, r // rc),
        out_shape=jax.ShapeDtypeStruct(y.shape, jnp.int8),
        in_specs=[
            pl.BlockSpec(
                (9, 128, rc), lambda i, j: (_Z, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 9, rc),
                # NB: stay in int32 — `i % hi_rows` promotes through weak
                # i64 under x64, and an i64 convert inside the Mosaic
                # index-map lowering loops its type legalizer forever
                (lambda i, j: (jax.lax.rem(i, np.int32(hi_rows)), _Z, j))
                if hi_rows > 1
                else (lambda i, j: (_Z, _Z, j)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (9, 128, rc), lambda i, j: (_Z, _Z, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (9, 128, rc), lambda i, j: (_Z, i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(y, plan.tw_hi, plan.tw_lo)


# ---------------------------------------------------------------------------
# full transform
# ---------------------------------------------------------------------------


def ntt_pallas(values, plan: PallasNttPlan, interpret=False):
    """u64 rows (..., n) -> u64 (..., n): out[k] = sum_j v[j] root^(jk),
    scaled by n^-1 for inverse plans (same contract as ntt.ntt_with)."""
    import jax.numpy as jnp

    n = values.shape[-1]
    assert n == plan.n
    shape = values.shape
    v = values.reshape(-1, n)
    B = v.shape[0]
    x = jnp.stack(
        [p.astype(jnp.int8) for p in L.u64_to_limb_planes(v, jnp)], axis=0
    )  # (9, B, n)

    if plan.sub_c is None:
        out = _subntt_call(x, plan.sub_r, interpret=interpret)
        out_pl = [out[s].astype(jnp.int32) for s in range(9)]
    else:
        r, c = plan.r, plan.c
        # j = a*c + b: (9, B, a, b) -> (9, B, b, a)
        x4 = x.reshape(9, B, r, c)
        y = jnp.swapaxes(x4, 2, 3).reshape(9, B * c, r)
        y = _subntt_call(y, plan.sub_r, interpret=interpret)
        y = _twiddle_outer_call(y, plan, interpret=interpret)
        # (9, B, b, c_idx) -> (9, B, c_idx, b)
        z = jnp.swapaxes(y.reshape(9, B, c, r), 2, 3).reshape(9, B * r, c)
        z = _subntt_call(z, plan.sub_c, interpret=interpret)
        # out[c_idx + d*r]: (9, B, c_idx, d) -> (9, B, d, c_idx)
        out = jnp.swapaxes(z.reshape(9, B, r, c), 2, 3)
        out_pl = [out[s].reshape(B, n).astype(jnp.int32) for s in range(9)]

    res = L.limbs_to_u64(out_pl, jnp)
    if plan.n_inv is not None:
        res = f.mul(res, np.uint64(plan.n_inv), jnp)
    return res.reshape(shape)


# ---------------------------------------------------------------------------
# jit plumbing: pass plan arrays as runtime args, keep ints static
# ---------------------------------------------------------------------------


def plan_leaves(plan: PallasNttPlan) -> list:
    """The plan's device arrays in a fixed order (for passing through a
    jit boundary as runtime operands; the integer geometry stays static
    in the closed-over plan template — see plan_rebind)."""
    out = []

    def sub(sp: SubPlan):
        for lp in sp.levels:
            out.append(lp.rhs)
            out.append(lp.tw)
        out.append(sp.base_rhs)

    sub(plan.sub_r)
    if plan.sub_c is not None:
        sub(plan.sub_c)
        out.append(plan.tw_hi)
        out.append(plan.tw_lo)
    return out


def plan_rebind(template: PallasNttPlan, leaves) -> PallasNttPlan:
    """Rebuild a plan from a static template + runtime array leaves."""
    it = iter(leaves)

    def sub(sp: SubPlan) -> SubPlan:
        levels = tuple(
            SubLevel(lp.r1, lp.r2, next(it), next(it)) for lp in sp.levels
        )
        return SubPlan(sp.m, levels, sp.base_r, next(it))

    sub_r = sub(template.sub_r)
    sub_c = tw_hi = tw_lo = None
    if template.sub_c is not None:
        sub_c = sub(template.sub_c)
        tw_hi = next(it)
        tw_lo = next(it)
    return PallasNttPlan(
        template.n, template.r, template.c, sub_r, sub_c, tw_hi, tw_lo,
        template.n_inv,
    )
