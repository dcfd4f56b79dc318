"""MXU-form NTT numpy TEST ORACLE (not part of the compute path).

The production MXU kernels live in ops/pallas_ntt.py; this module is the
plain-numpy model of the same radix-128 limb-matmul decomposition, kept
only so tests/test_mxu_ntt.py and tests/test_pallas_ntt.py can check the
Pallas kernels against an independent implementation.

MXU-form NTT: radix-128 Cooley-Tukey with int8 limb matmuls.

The u64 butterfly NTT (ops/ntt.py) is VPU-bound on emulated 64-bit
multiplies (~2 Gmul/s measured). Here every radix-r DFT is a single
int8 x int8 -> int32 matrix multiply on the MXU (ops/limb.py holds the
representation):

    out[k] = sum_j W[j,k] x[j]   ==>   X_limbs (M, r*9) @ RHS (r*9, r*17)

with exact int32 accumulation (bound 2^24 < 2^31), followed by a cheap
VPU renormalization back to 9 balanced byte limbs.

Recursion (n = r1 * r2, r1 <= 128):

    out[c + d*r1] = DFT_{r2, over b}( w_n^{bc} * DFT_{r1, over a}( x[a*r2+b] ) )

The inter-level twiddle w_n^{bc} is an elementwise limb convolution; for
n too large to materialize an (r2, r1) table it is factored as
w^{b_hi*128*c} * w^{b_lo*c} — two convolutions against tables of shape
(r2/128, r1) and (128, r1).

This module is backend-generic (numpy for tests/oracles, jnp under jit);
the Pallas kernels in pallas_ntt.py execute the same stage math with
VMEM-resident fusion on TPU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

from . import field as f
from . import limb as L

RADIX = 128
# materialize (r2, r1) twiddle limb tables up to this many elements;
# above it, factor into (r2/128, r1) x (128, r1)
TWIDDLE_MATERIALIZE_MAX = 1 << 13


class LevelPlan(NamedTuple):
    r1: int
    r2: int
    rhs: object  # (r1*9, r1*17) int8 — DFT matrix for the r1 transform
    tw: object  # (r2, r1, 9) int8 or None (factored instead)
    tw_hi: object  # (r2//128, r1, 9) int8 when factored
    tw_lo: object  # (128, r1, 9) int8 when factored


class NttPlan(NamedTuple):
    n: int
    levels: Tuple[LevelPlan, ...]
    base_rhs: object  # DFT matrix for the final (<=128)-point transform
    base_r: int
    n_inv: Optional[int]  # set for inverse transforms


def make_plan(n: int, root: int, inverse: bool = False, xp=np) -> NttPlan:
    """Build the level plans + limb tables for a size-n transform.
    root must have order n; inverse uses root^-1 and scales by n^-1."""
    assert n & (n - 1) == 0 and n >= 2
    r = f.h_inverse(root) if inverse else root
    levels = []
    m, w = n, r
    while m > RADIX:
        r1 = RADIX
        r2 = m // r1
        rhs = L.dft_rhs(r1, f.h_pow(w, r2))
        tw = tw_hi = tw_lo = None
        if r2 * r1 <= TWIDDLE_MATERIALIZE_MAX:
            tw = L.twiddle_limbs(r2, r1, w)
        else:
            assert r2 % 128 == 0
            tw_hi = L.twiddle_limbs(r2 // 128, r1, w, row_stride=128)
            tw_lo = L.twiddle_limbs(128, r1, w)
        if xp is not np:
            rhs = xp.asarray(rhs)
            tw = None if tw is None else xp.asarray(tw)
            tw_hi = None if tw_hi is None else xp.asarray(tw_hi)
            tw_lo = None if tw_lo is None else xp.asarray(tw_lo)
        levels.append(LevelPlan(r1, r2, rhs, tw, tw_hi, tw_lo))
        m, w = r2, f.h_pow(w, r1)
    base_rhs = L.dft_rhs(m, w)
    if xp is not np:
        base_rhs = xp.asarray(base_rhs)
    n_inv = f.h_inverse(n % f.P) if inverse else None
    return NttPlan(n, tuple(levels), base_rhs, m, n_inv)


# ---------------------------------------------------------------------------
# stage math (backend-generic; the Pallas kernels mirror these)
# ---------------------------------------------------------------------------


def _dft_matmul(x_limbs, rhs, xp):
    """x_limbs (M, r, 9) int8 x rhs (r*9, r*17) -> renormed (M, r, 9).

    On numpy this is an exact int32 dot; under jnp XLA lowers the int8
    dot to the MXU with int32 accumulation."""
    M, r, _ = x_limbs.shape
    flat = x_limbs.reshape(M, r * L.LIMBS)
    if xp is np:
        acc = flat.astype(np.int32) @ rhs.astype(np.int32)
    else:
        import jax

        acc = jax.lax.dot_general(
            flat,
            rhs,
            (((1,), (0,)), ((), ())),
            preferred_element_type=xp.int32,
        )
    diags = acc.reshape(M, r, L.DIAGS)
    planes = [diags[..., u] for u in range(L.DIAGS)]
    out = L.renorm_diagonals(planes, xp)
    return xp.stack(out, axis=-1).astype(xp.int8)


def _twiddle_conv(x_limbs, tw, xp):
    """x (B, r2, r1, 9) int8  *  tw (r2, r1, 9) broadcast over B."""
    a = [x_limbs[..., i] for i in range(L.LIMBS)]
    b = [tw[None, ..., i] for i in range(L.LIMBS)]
    out = L.mul_conv_limbs(a, b, xp)
    return xp.stack(out, axis=-1).astype(xp.int8)


def _twiddle_conv_factored(x_limbs, tw_hi, tw_lo, xp):
    """x (B, r2, r1, 9) with w^(bc) = tw_hi[b//128] * tw_lo[b%128]."""
    B, r2, r1, _ = x_limbs.shape
    x5 = x_limbs.reshape(B, r2 // 128, 128, r1, L.LIMBS)
    a = [x5[..., i] for i in range(L.LIMBS)]
    lo = [tw_lo[None, None, :, :, i] for i in range(L.LIMBS)]
    y = L.mul_conv_limbs(a, lo, xp)
    hi = [tw_hi[None, :, None, :, i] for i in range(L.LIMBS)]
    z = L.mul_conv_limbs(y, hi, xp)
    return xp.stack(z, axis=-1).astype(xp.int8).reshape(x_limbs.shape)


def _ntt_limbs(x, plan: NttPlan, level: int, xp):
    """x: (B, m, 9) int8, m = the size at this recursion level.
    Returns (B, m, 9) int8 in natural output order."""
    B, m, _ = x.shape
    if level == len(plan.levels):
        assert m == plan.base_r
        return _dft_matmul(x, plan.base_rhs, xp)
    lp = plan.levels[level]
    r1, r2 = lp.r1, lp.r2
    assert m == r1 * r2
    # x[a*r2 + b] -> (B, a, b) -> transpose -> (B, b, a)
    x3 = x.reshape(B, r1, r2, L.LIMBS)
    y = xp.swapaxes(x3, 1, 2)  # (B, b, a, 9)
    y = _dft_matmul(y.reshape(B * r2, r1, L.LIMBS), lp.rhs, xp)
    y = y.reshape(B, r2, r1, L.LIMBS)  # (B, b, c, 9)
    if lp.tw is not None:
        y = _twiddle_conv(y, lp.tw, xp)
    else:
        y = _twiddle_conv_factored(y, lp.tw_hi, lp.tw_lo, xp)
    # DFT over b for each c: (B, c, b)
    z = xp.swapaxes(y, 1, 2).reshape(B * r1, r2, L.LIMBS)
    z = _ntt_limbs(z, plan, level + 1, xp)  # (B*r1, d(natural), 9)
    z = z.reshape(B, r1, r2, L.LIMBS)
    # out[c + d*r1]: layout (B, d, c)
    out = xp.swapaxes(z, 1, 2)
    return out.reshape(B, m, L.LIMBS)


def ntt_mxu(values, plan: NttPlan, xp=np):
    """Transform u64 rows (..., n) along the last axis (same contract as
    ntt.ntt_with): out[k] = sum_j v[j] root^(jk), scaled by n^-1 when the
    plan is inverse."""
    n = values.shape[-1]
    assert n == plan.n
    shape = values.shape
    v = values.reshape(-1, n)
    planes = L.u64_to_limb_planes(v, xp)
    x = xp.stack(planes, axis=-1).astype(xp.int8)
    out_limbs = _ntt_limbs(x, plan, 0, xp)
    out_planes = [out_limbs[..., i].astype(xp.int32) for i in range(L.LIMBS)]
    out = L.limbs_to_u64(out_planes, xp)
    if plan.n_inv is not None:
        out = f.mul(out, np.uint64(plan.n_inv), xp)
    return out.reshape(shape)
