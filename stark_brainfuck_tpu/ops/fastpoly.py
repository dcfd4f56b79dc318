"""Fast polynomial algorithms over arbitrary domains, array-first.

Completes the reference's generic O(n log^2 n) toolbox — NTT
multiplication, product-tree zerofiers, remainder-tree multipoint
evaluation, divide-and-conquer interpolation, and coset division (ref
ntt.py:45-235) — as batched u64 array kernels instead of recursive
per-polynomial list code. Each product/remainder tree level is ONE
batched NTT over a (num_nodes, 2^k) coefficient matrix, so the work per
level is a single vectorized transform rather than num_nodes recursive
calls.

Like the reference's versions, these are utility/parity algorithms: the
protocol itself only ever evaluates/interpolates on subgroup cosets,
where the direct (I)NTT path in ops/ntt.py is strictly cheaper. Host
(numpy) execution is the intended use; everything is xp-generic.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from . import field as f
from . import ntt as nt

U64 = np.uint64


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _pad_to(arr, length: int, xp):
    cur = arr.shape[-1]
    if cur >= length:
        return arr[..., :length]
    pad = xp.zeros(arr.shape[:-1] + (length - cur,), dtype=xp.uint64)
    return xp.concatenate([arr, pad], axis=-1)


def fast_multiply(a, b, xp=np):
    """Product of dense u64 coefficient arrays (lowest degree first; the
    last axis is the coefficient axis and may be batched) via one NTT of
    the next power-of-two length (ref ntt.py:45-79)."""
    a = xp.asarray(a, dtype=xp.uint64)
    b = xp.asarray(b, dtype=xp.uint64)
    la, lb = int(a.shape[-1]), int(b.shape[-1])
    if la == 0 or lb == 0:
        return xp.zeros(a.shape[:-1] + (0,), dtype=xp.uint64)
    m = _next_pow2(la + lb - 1)
    root = f.primitive_nth_root(m)
    pack = nt.make_pack(m, root, False, xp)
    ipack = nt.make_pack(m, root, True, xp)
    fa = nt.ntt_with(_pad_to(a, m, xp), pack, xp)
    fb = nt.ntt_with(_pad_to(b, m, xp), pack, xp)
    prod = nt.ntt_with(f.mul(fa, fb, xp), ipack, xp)
    return prod[..., : la + lb - 1]


def fast_zerofier(points, xp=np):
    """Monic Z(X) = prod (X - p_i) as a (n+1,) u64 array (ref
    ntt.py:82-98). Product tree, one batched NTT multiply per level: level
    k holds the (n/2^k, 2^k + 1) coefficient matrix of the subtree
    zerofiers."""
    points = xp.asarray(points, dtype=xp.uint64)
    n = int(points.shape[0])
    if n == 0:
        return xp.ones((1,), dtype=xp.uint64)
    m = _next_pow2(n)
    # leaves (X - p_i), padded with (X - 0) = X for the power-of-two tree:
    # padding with X multiplies the result by X^(m-n); strip at the end.
    pts = _pad_to(points, m, xp)
    nodes = xp.stack(
        [f.neg(pts, xp), xp.ones((m,), dtype=xp.uint64)], axis=1
    )  # (m, 2)
    width = 2
    while nodes.shape[0] > 1:
        left = nodes[0::2]
        right = nodes[1::2]
        nodes = fast_multiply(left, right, xp)  # (cnt/2, 2*width - 1)
        width = 2 * width - 1
    z = nodes[0]
    if m > n:
        z = z[m - n :]  # divide by X^(m-n) (exact: padded roots are 0)
    return z[: n + 1]


def _poly_mod_batch(num, dens, xp):
    """num: (B, L) polynomials; dens: (B, D) monic denominators (degree
    D-1 each). Returns (B, D-1) remainders — schoolbook long division
    vectorized over the batch axis (each tree level divides many small
    polynomials at once)."""
    B, L = int(num.shape[0]), int(num.shape[1])
    D = int(dens.shape[1])
    d = D - 1  # denominator degree (monic)
    if L < D:
        return _pad_to(num, d, xp)
    rem = num
    # eliminate leading coefficients from the top down; lead coeff of a
    # monic divisor is 1, so the quotient coefficient IS the current lead
    for k in range(L - 1, d - 1, -1):
        lead = rem[:, k]  # (B,)
        # rem[, k-d : k] -= lead * dens[, :d]
        chunk = f.sub(
            rem[:, k - d : k], f.mul(dens[:, :d], lead[:, None], xp), xp
        )
        rem = xp.concatenate([rem[:, : k - d], chunk, rem[:, k:]], axis=1)
    return rem[:, :d]


def fast_evaluate(coeffs, points, xp=np):
    """Multipoint evaluation of one dense polynomial at arbitrary points
    (ref ntt.py:101-123). Remainder tree over the batched zerofier tree:
    each level halves every residual's degree with ONE vectorized
    long-division pass."""
    coeffs = xp.asarray(coeffs, dtype=xp.uint64)
    points = xp.asarray(points, dtype=xp.uint64)
    n = int(points.shape[0])
    if n == 0:
        return xp.zeros((0,), dtype=xp.uint64)
    m = _next_pow2(n)
    pts = _pad_to(points, m, xp)
    # zerofier tree, leaves up
    levels = []
    nodes = xp.stack(
        [f.neg(pts, xp), xp.ones((m,), dtype=xp.uint64)], axis=1
    )
    levels.append(nodes)
    while nodes.shape[0] > 1:
        nodes = fast_multiply(nodes[0::2], nodes[1::2], xp)
        levels.append(nodes)
    # remainder tree, root down
    rem = coeffs.reshape(1, -1)
    if rem.shape[1] == 0:
        rem = xp.zeros((1, 1), dtype=xp.uint64)
    for lvl in range(len(levels) - 2, -1, -1):
        dens = levels[lvl]  # (cnt, width) monic
        num = xp.repeat(rem, 2, axis=0)  # child j gets parent j//2
        rem = _poly_mod_batch(num, dens, xp)
    # rem: (m, 1) — remainder mod (X - p_i) = value at p_i
    return rem[:n, 0]


def fast_interpolate(points, values, xp=np):
    """Interpolation through arbitrary (points, values) pairs (ref
    ntt.py:126-161): f = Σ y_i · Z'(p_i)^-1 · Z(X)/(X - p_i), assembled
    bottom-up — level k combines sibling interpolants as
    f = f_L · Z_R + f_R · Z_L with one batched NTT multiply."""
    points = xp.asarray(points, dtype=xp.uint64)
    values = xp.asarray(values, dtype=xp.uint64)
    n = int(points.shape[0])
    if n == 0:
        return xp.zeros((0,), dtype=xp.uint64)
    # weights w_i = 1 / Z'(p_i) = 1 / prod_{j != i} (p_i - p_j): evaluate
    # the zerofier's derivative at the points via the remainder tree
    z = fast_zerofier(points, xp)
    dz = f.mul(
        z[1:], xp.arange(1, n + 1, dtype=xp.uint64) % xp.uint64(f.P), xp
    )
    w = f.batch_inverse(fast_evaluate(dz, points, xp), xp)
    c0 = f.mul(values, w, xp)  # leaf constants y_i / Z'(p_i)

    m = _next_pow2(n)
    pts = _pad_to(points, m, xp)
    # pad leaf constants with 0 (padded points contribute nothing)
    c0 = _pad_to(c0, m, xp)
    zeros_nodes = xp.stack(
        [f.neg(pts, xp), xp.ones((m,), dtype=xp.uint64)], axis=1
    )
    interp = c0.reshape(m, 1)  # degree-0 interpolants
    nodes = zeros_nodes
    while nodes.shape[0] > 1:
        zl, zr = nodes[0::2], nodes[1::2]
        fl, fr = interp[0::2], interp[1::2]
        interp = f.add(
            fast_multiply(fl, zr, xp), fast_multiply(fr, zl, xp), xp
        )
        nodes = fast_multiply(zl, zr, xp)
    out = interp[0]
    # padded roots at 0 multiply every true term by X^(m-n)... they do
    # not: padding contributes zero constants, but the sibling zerofier
    # factors DO scale the true interpolant by prod(X - 0) = X^(m-n).
    # The result equals X^(m-n) · f(X); strip the exact power shift.
    if m > n:
        out = out[m - n :]
    return out[:n]


def fast_coset_evaluate(coeffs, offset: int, root: int, length: int, xp=np):
    """Evaluate on the coset offset·⟨root⟩ (ref ntt.py:164-168)."""
    return nt.coset_evaluate(
        xp.asarray(coeffs, dtype=xp.uint64), offset, root, length, xp
    )


def fast_coset_divide(a, b, offset: int, root: int, order: int, xp=np):
    """Exact quotient a/b via evaluate-divide-interpolate on a coset large
    enough for the quotient degree (ref ntt.py:191-235). b must divide a
    exactly and be nonzero on the coset."""
    a = xp.asarray(a, dtype=xp.uint64)
    b = xp.asarray(b, dtype=xp.uint64)
    la, lb = int(a.shape[-1]), int(b.shape[-1])
    assert lb > 0, "division by zero polynomial"
    if la == 0:
        return xp.zeros((0,), dtype=xp.uint64)
    m = _next_pow2(max(la, lb))
    while m < order:
        m *= 2
    w = f.primitive_nth_root(m)
    av = nt.coset_evaluate(_pad_to(a, m, xp), offset, w, m, xp)
    bv = nt.coset_evaluate(_pad_to(b, m, xp), offset, w, m, xp)
    qv = f.mul(av, f.batch_inverse(bv, xp), xp)
    q = nt.coset_interpolate(qv, offset, w, xp)
    return q[..., : la - lb + 1]
