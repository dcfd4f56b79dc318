"""Parallel scans for the table-extension columns.

The reference computes every extension column (running products / running
evaluations) with a sequential python loop over trace rows
(`processor_table.py:359-427`, `instruction_table.py:171-230`,
`memory_table.py:174-206`, `io_table.py:76-108`). Running products and
affine running evaluations are linear recurrences, i.e. compositions in an
associative monoid — on TPU they become `jax.lax.associative_scan` (log-depth
over trace rows) over extension-field elements.

A numpy host fallback (plain loop over python-int scalars) is provided for
tiny inputs and oracle tests.
"""

from __future__ import annotations

import numpy as np

from . import xfield as xf


def _np_inclusive_prefix_mul(factors: np.ndarray) -> np.ndarray:
    out = np.empty_like(factors)
    acc = xf.H_ONE
    for i in range(factors.shape[0]):
        acc = xf.h_mul(acc, tuple(int(c) for c in factors[i]))
        out[i] = acc
    return out


def _shift_down(x, d, fill, xp):
    """Shift rows down by d (towards higher indices), filling the top with
    the monoid identity.

    MISCOMPILE GUARD: on TPU (v5e) the natural concat-of-broadcast-fill
    form produces wrong values from row hmax/2 on when the surrounding jit
    returns per-lane slices of the scan result (deterministic; reproduced
    with K=9 lanes, H=2048 — every lane wrong from index 1024; returning
    the stacked array whole is correct). Zero-pad via lax.pad plus an
    iota-mask `where` lowers differently and is correct in both contexts;
    same trick as the concat-of-slices note in stark._stage_combination.
    """
    if xp is np:
        pad = np.broadcast_to(
            np.asarray(fill, dtype=np.uint64), (d,) + x.shape[1:]
        )
        return np.concatenate([pad, x[:-d]], axis=0)
    from jax import lax

    cfg = [(0, 0, 0)] * x.ndim
    cfg[0] = (d, 0, 0)
    shifted = lax.pad(x[:-d], np.uint64(0), cfg)
    rows = lax.broadcasted_iota(xp.int32, shifted.shape, 0)
    fillb = xp.asarray(fill, dtype=xp.uint64)
    fillb = fillb.reshape((1,) * (x.ndim - 1) + (-1,))
    return xp.where(rows < d, fillb, shifted)


def inclusive_prefix_mul(factors, xp=np):
    """(N, 3) extension factors -> inclusive prefix products (N, 3).

    Hillis-Steele: log2(N) full-width layers; each layer is one fused
    elementwise extension multiply — a deliberately small unrolled graph
    (compile time) at the cost of N·log N total multiplies (each layer is a
    single VPU-wide kernel, so the extra work is bandwidth-cheap)."""
    n = factors.shape[0]
    if n == 0:
        return factors
    if xp is np:
        return _np_inclusive_prefix_mul(np.asarray(factors))
    x = factors
    d = 1
    one = np.zeros((3,), dtype=np.uint64)
    one[0] = 1
    while d < n:
        x = xf.mul(_shift_down(x, d, one, xp), x, xp)
        d *= 2
    return x


def affine_scan(ms, bs, xp=np):
    """Inclusive affine recurrence x_i = m_i·x_{i-1} + b_i with x_{-1} = 0.

    ms, bs: (N, 3) extension arrays. Returns the x_i sequence (N, 3).
    Composition law: (m1,b1) then (m2,b2) == (m2·m1, m2·b1 + b2);
    identity (1, 0). Hillis-Steele layering as in inclusive_prefix_mul."""
    n = ms.shape[0]
    if n == 0:
        return ms
    if xp is np:
        out = np.empty_like(bs)
        acc = xf.H_ZERO
        for i in range(n):
            m = tuple(int(c) for c in ms[i])
            b = tuple(int(c) for c in bs[i])
            acc = xf.h_add(xf.h_mul(m, acc), b)
            out[i] = acc
        return out
    one = np.zeros((3,), dtype=np.uint64)
    one[0] = 1
    zero = np.zeros((3,), dtype=np.uint64)
    d = 1
    while d < n:
        m_early = _shift_down(ms, d, one, xp)
        b_early = _shift_down(bs, d, zero, xp)
        bs = xf.add(xf.mul(ms, b_early, xp), bs, xp)
        ms = xf.mul(ms, m_early, xp)
        d *= 2
    # x_i = M_i·x_{-1} + B_i = B_i since x_{-1} = 0
    return bs


def prefix_mul_as_affine(factors, xp=np):
    """Express an inclusive prefix product as an affine-scan lane:
    x_i = f_i·x_{i-1} + b_i with b = (f_0, 0, 0, ...) gives x_i = Π_{j<=i} f_j
    from x_{-1} = 0 — so product lanes and affine lanes batch into ONE scan."""
    b = xp.concatenate(
        [factors[:1], xp.zeros_like(factors[1:])], axis=0
    )
    return factors, b


def batched_affine_scan(lanes, xp=np):
    """Run many affine recurrences as one scan. `lanes`: list of (ms, bs)
    pairs, each (H_i, 3) — padded to the max height with the identity
    (m=1, b=0) and stacked to (K, Hmax, 3). Returns the list of inclusive
    outputs trimmed back to their own heights.

    One scan instance instead of K keeps the unrolled Hillis-Steele graph
    (and its compile time) flat in the number of extension columns."""
    if not lanes:
        return []
    hmax = max(m.shape[0] for m, _ in lanes)
    one = np.zeros((3,), dtype=np.uint64)
    one[0] = 1

    def pad(arr, fill):
        d = hmax - arr.shape[0]
        if d == 0:
            return arr
        tail = xp.broadcast_to(xp.asarray(fill, dtype=xp.uint64), (d, 3))
        return xp.concatenate([arr, tail], axis=0)

    ms = xp.stack([pad(m, one) for m, _ in lanes], axis=0)  # (K, Hmax, 3)
    bs = xp.stack([pad(b, np.zeros((3,), dtype=np.uint64)) for _, b in lanes], axis=0)

    n = hmax
    d = 1
    zero3 = np.zeros((3,), dtype=np.uint64)
    while d < n:
        m_early = _shift_down_batched(ms, d, one, xp)
        b_early = _shift_down_batched(bs, d, zero3, xp)
        bs = xf.add(xf.mul(ms, b_early, xp), bs, xp)
        ms = xf.mul(ms, m_early, xp)
        d *= 2
    return [bs[k, : lanes[k][0].shape[0]] for k in range(len(lanes))]


def _shift_down_batched(x, d, fill, xp):
    """Batched variant of _shift_down along axis 1 (see its miscompile
    guard note — same zero-pad + iota-mask form)."""
    if xp is np:
        pad = np.broadcast_to(
            np.asarray(fill, dtype=np.uint64), (x.shape[0], d, 3)
        )
        return np.concatenate([pad, x[:, :-d]], axis=1)
    from jax import lax

    shifted = lax.pad(x[:, :-d], np.uint64(0), ((0, 0, 0), (d, 0, 0), (0, 0, 0)))
    rows = lax.broadcasted_iota(xp.int32, shifted.shape, 1)
    fillb = xp.asarray(fill, dtype=xp.uint64)[None, None, :]
    return xp.where(rows < d, fillb, shifted)


def exclusive_from_inclusive(inclusive, initial, xp=np):
    """Shift an inclusive prefix product right by one and premultiply by the
    initial value: out_i = initial · Π_{j<i} f_j."""
    one = xf.ones((1,), xp)
    shifted = xp.concatenate([one, inclusive[:-1]], axis=0)
    init = xp.asarray(initial, dtype=xp.uint64)
    return xf.mul(xp.broadcast_to(init, shifted.shape), shifted, xp)
