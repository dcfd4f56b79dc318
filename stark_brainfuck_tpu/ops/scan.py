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
    the monoid identity."""
    pad = xp.broadcast_to(
        xp.asarray(fill, dtype=xp.uint64), (d,) + x.shape[1:]
    )
    return xp.concatenate([pad, x[:-d]], axis=0)


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


def exclusive_from_inclusive(inclusive, initial, xp=np):
    """Shift an inclusive prefix product right by one and premultiply by the
    initial value: out_i = initial · Π_{j<i} f_j."""
    one = xf.ones((1,), xp)
    shifted = xp.concatenate([one, inclusive[:-1]], axis=0)
    init = xp.asarray(initial, dtype=xp.uint64)
    return xf.mul(xp.broadcast_to(init, shifted.shape), shifted, xp)
