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


def inclusive_prefix_mul(factors, xp=np):
    """(N, 3) extension factors -> inclusive prefix products (N, 3)."""
    if factors.shape[0] == 0:
        return factors
    if xp is np:
        return _np_inclusive_prefix_mul(np.asarray(factors))
    import jax

    return jax.lax.associative_scan(
        lambda a, b: xf.mul(a, b, xp), factors, axis=0
    )


def affine_scan(ms, bs, xp=np):
    """Inclusive affine recurrence x_i = m_i·x_{i-1} + b_i with x_{-1} = 0.

    ms, bs: (N, 3) extension arrays. Returns the x_i sequence (N, 3).
    Composition law: (m1,b1) then (m2,b2) == (m2·m1, m2·b1 + b2)."""
    if ms.shape[0] == 0:
        return ms
    if xp is np:
        out = np.empty_like(bs)
        acc = xf.H_ZERO
        for i in range(ms.shape[0]):
            m = tuple(int(c) for c in ms[i])
            b = tuple(int(c) for c in bs[i])
            acc = xf.h_add(xf.h_mul(m, acc), b)
            out[i] = acc
        return out
    import jax

    def combine(first, then):
        m1, b1 = first
        m2, b2 = then
        return xf.mul(m2, m1, xp), xf.add(xf.mul(m2, b1, xp), b2, xp)

    _, B = jax.lax.associative_scan(combine, (ms, bs), axis=0)
    # x_i = M_i·x_{-1} + B_i = B_i since x_{-1} = 0
    return B


def exclusive_from_inclusive(inclusive, initial, xp=np):
    """Shift an inclusive prefix product right by one and premultiply by the
    initial value: out_i = initial · Π_{j<i} f_j."""
    one = xf.ones((1,), xp)
    shifted = xp.concatenate([one, inclusive[:-1]], axis=0)
    init = xp.asarray(initial, dtype=xp.uint64)
    return xf.mul(xp.broadcast_to(init, shifted.shape), shifted, xp)
