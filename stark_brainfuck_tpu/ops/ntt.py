"""Iterative radix-2 NTT / INTT, coset evaluation, and randomized LDE.

Replaces the reference's recursive Python NTT and O(n log^2 n) generic
fast_interpolate (`ntt.py:4-42,126-161`) with:

  - an iterative, statically-unrolled Cooley-Tukey butterfly network over
    whole column batches (shape (B, n)) — every stage is a reshape +
    broadcasted field mul/add/sub, which XLA fuses and tiles for the VPU;
  - trace interpolation as a *subgroup* INTT + additive randomization
    f(x) = trace_poly(x) + (x^H - 1)·r(x), which parametrizes exactly the
    same coset of degree-(H+R-1) polynomials the reference samples by
    interpolating through R extra random off-domain points
    (`table.py:112-136`), but needs only one INTT + one NTT instead of a
    recursive divide-and-conquer interpolation per column.

All twiddle/permutation tables are precomputed host-side (numpy) and cached
per (n, root); the butterfly loops are Python-unrolled (log2(n) stages) so
everything under jit has static shapes.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from . import field as f
from .field import P, U64


@lru_cache(maxsize=None)
def _bitrev_permutation(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _stage_twiddles(n: int, root: int) -> tuple:
    """Per-stage twiddle tables for a size-n NTT with primitive root `root`.

    Stage s (m = 2^s) needs [w_m^j for j < m/2] with w_m = root^(n/m) — a
    strided slice of the full power table."""
    full = f.powers(root, max(n // 2, 1), np)
    tables = []
    logn = n.bit_length() - 1
    for s in range(1, logn + 1):
        m = 1 << s
        tables.append(full[:: n // m][: m // 2].copy())
    return tuple(tables)


def ntt(values, root: int, xp=np):
    """Forward NTT along the last axis: out[k] = Σ_j v[j]·root^(jk).

    `values`: u64 array (..., n), n a power of two; `root` a primitive n-th
    root of unity (python int). Matches ref `ntt.py:4-23` semantics."""
    n = values.shape[-1]
    if n <= 1:
        return values
    assert n & (n - 1) == 0, "NTT length must be a power of two"
    shape = values.shape
    x = values.reshape((-1, n))
    perm = _bitrev_permutation(n)
    if xp is not np:
        perm = xp.asarray(perm)
    x = x[:, perm]
    stage_tw = _stage_twiddles(n, root)
    logn = n.bit_length() - 1
    b = x.shape[0]
    for s in range(1, logn + 1):
        m = 1 << s
        half = m >> 1
        tw = stage_tw[s - 1]
        if xp is not np:
            tw = xp.asarray(tw)
        x = x.reshape((b, n // m, m))
        even = x[:, :, :half]
        odd = x[:, :, half:]
        t = f.mul(odd, tw[None, None, :], xp)
        x = xp.concatenate([f.add(even, t, xp), f.sub(even, t, xp)], axis=-1)
    return x.reshape(shape)


def intt(values, root: int, xp=np):
    """Inverse NTT along the last axis (ref ntt.py:26-42)."""
    n = values.shape[-1]
    if n <= 1:
        return values
    out = ntt(values, f.h_inverse(root), xp)
    n_inv = f.h_inverse(n % P)
    if xp is np:
        return f.mul(out, U64(n_inv), np)
    return f.mul(out, xp.asarray(n_inv, dtype=xp.uint64), xp)


def scale_coefficients(coeffs, offset: int, xp=np):
    """coeffs[i] *= offset^i — evaluate-on-coset shift (ref univariate scale)."""
    n = coeffs.shape[-1]
    tbl = f.powers(offset, n, np)
    if xp is not np:
        tbl = xp.asarray(tbl)
    return f.mul(coeffs, tbl, xp)


def coset_evaluate(coeffs, offset: int, root: int, length: int, xp=np):
    """Evaluate polynomials (coeff rows, (..., d)) on the coset
    offset·⟨root⟩ of size `length` (ref ntt.py:164-168)."""
    d = coeffs.shape[-1]
    assert d <= length
    scaled = scale_coefficients(coeffs, offset, xp)
    if d < length:
        pad = xp.zeros(coeffs.shape[:-1] + (length - d,), dtype=xp.uint64)
        scaled = xp.concatenate([scaled, pad], axis=-1)
    return ntt(scaled, root, xp)


def coset_interpolate(values, offset: int, root: int, xp=np):
    """Inverse of coset_evaluate (ref ntt.py:171-174)."""
    coeffs = intt(values, root, xp)
    return scale_coefficients(coeffs, f.h_inverse(offset), xp)


def lde_columns(
    trace,
    randomizers,
    omicron: int,
    fri_offset: int,
    fri_root: int,
    fri_length: int,
    xp=np,
):
    """Randomized low-degree extension of trace columns onto the FRI domain.

    trace: (W, H) u64 — columns over the omicron subgroup ⟨omicron⟩, H = 2^k.
    randomizers: (W, R) u64 random coefficients (R = num_randomizers), or None.

    Returns (W, fri_length) codewords of
        f_w(x) = interp_w(x) + (x^H - 1)·r_w(x),
    which agrees with the trace on the omicron domain and has degree
    ≤ H + R - 1 = the reference's interpolant_degree (`table.py:42-46`).
    """
    W, H = trace.shape
    coeffs = intt(trace, omicron, xp)
    if randomizers is not None and randomizers.shape[-1] > 0:
        R = randomizers.shape[-1]
        assert R <= H, "num_randomizers must not exceed the trace height"
        # (x^H - 1)·r(x): adds +r_j at coeff H+j and -r_j at coeff j
        head = f.sub(coeffs[..., :R], randomizers, xp)
        coeffs = xp.concatenate([head, coeffs[..., R:], randomizers], axis=-1)
    return coset_evaluate(coeffs, fri_offset, fri_root, fri_length, xp)


def lde_xcolumns(
    trace,
    randomizers,
    omicron: int,
    fri_offset: int,
    fri_root: int,
    fri_length: int,
    xp=np,
):
    """Extension-field variant: trace (W, H, 3) -> codewords (W, fri_length, 3).
    The NTT treats the coefficient axis as a batch dim (move it to front)."""
    t = xp.moveaxis(trace, -1, 0)  # (3, W, H)
    r = None if randomizers is None else xp.moveaxis(randomizers, -1, 0)
    if r is None:
        out = lde_columns(
            t.reshape((-1, t.shape[-1])), None, omicron, fri_offset, fri_root,
            fri_length, xp,
        )
    else:
        out = lde_columns(
            t.reshape((-1, t.shape[-1])),
            r.reshape((-1, r.shape[-1])),
            omicron, fri_offset, fri_root, fri_length, xp,
        )
    out = out.reshape((3,) + trace.shape[:-2] + (fri_length,))
    return xp.moveaxis(out, 0, -1)
