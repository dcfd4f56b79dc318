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

Twiddle factors, bit-reversal permutations, and coset scale tables are
precomputed host-side into a `TwiddlePack` and threaded through as *runtime
arguments* — NOT captured as tracer constants. (Capturing an N-sized table
as a jit constant makes XLA constant-fold limb arithmetic over it at
compile time — minutes of compile for large N.)
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Optional, Tuple

import numpy as np

from . import field as f
from .field import P, U64


class TwiddlePack(NamedTuple):
    """Host-precomputed tables for one (n, root) NTT: the bit-reversal
    permutation and per-stage twiddle arrays."""

    perm: object  # (n,) int32
    stages: Tuple  # stage s (1-based): (2^(s-1),) u64 twiddles
    n_inv: Optional[object] = None  # (1,) u64 — set for inverse transforms


class FourStepPack(NamedTuple):
    """Tables for a four-step NTT of size n = R·C: two small sub-packs and
    the (R, C) inter-step twiddle matrix T[k1, c] = root^(c·k1).

    Large monolithic butterfly networks accumulate compile cost in their
    small-stride stages (lane-granularity concats over N-sized arrays);
    factoring into two ~sqrt(N) batched NTTs plus transposes keeps every
    stage's minor dimension <= C and the compile time flat."""

    pack_r: TwiddlePack
    pack_c: TwiddlePack
    twiddle: object  # (R, C) u64 — R, C are recovered from this shape
    n_inv: Optional[object] = None


FOUR_STEP_MIN = 1 << 14


@lru_cache(maxsize=None)
def _bitrev_permutation(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _stage_twiddles_np(n: int, root: int) -> tuple:
    """Stage s (m = 2^s) needs [w_m^j for j < m/2] with w_m = root^(n/m) — a
    strided slice of the full power table."""
    full = f.powers(root, max(n // 2, 1), np)
    tables = []
    logn = n.bit_length() - 1
    for s in range(1, logn + 1):
        m = 1 << s
        tables.append(np.ascontiguousarray(full[:: n // m][: m // 2]))
    return tuple(tables)


def make_pack(n: int, root: int, inverse: bool = False, xp=np):
    """Build (and convert to the target backend) the twiddle pack for a
    size-n transform; large sizes get a FourStepPack."""
    if n >= FOUR_STEP_MIN:
        return _make_four_step_pack(n, root, inverse, xp)
    return _make_small_pack(n, root, inverse, xp)


def _make_small_pack(n: int, root: int, inverse: bool, xp) -> TwiddlePack:
    if n <= 1:
        return TwiddlePack(
            perm=xp.zeros((max(n, 1),), dtype=xp.int32), stages=(),
            n_inv=xp.ones((1,), dtype=xp.uint64) if inverse else None,
        )
    r = f.h_inverse(root) if inverse else root
    perm = _bitrev_permutation(n)
    stages = _stage_twiddles_np(n, r)
    n_inv = None
    if inverse:
        n_inv = np.asarray([f.h_inverse(n % P)], dtype=U64)
    if xp is not np:
        perm = xp.asarray(perm)
        stages = tuple(xp.asarray(s) for s in stages)
        n_inv = None if n_inv is None else xp.asarray(n_inv)
    return TwiddlePack(perm=perm, stages=stages, n_inv=n_inv)


def _make_four_step_pack(n: int, root: int, inverse: bool, xp) -> FourStepPack:
    logn = n.bit_length() - 1
    R = 1 << (logn // 2)
    C = n // R
    r = f.h_inverse(root) if inverse else root
    pack_r = _make_small_pack(R, f.h_pow(r, C), False, xp)
    pack_c = _make_small_pack(C, f.h_pow(r, R), False, xp)
    pw = f.powers(r, n, np)
    k1 = np.arange(R, dtype=np.int64)[:, None]
    c = np.arange(C, dtype=np.int64)[None, :]
    T = np.ascontiguousarray(pw[(k1 * c) % n])
    n_inv = None
    if inverse:
        n_inv = np.asarray([f.h_inverse(n % P)], dtype=U64)
    if xp is not np:
        T = xp.asarray(T)
        n_inv = None if n_inv is None else xp.asarray(n_inv)
    return FourStepPack(pack_r=pack_r, pack_c=pack_c, twiddle=T, n_inv=n_inv)


def ntt_with(values, pack, xp=np):
    """Transform along the last axis using a precomputed pack.
    Forward: out[k] = Σ_j v[j]·root^(jk); if pack.n_inv is set the result is
    scaled by it (inverse transform). Dispatches to the four-step algorithm
    for FourStepPack."""
    if isinstance(pack, FourStepPack):
        return _ntt_four_step(values, pack, xp)
    n = values.shape[-1]
    if n <= 1:
        return values
    shape = values.shape
    x = values.reshape((-1, n))
    x = x[:, pack.perm]
    b = x.shape[0]
    logn = n.bit_length() - 1
    for s in range(1, logn + 1):
        m = 1 << s
        half = m >> 1
        tw = pack.stages[s - 1]
        x = x.reshape((b, n // m, m))
        even = x[:, :, :half]
        odd = x[:, :, half:]
        t = f.mul(odd, tw[None, None, :], xp)
        x = xp.concatenate([f.add(even, t, xp), f.sub(even, t, xp)], axis=-1)
    x = x.reshape(shape)
    if pack.n_inv is not None:
        x = f.mul(x, pack.n_inv[0], xp)
    return x


def _ntt_four_step(values, pack: FourStepPack, xp):
    """Size-n = R·C NTT as: column DFT_R → twiddle → row DFT_C → transpose.
    With x[j] = X[r, c] at j = r·C + c, the output in natural order is the
    (C, R) row-major flatten of Z[k1][k2] (see parallel/dntt.py for the
    index derivation; this is its communication-free single-device form)."""
    shape = values.shape
    R, C = pack.twiddle.shape
    n = R * C
    B = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    x = values.reshape((B, R, C))
    y = xp.swapaxes(x, 1, 2)  # (B, C, R)
    y = ntt_with(y, pack.pack_r, xp)  # DFT over r; y[b, c, k1]
    y = f.mul(y, xp.swapaxes(pack.twiddle, 0, 1)[None], xp)
    y = xp.swapaxes(y, 1, 2)  # (B, k1, c)
    y = ntt_with(y, pack.pack_c, xp)  # DFT over c; y[b, k1, k2]
    y = xp.swapaxes(y, 1, 2)  # (B, k2, k1) — natural order flatten
    out = y.reshape(shape[:-1] + (n,))
    if pack.n_inv is not None:
        out = f.mul(out, pack.n_inv[0], xp)
    return out


# -- convenience wrappers (host-side / tests): root given as an int ---------


def ntt(values, root: int, xp=np):
    return ntt_with(values, make_pack(values.shape[-1], root, False, xp), xp)


def intt(values, root: int, xp=np):
    return ntt_with(values, make_pack(values.shape[-1], root, True, xp), xp)


def scale_table(offset: int, count: int, xp=np):
    """[offset^0 .. offset^(count-1)] for evaluate-on-coset shifts."""
    return f.powers(offset, count, xp)


def coset_evaluate_with(coeffs, scale, fwd_pack: TwiddlePack, length: int, xp=np):
    """Evaluate polynomials (coeff rows (..., d)) on the coset of size
    `length` using precomputed scale table (d,) and forward pack."""
    d = coeffs.shape[-1]
    assert d <= length
    scaled = f.mul(coeffs, scale[: d], xp)
    if d < length:
        pad = xp.zeros(coeffs.shape[:-1] + (length - d,), dtype=xp.uint64)
        scaled = xp.concatenate([scaled, pad], axis=-1)
    return ntt_with(scaled, fwd_pack, xp)


def coset_evaluate(coeffs, offset: int, root: int, length: int, xp=np):
    return coset_evaluate_with(
        coeffs, scale_table(offset, coeffs.shape[-1], xp),
        make_pack(length, root, False, xp), length, xp,
    )


def coset_interpolate(values, offset: int, root: int, xp=np):
    """Inverse of coset_evaluate (ref ntt.py:171-174). Host/test use."""
    n = values.shape[-1]
    coeffs = ntt_with(values, make_pack(n, root, True, xp), xp)
    return f.mul(coeffs, scale_table(f.h_inverse(offset), n, xp), xp)


# -- randomized LDE ---------------------------------------------------------


def lde_coefficients_unpadded(trace, randomizers, intt_pack, scale, xp=np):
    """Offset-prescaled coefficient rows of the randomized LDE at their
    natural length H (+R) — the persistent per-row state of the streamed
    (strided-block) prover, which evaluates them blockwise instead of
    through one padded full-domain NTT."""
    W, H = trace.shape
    coeffs = ntt_with(trace, intt_pack, xp)
    if randomizers is not None and randomizers.shape[-1] > 0:
        R = randomizers.shape[-1]
        assert R <= H, "num_randomizers must not exceed the trace height"
        head = f.sub(coeffs[..., :R], randomizers, xp)
        coeffs = xp.concatenate([head, coeffs[..., R:], randomizers], axis=-1)
    d = coeffs.shape[-1]
    return f.mul(coeffs, scale[:d], xp)


def lde_coefficients(
    trace, randomizers, intt_pack: TwiddlePack, scale, length: int, xp=np
):
    """Coset-scaled, zero-padded coefficient rows of the randomized LDE —
    ready to batch into one shared forward NTT across tables (a single
    size-N NTT graph instance instead of one per table keeps compile time
    flat in the number of tables)."""
    scaled = lde_coefficients_unpadded(trace, randomizers, intt_pack, scale, xp)
    d = scaled.shape[-1]
    if d < length:
        pad = xp.zeros(scaled.shape[:-1] + (length - d,), dtype=xp.uint64)
        scaled = xp.concatenate([scaled, pad], axis=-1)
    return scaled


def lde_columns_with(
    trace, randomizers, intt_pack: TwiddlePack, scale, fwd_pack: TwiddlePack,
    fri_length: int, xp=np,
):
    """Randomized LDE with precomputed packs: trace (W, H) over the omicron
    subgroup -> (W, fri_length) codewords of
        f(x) = trace_poly(x) + (x^H - 1)·r(x).
    `scale`: offset powers table of length >= H + R."""
    W, H = trace.shape
    coeffs = ntt_with(trace, intt_pack, xp)
    if randomizers is not None and randomizers.shape[-1] > 0:
        R = randomizers.shape[-1]
        assert R <= H, "num_randomizers must not exceed the trace height"
        head = f.sub(coeffs[..., :R], randomizers, xp)
        coeffs = xp.concatenate([head, coeffs[..., R:], randomizers], axis=-1)
    return coset_evaluate_with(coeffs, scale, fwd_pack, fri_length, xp)


def lde_xcolumns_with(
    trace, randomizers, intt_pack: TwiddlePack, scale, fwd_pack: TwiddlePack,
    fri_length: int, xp=np,
):
    """Extension-field variant: trace (W, H, 3) -> (W, fri_length, 3); the
    coefficient axis rides along as a batch dim."""
    t = xp.moveaxis(trace, -1, 0)  # (3, W, H)
    r = None if randomizers is None else xp.moveaxis(randomizers, -1, 0)
    flat_r = None if r is None else r.reshape((-1, r.shape[-1]))
    out = lde_columns_with(
        t.reshape((-1, t.shape[-1])), flat_r, intt_pack, scale, fwd_pack,
        fri_length, xp,
    )
    out = out.reshape((3,) + trace.shape[:-2] + (fri_length,))
    return xp.moveaxis(out, 0, -1)


def lde_columns(trace, randomizers, omicron, fri_offset, fri_root, fri_length, xp=np):
    """Convenience wrapper (tests / host paths)."""
    H = trace.shape[-1]
    R = 0 if randomizers is None else randomizers.shape[-1]
    return lde_columns_with(
        trace, randomizers, make_pack(H, omicron, True, xp),
        scale_table(fri_offset, H + R, xp), make_pack(fri_length, fri_root, False, xp),
        fri_length, xp,
    )


def lde_xcolumns(trace, randomizers, omicron, fri_offset, fri_root, fri_length, xp=np):
    H = trace.shape[-2]
    R = 0 if randomizers is None else randomizers.shape[-2]
    return lde_xcolumns_with(
        trace, randomizers, make_pack(H, omicron, True, xp),
        scale_table(fri_offset, H + R, xp), make_pack(fri_length, fri_root, False, xp),
        fri_length, xp,
    )
