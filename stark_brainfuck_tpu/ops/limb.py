"""Balanced 8-bit-limb representation of Goldilocks field elements.

The MXU NTT (ops/mxu_ntt.py) computes radix-r DFT butterflies as int8
matrix multiplies with exact int32 accumulation. This module holds the
representation and the (backend-generic) renormalization math:

  - an element is 9 signed byte limbs l_0..l_8 in [-128, 127]:
    value = sum l_i * 2^(8i), congruent mod p to the field element
    (redundant representation: limb vectors are not unique);
  - a radix-r limb matmul of X (groups, r*9) against the banded DFT
    matrix RHS[(j,s),(k,u)] = limb_t(W[j,k]), t = u - s in [0, 9),
    yields 17 int32 "diagonals" per output with |c_u| <= 9*128*128^2*r
    <= 2^24.2 for r <= 128 — exact in int32;
  - `renorm_diagonals` folds diagonals back to 9 balanced limbs using
    the Goldilocks identities 2^64 == 2^32 - 1, 2^96 == -1, 2^128 ==
    -2^32 (all mod p), via a corner-free two-phase scheme: parallel
    per-diagonal 4-byte balanced splits (no carry chains), position
    folds, then ONE short carry chain whose final carry is provably 0.

All functions take `xp` (numpy or jax.numpy) and work on either backend;
the Pallas kernels call the same code on VMEM refs.
"""

from __future__ import annotations

import numpy as np

from . import field as f

P = f.P
LIMBS = 9  # data limbs per element
DIAGS = 2 * LIMBS - 1  # matmul output diagonals


# ---------------------------------------------------------------------------
# host-side (python ints / numpy) constructors
# ---------------------------------------------------------------------------


def h_to_limbs(x: int) -> list:
    """Canonical field int -> 9 balanced byte limbs (host, exact)."""
    assert 0 <= x < (1 << 64)
    digits = [(x >> (8 * i)) & 0xFF for i in range(8)] + [0]
    out = []
    carry = 0
    for i in range(9):
        t = digits[i] + carry
        r = ((t + 128) & 0xFF) - 128
        out.append(r)
        carry = (t - r) >> 8
    assert carry == 0 and all(-128 <= v <= 127 for v in out)
    return out


def h_from_limbs(limbs) -> int:
    """9 balanced limbs -> canonical field int (host oracle)."""
    return sum(int(v) << (8 * i) for i, v in enumerate(limbs)) % P


def limbify(values: np.ndarray) -> np.ndarray:
    """(…,) u64 canonical -> (…, 9) int8 balanced limbs (host numpy)."""
    v = np.asarray(values, dtype=np.uint64)
    digits = np.zeros(v.shape + (9,), dtype=np.int32)
    for i in range(8):
        digits[..., i] = ((v >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(
            np.int32
        )
    out = np.zeros(v.shape + (9,), dtype=np.int8)
    carry = np.zeros(v.shape, dtype=np.int32)
    for i in range(9):
        t = digits[..., i] + carry
        r = t - ((t + 128) >> 8 << 8)
        out[..., i] = r.astype(np.int8)
        carry = (t - r) >> 8
    assert not carry.any()
    return out


# ---------------------------------------------------------------------------
# backend-generic kernel math (runs on numpy, jnp, and inside Pallas)
# ---------------------------------------------------------------------------


def balanced_split4(c, xp):
    """int32 (|c| < 2^25) -> four balanced byte planes b0..b3 with
    c == b0 + 256 b1 + 2^16 b2 + 2^24 b3, each |b_i| <= 128, parallel
    (no cross-element chains)."""
    q1 = (c + 128) >> 8
    b0 = c - (q1 << 8)
    q2 = (q1 + 128) >> 8
    b1 = q1 - (q2 << 8)
    q3 = (q2 + 128) >> 8
    b2 = q2 - (q3 << 8)
    return b0, b1, b2, q3


def renorm_diagonals(diags, xp):
    """17 int32 diagonal planes (each |c_u| <= ~2^24.5) -> 9 int8 limb
    planes, value-congruent mod p.

    diags: sequence of 17 arrays (same shape). Returns list of 9 arrays
    (int8 dtype on numpy; the caller casts as needed inside kernels).

    Scheme (corner-free, see module docstring):
      1. per-diagonal balanced 4-byte split -> byte grid positions 0..19
      2. fold positions >= 8 by 2^(64+8m) == 2^(32+8m) - 2^(8m),
         2^(96+8r) == -2^(8r), 2^(128+8s) == -2^(32+8s)
      3. one carry chain over positions 0..8; digits are bounded by
         ~1400, so carries stay <= 6 and the chain's final carry is 0.
    """
    assert len(diags) == DIAGS
    shape = diags[0].shape
    zero = xp.zeros(shape, dtype=xp.int32)
    pos = [zero] * 20
    for u in range(DIAGS):
        b0, b1, b2, b3 = balanced_split4(diags[u].astype(xp.int32), xp)
        pos[u] = pos[u] + b0
        pos[u + 1] = pos[u + 1] + b1
        pos[u + 2] = pos[u + 2] + b2
        pos[u + 3] = pos[u + 3] + b3
    d = list(pos[:8])
    # 2^(64+8m) == 2^(32+8m) - 2^(8m), m = 0..3   (positions 8..11)
    for m in range(4):
        d[4 + m] = d[4 + m] + pos[8 + m]
        d[m] = d[m] - pos[8 + m]
    # 2^(96+8r) == -2^(8r), r = 0..3              (positions 12..15)
    for r in range(4):
        d[r] = d[r] - pos[12 + r]
    # 2^(128+8s) == -2^(32+8s), s = 0..3          (positions 16..19)
    for s in range(4):
        d[4 + s] = d[4 + s] - pos[16 + s]
    # carry chain; |d_i| <= 4*128 + 3*128*... bounded ~1410 -> carries <= 6
    out = []
    carry = zero
    for i in range(9):
        t = (d[i] if i < 8 else zero) + carry
        r = t - ((t + 128) >> 8 << 8)
        out.append(r)
        carry = (t - r) >> 8
    # final carry is provably 0: |t_8| = |carry_8| <= 6
    return out


def mul_conv_limbs(a_limbs, b_limbs, xp):
    """Elementwise field multiply in limb space: two lists of 9 int
    planes -> 9 balanced planes. Products are computed in int32
    (|a_s*b_t| <= 2^14, 9 summands per diagonal -> |c_u| <= 2^17.2),
    then renormalized."""
    shape = a_limbs[0].shape
    diags = [xp.zeros(shape, dtype=xp.int32) for _ in range(DIAGS)]
    for s in range(LIMBS):
        a32 = a_limbs[s].astype(xp.int32)
        for t in range(LIMBS):
            diags[s + t] = diags[s + t] + a32 * b_limbs[t].astype(xp.int32)
    return renorm_diagonals(diags, xp)


def limbs_to_u64(limbs, xp):
    """9 balanced limb planes -> canonical u64 (XLA/numpy side; uses u64
    field ops). value = A + 2^32 B + 2^64 C with A = l_0..l_3,
    B = l_4..l_7 (|A|,|B| < 2^32), C = l_8."""
    i64 = xp.int64
    A = (
        limbs[0].astype(i64)
        + (limbs[1].astype(i64) << np.int64(8))
        + (limbs[2].astype(i64) << np.int64(16))
        + (limbs[3].astype(i64) << np.int64(24))
    )
    B = (
        limbs[4].astype(i64)
        + (limbs[5].astype(i64) << np.int64(8))
        + (limbs[6].astype(i64) << np.int64(16))
        + (limbs[7].astype(i64) << np.int64(24))
    )
    C = limbs[8].astype(i64)

    def mod_p(v):
        # |v| < 2^33: one conditional add of p. p > 2^63 doesn't fit i64,
        # so work on the two's-complement u64 view: for v < 0,
        # v + p == v_u64 - (2^64 - p) == v_u64 - (2^32 - 1).
        vu = v.astype(xp.uint64)
        return xp.where(v < 0, vu - np.uint64(0xFFFFFFFF), vu)

    a = mod_p(A)
    b = mod_p(B)
    c = mod_p(C)
    two32 = np.uint64(1 << 32)
    # A + 2^32 B + C (2^32 - 1)  ==  A + 2^32 (B + C) - C   (mod p)
    bc = f.add(b, c, xp)
    t = f.mul(bc, two32, xp)
    return f.sub(f.add(a, t, xp), c, xp)


def u64_to_limb_planes(x, xp):
    """u64 canonical (…,) -> list of 9 int8-valued int32 planes
    (XLA/numpy side)."""
    digits = [
        ((x >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(xp.int32)
        for i in range(8)
    ]
    out = []
    carry = xp.zeros(x.shape, dtype=xp.int32)
    for i in range(9):
        t = (digits[i] if i < 8 else carry * 0) + carry
        r = t - ((t + 128) >> 8 << 8)
        out.append(r)
        carry = (t - r) >> 8
    return out


# ---------------------------------------------------------------------------
# DFT matrix / twiddle table constructors (host numpy)
# ---------------------------------------------------------------------------


def dft_rhs(r: int, root: int) -> np.ndarray:
    """Banded limb DFT matrix for out[k] = sum_j W[j,k]·x[j],
    W[j,k] = root^(jk) mod p: int8 (r*9, r*17) with
    RHS[(j,s), (k,u)] = limb_{u-s}(W[j,k]) for 0 <= u-s < 9."""
    idx = (np.arange(r)[:, None] * np.arange(r)[None, :]) % r
    Wl = limbify(f.powers(root, r, np)[idx])  # (r_j, r_k, 9) int8
    rhs = np.zeros((r * 9, r * 17), dtype=np.int8)
    for s in range(9):
        for t in range(9):
            # rows (j, s) -> cols (k, u = s + t)
            rhs[s::9, (s + t)::17] = Wl[:, :, t]
    return rhs


def twiddle_values(rows: int, cols: int, root: int, row_stride: int = 1):
    """(rows, cols) u64 table of root^(row_stride * b * c)."""
    out = np.empty((rows, cols), dtype=np.uint64)
    for b in range(rows):
        out[b] = f.powers(f.h_pow(root, row_stride * b), cols, np)
    return out


def twiddle_limbs(rows: int, cols: int, root: int, row_stride: int = 1):
    """(rows, cols, 9) int8 limb table of root^(row_stride * b * c)."""
    return limbify(twiddle_values(rows, cols, root, row_stride))
