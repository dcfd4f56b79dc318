"""Pallas TPU kernels for Goldilocks arithmetic on u32 limb pairs.

Operands live as (lo, hi) u32 planes; products are exact 16x16->32
partials accumulated in u32 columns, and the Goldilocks fold
2^64 = 2^32 - 1 runs on u32 words.

MEASURED FINDING (v5e, 2^20 elements): this kernel is correct but ~40x
SLOWER than the fused jnp-u64 path (17 vs ~670 Mmul/s). The bottleneck on
TPU is integer multiply itself — the VPU has no fast int32 multiplier, so
both XLA's u64 emulation and these explicit u32 kernels serialize on
emulated integer products at O(1G)/s, ~1000x below the f32 FMA rate.

Consequence for the speed-of-light design (tracked for the next round):
exact *float-limb* arithmetic — field elements as ~6 planes of <=11-bit
limbs held in f32, products via native FMA (exact below 2^24), carries as
floor-divides — with the MXU handling the NTT's matrix-form small DFTs in
the four-step factorization. This module stays as the correct u32
reference kernel and the benchmark harness for that work.
"""

from __future__ import annotations

import numpy as np

M16 = 0xFFFF
M32 = 0xFFFFFFFF


def to_limbs(a, xp):
    """u64 (...,) -> (lo, hi) u32 pair."""
    import jax

    pair = jax.lax.bitcast_convert_type(a, xp.uint32)  # (..., 2) little-endian
    return pair[..., 0], pair[..., 1]


def from_limbs(lo, hi, xp):
    import jax

    pair = xp.stack([lo, hi], axis=-1)
    return jax.lax.bitcast_convert_type(pair, xp.uint64).reshape(lo.shape)


def _mul_limbs(alo, ahi, blo, bhi, xp):
    """Core: (lo,hi) x (lo,hi) -> reduced (lo,hi), all u32 ops.

    16-bit limb schoolbook: 16 products p_ij = a_i*b_j (exact in u32),
    accumulated per 16-bit output column with explicit carries (column sums
    stay < 2^20), then the 128-bit result folds via
    x = lo64 - hi_hi + hi_lo*(2^32-1)  (mod p)."""
    a = [alo & M16, alo >> 16, ahi & M16, ahi >> 16]
    b = [blo & M16, blo >> 16, bhi & M16, bhi >> 16]

    # p[i][j] computed lazily into column accumulators
    cols = [None] * 8  # 16-bit columns of the 128-bit product

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(4):
        for j in range(4):
            p = a[i] * b[j]
            acc(i + j, p & M16)
            acc(i + j + 1, p >> 16)

    # carry propagate to 16-bit digits r0..r7
    r = []
    carry = xp.zeros_like(alo)
    for k in range(8):
        v = (cols[k] if cols[k] is not None else xp.zeros_like(alo)) + carry
        r.append(v & M16)
        carry = v >> 16

    lo_lo = r[0] | (r[1] << 16)  # bits 0..31
    lo_hi = r[2] | (r[3] << 16)  # bits 32..63
    hi_lo = r[4] | (r[5] << 16)  # bits 64..95
    hi_hi = r[6] | (r[7] << 16)  # bits 96..127

    # t0 = lo64 - hi_hi (64-bit, borrow-aware), then -= (2^32-1) on borrow
    b0 = (lo_lo < hi_hi).astype(xp.uint32)
    t0_lo = lo_lo - hi_hi
    t0_hi = lo_hi - b0
    borrow = ((lo_hi < b0)).astype(xp.uint32)
    # borrow => subtract (2^32 - 1): i.e. add 1 then subtract 2^32 (dec hi)
    t0_lo2 = t0_lo + borrow
    c = (t0_lo2 < borrow).astype(xp.uint32)  # t0_lo overflowed on +1
    t0_hi = t0_hi - borrow + c

    # t1 = hi_lo * (2^32 - 1) = (hi_lo << 32) - hi_lo
    t1_lo = xp.zeros_like(alo) - hi_lo
    t1_b = (hi_lo != 0).astype(xp.uint32)  # borrow out of low word
    t1_hi = hi_lo - t1_b

    # r = t0 + t1 (64-bit two-word add); carry out => add (2^32 - 1)
    s_lo = t0_lo2 + t1_lo
    c0 = (s_lo < t1_lo).astype(xp.uint32)
    s_hi_a = t0_hi + t1_hi
    ca = (s_hi_a < t0_hi).astype(xp.uint32)
    s_hi = s_hi_a + c0
    cb = (s_hi < s_hi_a).astype(xp.uint32)
    c1 = ca | cb  # total carry out of the 64-bit sum (0 or 1)

    # on carry: add 2^32 - 1 (sub 1 from... add M32: lo += M32 with carry)
    add_lo = c1 * xp.uint32(M32)
    f_lo = s_lo + add_lo
    c2 = (f_lo < add_lo).astype(xp.uint32)
    f_hi = s_hi + c2

    # canonicalize: if (f_hi, f_lo) >= p = (0xFFFFFFFF, 0x00000001): sub p
    ge = ((f_hi == xp.uint32(M32)) & (f_lo >= xp.uint32(1))).astype(xp.uint32)
    g_lo = f_lo - ge  # p_lo = 1
    g_hi = f_hi - ge * xp.uint32(M32) - (f_lo < ge).astype(xp.uint32)
    return g_lo, g_hi


def pallas_mul(a, b, block_rows: int = 256, block_cols: int = 256):
    """Elementwise Goldilocks multiply via a Pallas kernel on u32 planes.
    a, b: u64 arrays of identical 2-D shape with dims divisible by the
    block size (the ~30 u32 temporaries bound the VMEM-feasible block)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(alo, ahi, blo, bhi, olo, ohi):
        lo, hi = _mul_limbs(alo[...], ahi[...], blo[...], bhi[...], jnp)
        olo[...] = lo
        ohi[...] = hi

    alo, ahi = to_limbs(a, jnp)
    blo, bhi = to_limbs(b, jnp)
    M, N = alo.shape
    br = min(block_rows, M)
    bc = min(block_cols, N)
    grid = (M // br, N // bc)
    spec = pl.BlockSpec(
        (br, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct(alo.shape, jnp.uint32),
        jax.ShapeDtypeStruct(alo.shape, jnp.uint32),
    ]
    olo, ohi = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=[spec] * 4,
        out_specs=[spec] * 2,
    )(alo, ahi, blo, bhi)
    return from_limbs(olo, ohi, jnp)
