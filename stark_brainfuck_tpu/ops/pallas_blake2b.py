"""Fused Pallas TPU kernel for the vectorized BLAKE2b-512 leaf hash.

The jnp implementation in ops/blake2b.py is algebraically identical but
lowers to ~2000 separate u32 HBM-resident arrays per compression — XLA does
not fuse graphs that wide, so every G-function step round-trips HBM and a
2^19-leaf tree costs ~1 s (measured round 1; ~500 k leaves/s). This kernel
keeps the entire working state (v[16], m[16], h[8] as u32 limb pairs) in
VMEM for a block of leaves, so the only HBM traffic is the message read and
digest write: >100x less traffic.

Layout: messages are word-major (W, R, 128) u32 limb planes — word j of all
leaves is a contiguous (R, 128) tile, so every G-function op is a full-tile
VPU op. The 12 rounds x 8 G-functions are statically unrolled (static SIGMA
indexing, no in-kernel gathers).

Same message convention as ops/blake2b.py `blake2b_words`; digests are
bit-identical to hashlib.blake2b(payload, digest_size=64).
"""

from __future__ import annotations

import numpy as np

_M32 = 0xFFFFFFFF

# leaves processed per grid step (sublane-dim rows of 128 lanes)
_BLOCK_ROWS = 8


def _add(a, b):
    lo = a[0] + b[0]
    # unsigned-overflow carry without compares (Mosaic-safe):
    # carry-out MSB = (a&b) | ((a|b) & ~sum)
    carry = ((a[0] & b[0]) | ((a[0] | b[0]) & ~lo)) >> np.uint32(31)
    return (lo, a[1] + b[1] + carry)


def _xor(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def _ror32(a):
    return (a[1], a[0])


def _ror(a, r):
    lo, hi = a
    s = np.uint32(r)
    t = np.uint32(32 - r)
    return ((lo >> s) | (hi << t), (hi >> s) | (lo << t))


def _rol1(a):
    lo, hi = a
    one = np.uint32(1)
    t = np.uint32(31)
    return ((lo << one) | (hi >> t), (hi << one) | (lo >> t))


def _g(v, a, b, c, d, x, y):
    v[a] = _add(_add(v[a], v[b]), x)
    v[d] = _ror32(_xor(v[d], v[a]))
    v[c] = _add(v[c], v[d])
    v[b] = _ror(_xor(v[b], v[c]), 24)
    v[a] = _add(_add(v[a], v[b]), y)
    v[d] = _ror(_xor(v[d], v[a]), 16)
    v[c] = _add(v[c], v[d])
    v[b] = _rol1(_xor(v[b], v[c]))


def _kernel_body(m_lo_ref, m_hi_ref, d_lo_ref, d_hi_ref, *, W, msg_len, xp):
    from . import blake2b as B

    shape = m_lo_ref[0].shape

    def bc(word):
        return (
            xp.full(shape, np.uint32(word & _M32), dtype=xp.uint32),
            xp.full(shape, np.uint32(word >> 32), dtype=xp.uint32),
        )

    h = [bc(B._H0)] + [bc(w) for w in B._IV[1:]]
    nblocks = W // 16
    for i in range(nblocks):
        m = [
            (m_lo_ref[16 * i + j], m_hi_ref[16 * i + j])
            for j in range(16)
        ]
        last = i == nblocks - 1
        t = msg_len if last else (i + 1) * 128
        v = list(h) + [bc(w) for w in B._IV]
        v[12] = _xor(v[12], bc(t))
        if last:
            v[14] = _xor(v[14], bc(0xFFFFFFFFFFFFFFFF))
        for r in range(12):
            s = B._SIGMA[r % 10]
            _g(v, 0, 4, 8, 12, m[s[0]], m[s[1]])
            _g(v, 1, 5, 9, 13, m[s[2]], m[s[3]])
            _g(v, 2, 6, 10, 14, m[s[4]], m[s[5]])
            _g(v, 3, 7, 11, 15, m[s[6]], m[s[7]])
            _g(v, 0, 5, 10, 15, m[s[8]], m[s[9]])
            _g(v, 1, 6, 11, 12, m[s[10]], m[s[11]])
            _g(v, 2, 7, 8, 13, m[s[12]], m[s[13]])
            _g(v, 3, 4, 9, 14, m[s[14]], m[s[15]])
        h = [_xor(h[j], _xor(v[j], v[j + 8])) for j in range(8)]
    for j in range(8):
        d_lo_ref[j] = h[j][0]
        d_hi_ref[j] = h[j][1]


def blake2b_words_pallas(m_lo, m_hi, msg_len: int, interpret: bool = False):
    """BLAKE2b-512 over a batch of equal-length messages as one fused
    Pallas kernel. m_lo/m_hi: (n, W) uint32 limb arrays (see
    blake2b.blake2b_words); n must be a multiple of 128. Returns
    (d_lo, d_hi): (n, 8) uint32 digest limbs."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, W = m_lo.shape
    assert W % 16 == 0 and W > 0
    assert n % 128 == 0, "pallas path needs n % 128 == 0"
    rows = n // 128
    br = _BLOCK_ROWS
    while rows % br:
        br //= 2
    grid = (rows // br,)

    # word-major planes: (W, rows, 128)
    ml = jnp.transpose(m_lo.reshape(rows, 128, W), (2, 0, 1))
    mh = jnp.transpose(m_hi.reshape(rows, 128, W), (2, 0, 1))

    # constants as np.int32: with jax_enable_x64 a Python 0 traces as i64,
    # which Mosaic cannot legalize in index maps
    zero = np.int32(0)
    in_spec = pl.BlockSpec(
        (W, br, 128), lambda i: (zero, i, zero), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (8, br, 128), lambda i: (zero, i, zero), memory_space=pltpu.VMEM
    )

    def kernel(m_lo_ref, m_hi_ref, d_lo_ref, d_hi_ref):
        _kernel_body(
            m_lo_ref, m_hi_ref, d_lo_ref, d_hi_ref,
            W=W, msg_len=msg_len, xp=jnp,
        )

    d_lo, d_hi = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=[
            jax.ShapeDtypeStruct((8, rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((8, rows, 128), jnp.uint32),
        ],
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        interpret=interpret,
    )(ml, mh)

    # back to leaf-major (n, 8)
    d_lo = jnp.transpose(d_lo, (1, 2, 0)).reshape(n, 8)
    d_hi = jnp.transpose(d_hi, (1, 2, 0)).reshape(n, 8)
    return d_lo, d_hi
