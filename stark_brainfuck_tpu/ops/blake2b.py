"""Vectorized BLAKE2b-512 for TPU/CPU device execution.

The commitment layer hashes millions of fixed-width leaf payloads
(little-endian u64 rows [+ salt], see protocol/channel.py `encode_leaf`)
with BLAKE2b-512 (ref merkle.py:30, salted_merkle.py:33). The reference —
and our host fallback — does this one `hashlib.blake2b` call per leaf on
the CPU; on a 2^21-leaf FRI domain that is both a large host cost and,
worse, forces the full codewords off the device. This module evaluates the
BLAKE2b compression function *itself* as an array program, vectorized over
the leaf axis, so whole Merkle trees are built on-device and only roots,
query openings, and salts ever cross to the host.

Representation: one u64 word = two uint32 arrays (lo, hi). TPUs have no
native 64-bit integer units (XLA emulates u64 with u32 pairs anyway), so
the kernel works on explicit limbs: 64-bit adds are lo-add + carry +
hi-add, and BLAKE2b's fixed rotations (32, 24, 16, 63) are cheap limb
swaps / funnel shifts. The 12 rounds x 8 G-functions are statically
unrolled; state words live in python lists of (lo, hi) arrays so XLA sees
one straight-line elementwise graph and fuses it.

Message convention: fixed-length messages given as (..., W)-limb pairs of
uint32 arrays where W counts u64 *words* and W % 16 == 0 (whole 128-byte
blocks), encoding LE u64 words, zero-padded past `msg_len` bytes. All
commitment payloads in this codebase are multiples of 8 bytes, so the
word-level view is exact.

Digests are returned as (..., 16) uint32 limbs = the 64-byte digest,
bit-identical to `hashlib.blake2b(payload).digest()` (default parameters:
digest_size=64, no key, fanout=1, depth=1).
"""

from __future__ import annotations

import numpy as np

_M32 = 0xFFFFFFFF

_IV = [
    0x6A09E667F3BCC908, 0xBB67AE8584CAA73B,
    0x3C6EF372FE94F82B, 0xA54FF53A5F1D36F1,
    0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
    0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179,
]

# h0 ^= 0x0101kknn : fanout=1, depth=1, keylen=0, digest_size=64
_H0 = _IV[0] ^ 0x01010040

_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]


def _const(word):
    return (np.uint32(word & _M32), np.uint32(word >> 32))


def _add(a, b, xp):
    # uint32 wraps on both backends (numpy overflow warnings are silenced
    # below); carry = wrap detection
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(xp.uint32)
    return (lo, a[1] + b[1] + carry)


def _xor(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def _ror32(a):
    return (a[1], a[0])


def _ror(a, r, xp):
    # rotate right by r (0 < r < 32): funnel shift across limbs
    lo, hi = a
    s = xp.uint32(r)
    t = xp.uint32(32 - r)
    return ((lo >> s) | (hi << t), (hi >> s) | (lo << t))


def _rol1(a, xp):
    # ror by 63 == rol by 1
    lo, hi = a
    one = xp.uint32(1)
    t = xp.uint32(31)
    return ((lo << one) | (hi >> t), (hi << one) | (lo >> t))


def _g(v, a, b, c, d, x, y, xp):
    v[a] = _add(_add(v[a], v[b], xp), x, xp)
    v[d] = _ror32(_xor(v[d], v[a]))
    v[c] = _add(v[c], v[d], xp)
    v[b] = _ror(_xor(v[b], v[c]), 24, xp)
    v[a] = _add(_add(v[a], v[b], xp), y, xp)
    v[d] = _ror(_xor(v[d], v[a]), 16, xp)
    v[c] = _add(v[c], v[d], xp)
    v[b] = _rol1(_xor(v[b], v[c]), xp)


def _compress(h, m, t_bytes, last, xp):
    v = list(h) + [_const(w) for w in _IV]
    v[12] = _xor(v[12], _const(t_bytes))
    if last:
        v[14] = _xor(v[14], _const(0xFFFFFFFFFFFFFFFF))
    for r in range(12):
        s = _SIGMA[r % 10]
        _g(v, 0, 4, 8, 12, m[s[0]], m[s[1]], xp)
        _g(v, 1, 5, 9, 13, m[s[2]], m[s[3]], xp)
        _g(v, 2, 6, 10, 14, m[s[4]], m[s[5]], xp)
        _g(v, 3, 7, 11, 15, m[s[6]], m[s[7]], xp)
        _g(v, 0, 5, 10, 15, m[s[8]], m[s[9]], xp)
        _g(v, 1, 6, 11, 12, m[s[10]], m[s[11]], xp)
        _g(v, 2, 7, 8, 13, m[s[12]], m[s[13]], xp)
        _g(v, 3, 4, 9, 14, m[s[14]], m[s[15]], xp)
    return [_xor(h[i], _xor(v[i], v[i + 8])) for i in range(8)]


def _initial_state():
    return [_const(_H0)] + [_const(w) for w in _IV[1:]]


def _compress_jax(h, m, t_bytes, last, xp):
    """Compression with rounds as a lax.fori_loop and the message schedule
    as a gather from the constant SIGMA table.

    Semantically identical to `_compress`, but the traced graph is ~12x
    smaller — essential when a whole Merkle tree (leaf hash + ~21 parent
    levels, each its own compression call) is jitted as one program.
    """
    from jax import lax

    shape = m[0][0].shape
    mT_lo = xp.stack([w[0] for w in m])  # (16, ...)
    mT_hi = xp.stack([w[1] for w in m])

    def bc(word):
        c = _const(word)
        return (
            xp.broadcast_to(xp.asarray(c[0], xp.uint32), shape),
            xp.broadcast_to(xp.asarray(c[1], xp.uint32), shape),
        )

    v = [
        (
            xp.broadcast_to(xp.asarray(p[0], xp.uint32), shape),
            xp.broadcast_to(xp.asarray(p[1], xp.uint32), shape),
        )
        for p in h
    ] + [bc(w) for w in _IV]
    v[12] = _xor(v[12], bc(t_bytes & 0xFFFFFFFFFFFFFFFF))
    if last:
        v[14] = _xor(v[14], bc(0xFFFFFFFFFFFFFFFF))

    sigma = xp.asarray(_SIGMA, dtype=xp.int32)  # (10, 16)

    def body(r, carry):
        v = [list(p) for p in carry]
        perm = sigma[r % 10]
        mp_lo = xp.take(mT_lo, perm, axis=0)
        mp_hi = xp.take(mT_hi, perm, axis=0)
        mm = [(mp_lo[j], mp_hi[j]) for j in range(16)]
        _g(v, 0, 4, 8, 12, mm[0], mm[1], xp)
        _g(v, 1, 5, 9, 13, mm[2], mm[3], xp)
        _g(v, 2, 6, 10, 14, mm[4], mm[5], xp)
        _g(v, 3, 7, 11, 15, mm[6], mm[7], xp)
        _g(v, 0, 5, 10, 15, mm[8], mm[9], xp)
        _g(v, 1, 6, 11, 12, mm[10], mm[11], xp)
        _g(v, 2, 7, 8, 13, mm[12], mm[13], xp)
        _g(v, 3, 4, 9, 14, mm[14], mm[15], xp)
        return tuple(tuple(p) for p in v)

    v = lax.fori_loop(0, 12, body, tuple(tuple(p) for p in v))
    return [_xor(h[i], _xor(v[i], v[i + 8])) for i in range(8)]


def _pallas_available() -> bool:
    """True when the fused Pallas TPU kernel should be used (real TPU
    backend, not disabled via STARK_NO_PALLAS)."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        import os

        if os.environ.get("STARK_NO_PALLAS"):
            _PALLAS_OK = False
        else:
            try:
                import jax

                # Mosaic/pltpu kernels only compile for real TPU backends
                # (a GPU backend is also "not cpu" but cannot lower them)
                _PALLAS_OK = jax.default_backend() == "tpu"
            except Exception:
                _PALLAS_OK = False
    return _PALLAS_OK


_PALLAS_OK = None


def _blake2b_words_impl(m_lo, m_hi, msg_len: int, xp):
    compress = _compress if xp is np else _compress_jax
    h = _initial_state()
    W = m_lo.shape[-1]
    nblocks = W // 16
    # u32 wraparound is the point of the limb arithmetic; scope the numpy
    # overflow-warning suppression to this call (a module-level seterr
    # would mutate global state for unrelated code)
    with np.errstate(over="ignore"):
        for i in range(nblocks):
            m = [
                (m_lo[..., 16 * i + j], m_hi[..., 16 * i + j])
                for j in range(16)
            ]
            last = i == nblocks - 1
            t = msg_len if last else (i + 1) * 128
            h = compress(h, m, t, last, xp)
    lo = xp.stack([h[j][0] for j in range(8)], axis=-1)
    hi = xp.stack([h[j][1] for j in range(8)], axis=-1)
    return lo, hi


_JITTED_WORDS: dict = {}


def _jitted_words(msg_len: int, use_pallas: bool):
    """One jax.jit-wrapped hash function per (msg_len, path).

    Every Merkle level / leaf batch routes through these shared jitted
    callables, so jax's trace cache reuses the (expensive: ~1 s/shape of
    pure Python) BLAKE2b graph trace across all enclosing jitted stages —
    FRI round r's tree levels re-trace nothing that round r-1 (or the
    commit stages) already traced at the same shape."""
    key = (msg_len, use_pallas)
    fn = _JITTED_WORDS.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        if use_pallas:
            from .pallas_blake2b import blake2b_words_pallas

            fn = jax.jit(
                lambda lo, hi: blake2b_words_pallas(lo, hi, msg_len)
            )
        else:
            fn = jax.jit(
                lambda lo, hi: _blake2b_words_impl(lo, hi, msg_len, jnp)
            )
        _JITTED_WORDS[key] = fn
    return fn


def blake2b_words(m_lo, m_hi, msg_len: int, xp=np):
    """BLAKE2b-512 over a batch of equal-length messages.

    m_lo/m_hi: (..., W) uint32 limb arrays of LE u64 message words
    (W % 16 == 0, zero-padded past msg_len). msg_len: static message
    length in bytes, 0 < msg_len <= 8*W, msg_len > 8*(W-16) (i.e. the
    last block is the last one holding payload). Returns (d_lo, d_hi):
    (..., 8) uint32 limb arrays of the 64-byte digest.

    On a TPU backend, 2-D batches with a 128-multiple row count run as one
    fused Pallas kernel (ops/pallas_blake2b.py) — same bytes, VMEM-resident
    state instead of ~2000 HBM-round-tripping XLA ops per compression.
    """
    W = m_lo.shape[-1]
    assert W % 16 == 0 and W > 0
    assert 8 * (W - 16) < msg_len <= 8 * W
    if xp is np:
        return _blake2b_words_impl(m_lo, m_hi, msg_len, np)
    use_pallas = (
        m_lo.ndim == 2
        and m_lo.shape[0] % 128 == 0
        and _pallas_available()
    )
    return _jitted_words(msg_len, use_pallas)(m_lo, m_hi)


def merkle_parents(d_lo, d_hi, xp=np):
    """One Merkle level: hash sibling digest pairs.

    d_lo/d_hi: (2K, 8) uint32 child-digest limbs (heap order). Returns
    (K, 8) parent digest limbs = blake2b(left_64B || right_64B) — one
    exactly-full final block (t=128)."""
    n = d_lo.shape[0] // 2
    m_lo = d_lo.reshape(n, 16)
    m_hi = d_hi.reshape(n, 16)
    return blake2b_words(m_lo, m_hi, 128, xp)


def merkle_parents_pair(l_lo, l_hi, r_lo, r_hi, xp=np):
    """Elementwise Merkle combine of two digest arrays: parent[m] =
    blake2b(left[m] || right[m]). Left/right: (K, 8) u32 digest limbs.
    Used by the streamed tree accumulator, where tree-sibling digests live
    in two separate class arrays rather than interleaved heap order."""
    m_lo = xp.concatenate([l_lo, r_lo], axis=1)  # (K, 16)
    m_hi = xp.concatenate([l_hi, r_hi], axis=1)
    return blake2b_words(m_lo, m_hi, 128, xp)


def u64_to_limbs(x, xp=np):
    """uint64 array -> (lo, hi) uint32 limb arrays (LE word view)."""
    mask = xp.uint64(_M32)
    return (
        (x & mask).astype(xp.uint32),
        (x >> xp.uint64(32)).astype(xp.uint32),
    )


def digests_to_bytes(d_lo, d_hi) -> bytes:
    """(N, 8) uint32 host limb arrays -> concatenated 64-byte digests."""
    d_lo = np.asarray(d_lo, dtype=np.uint64)
    d_hi = np.asarray(d_hi, dtype=np.uint64)
    words = d_lo | (d_hi << np.uint64(32))
    return np.ascontiguousarray(words.astype("<u8")).tobytes()
