"""Device-side BLAKE2b + Merkle vs the host/hashlib oracles.

The device commitment path must produce *byte-identical* roots, paths and
salts to the host layer (merkle.py), which in turn matches the reference
tree shape (ref merkle.py:7-63, salted_merkle.py:7-68) — the verifier never
knows which backend hashed the tree.
"""

import hashlib

import numpy as np
import pytest

import stark_brainfuck_tpu  # noqa: F401  (enables x64)
import jax.numpy as jnp

from stark_brainfuck_tpu.ops import blake2b as B
from stark_brainfuck_tpu.protocol.device_merkle import (
    DeviceMerkle,
    DeviceSaltedMerkle,
    _salt_bytes,
    salt_words,
)
from stark_brainfuck_tpu.protocol.merkle import (
    Merkle,
    SaltBuffer,
    SaltedMerkle,
)
from stark_brainfuck_tpu.protocol.stark import _salted_payload_buffer


@pytest.mark.parametrize("msg_len", [8, 24, 128, 152, 280])
def test_blake2b_kernel_matches_hashlib(msg_len):
    rng = np.random.default_rng(msg_len)
    W = ((msg_len + 127) // 128) * 16
    data = rng.integers(0, 2**64, size=(6, W), dtype=np.uint64)
    data[:, msg_len // 8 :] = 0
    for xp, arr in ((np, data), (jnp, jnp.asarray(data))):
        lo, hi = B.u64_to_limbs(arr, xp)
        d_lo, d_hi = B.blake2b_words(lo, hi, msg_len, xp)
        got = B.digests_to_bytes(np.asarray(d_lo), np.asarray(d_hi))
        for i in range(6):
            want = hashlib.blake2b(
                data[i, : msg_len // 8].astype("<u8").tobytes()
            ).digest()
            assert got[i * 64 : (i + 1) * 64] == want


def test_merkle_parents_matches_pair_hash():
    rng = np.random.default_rng(7)
    d = rng.integers(0, 2**64, size=(8, 8), dtype=np.uint64)
    lo, hi = B.u64_to_limbs(d)
    p_lo, p_hi = B.merkle_parents(lo, hi, np)
    got = B.digests_to_bytes(p_lo, p_hi)
    for k in range(4):
        want = hashlib.blake2b(
            d[2 * k].astype("<u8").tobytes()
            + d[2 * k + 1].astype("<u8").tobytes()
        ).digest()
        assert got[k * 64 : (k + 1) * 64] == want


def _random_rows(n, k, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, size=(n, k), dtype=np.uint64)


def test_device_merkle_matches_host_tree():
    n, k = 2048, 5
    rows = _random_rows(n, k)
    dt = DeviceMerkle(jnp.asarray(rows), jnp)
    ht = Merkle.from_buffer(
        np.ascontiguousarray(rows.astype("<u8")).tobytes(), 8 * k, n
    )
    assert dt.root() == ht.root()
    idxs = [0, 1, 7, 1000, 2047]
    dt.prefetch(idxs)
    for i in idxs:
        assert dt.open(i) == ht.open(i)
        assert (dt.row_at(i) == rows[i]).all()
        assert Merkle.verify(
            dt.root(), i, dt.open(i), rows[i].astype("<u8").tobytes()
        )
    # un-prefetched index goes through the on-demand fallback
    assert dt.open(555) == ht.open(555)


def test_device_salted_merkle_matches_host_tree():
    n, k = 1024, 3
    rows = _random_rows(n, k, seed=11)
    sw = salt_words(b"\x01" * 16, n, jnp)
    sw_h = np.asarray(sw)
    salt_buf = b"".join(_salt_bytes(sw_h[i]) for i in range(n))
    buf, plen = _salted_payload_buffer(rows, salt_buf)
    hst = SaltedMerkle.from_buffer(buf, plen, n, SaltBuffer(salt_buf))
    dst = DeviceSaltedMerkle(jnp.asarray(rows), sw, jnp)
    assert dst.root() == hst.root()
    idxs = [0, 513, 1023]
    dst.prefetch(idxs)
    for i in idxs:
        s_d, p_d = dst.open(i)
        s_h, p_h = hst.open(i)
        assert s_d == s_h and p_d == p_h
        assert SaltedMerkle.verify(
            dst.root(), i, p_d, rows[i].astype("<u8").tobytes() + s_d
        )


def test_salt_prf_deterministic_per_seed():
    a = np.asarray(salt_words(b"\x02" * 16, 64, jnp))
    b_ = np.asarray(salt_words(b"\x02" * 16, 64, jnp))
    c = np.asarray(salt_words(b"\x03" * 16, 64, jnp))
    assert (a == b_).all()
    assert (a != c).any()


def test_salt_prf_matches_hashlib_and_backends_agree():
    """salt_i must be blake2b(key16 ‖ LE64(i))[:24] bit-exactly, identical
    on both backends (seeded proofs are backend-invariant), including keys
    whose low-8-byte little-endian value exceeds 2^63 (the round-1 device
    salt path crashed on those — advisor finding)."""
    for key in (b"\x05" * 16, b"\xff" * 16, bytes(range(240, 256))):
        wj = np.asarray(salt_words(key, 16, jnp))
        wn = salt_words(key, 16, np)
        assert (wj == wn).all()
        for i in range(16):
            want = hashlib.blake2b(key + i.to_bytes(8, "little")).digest()[:24]
            assert _salt_bytes(wn[i]) == want


def test_prf_field_words_chunked_draw_is_bit_identical():
    """The prover draws the max_degree-sized randomizer polynomial in
    fixed-size counter chunks (one whole-draw dispatch OOMs at 2^20-cycle
    scale — stark.py randpoly.D stage); chunk boundaries and a traced
    counter offset must not change a single word vs the one-shot draw,
    on either backend."""
    from stark_brainfuck_tpu.protocol.device_merkle import (
        prf_digest_words,
        prf_field_words,
        salt_key_limbs,
    )

    key = bytes(range(16))
    klo, khi = salt_key_limbs(key)
    count = 8 * 23 + 5  # not a multiple of a chunk or of 8
    for xp in (np, jnp):
        kl, kh = xp.asarray(klo), xp.asarray(khi)
        whole = np.asarray(prf_field_words(kl, kh, count, xp))
        D = 4
        n_digests = (count + 7) // 8
        parts = [
            np.asarray(
                prf_digest_words(kl, kh, D, xp.asarray(c * D, np.uint32), xp)
            )
            for c in range(-(-n_digests // D))
        ]
        chunked = np.concatenate(parts)[:count]
        assert (whole == chunked).all()
    # cross-backend agreement (seeded proofs are backend-invariant)
    wj = np.asarray(prf_field_words(jnp.asarray(klo), jnp.asarray(khi), count, jnp))
    wn = prf_field_words(klo, khi, count, np)
    assert (wj == wn).all()
