"""Injectable randomness seam.

The reference draws `os.urandom` inline at four sites (trace randomizers
`table.py:127`, leaf salts `salted_merkle.py:25`, permutation initials
`brainfuck_stark.py:186`, randomizer polynomial `brainfuck_stark.py:165`).
Centralizing the draws behind one object makes proofs replayable (seeded)
without changing the protocol; the default stays cryptographically random.
"""

from __future__ import annotations

import os
from hashlib import shake_256
from typing import Optional

import numpy as np

from ..ops import field as f
from ..ops import xfield as xf


class Rng:
    def __init__(self, seed: Optional[int] = None):
        self._counter = 0
        self._seed = None if seed is None else seed.to_bytes(16, "little")

    def bytes(self, n: int) -> bytes:
        if self._seed is None:
            return os.urandom(n)
        self._counter += 1
        return shake_256(
            self._seed + self._counter.to_bytes(8, "little")
        ).digest(n)

    def base_element(self) -> int:
        """Uniform-ish base element (24 random bytes mod p, like
        field.sample(urandom(3*8)))."""
        return f.sample_bytes(self.bytes(24))

    def base_elements(self, shape) -> np.ndarray:
        n = int(np.prod(shape))
        return self._uniform_mod_p(n).reshape(shape)

    def x_element(self, chunk: int = 8) -> tuple:
        return xf.h_sample(self.bytes(3 * chunk))

    def x_elements(self, shape, chunk: int = 8) -> np.ndarray:
        n = int(np.prod(shape))
        return self._uniform_mod_p(3 * n).reshape(tuple(shape) + (3,))

    def _uniform_mod_p(self, n: int) -> np.ndarray:
        """n uniform field elements from one bulk draw, vectorized:
        9 random bytes per element reduced via 2^64 ≡ 2^32 - 1 (mod p)."""
        raw = np.frombuffer(self.bytes(9 * n), dtype=np.uint8).reshape(n, 9)
        lo = raw[:, :8].copy().view("<u8").reshape(n)
        hi = raw[:, 8].astype(np.uint64)
        lo = np.where(lo >= f.P, lo - f.U64(f.P), lo)
        return f.add(f.mul(hi, f.U64(0xFFFFFFFF), np), lo, np)

    def salts(self, count: int, length: int = 24) -> list:
        return [self.bytes(length) for _ in range(count)]

    def salt_buffer(self, count: int, length: int = 24) -> bytes:
        """All salts in one draw (packed buffer, see merkle.SaltBuffer)."""
        return self.bytes(count * length)
