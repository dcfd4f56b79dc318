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
        out = np.empty(int(np.prod(shape)), dtype=np.uint64)
        for i in range(out.size):
            out[i] = self.base_element()
        return out.reshape(shape)

    def x_element(self, chunk: int = 8) -> tuple:
        return xf.h_sample(self.bytes(3 * chunk))

    def x_elements(self, shape, chunk: int = 8) -> np.ndarray:
        n = int(np.prod(shape))
        out = np.empty((n, 3), dtype=np.uint64)
        for i in range(n):
            out[i] = self.x_element(chunk)
        return out.reshape(tuple(shape) + (3,))

    def salts(self, count: int, length: int = 24) -> list:
        return [self.bytes(length) for _ in range(count)]

    def salt_buffer(self, count: int, length: int = 24) -> bytes:
        """All salts in one draw (packed buffer, see merkle.SaltBuffer)."""
        return self.bytes(count * length)
