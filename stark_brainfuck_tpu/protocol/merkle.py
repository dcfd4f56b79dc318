"""Merkle commitments over canonical leaf byte encodings.

Shape matches ref `merkle.py` / `salted_merkle.py` (blake2b, heap-array
nodes, index-bit-walk auth paths, 24-byte salts for ZK leaf hiding), but
leaves are canonical fixed-width byte strings (see `channel.py` encoders)
instead of pickled python objects, and leaf hashing runs over a contiguous
(num_leafs, leaf_len) u8 buffer — the layout a native/vectorized hasher
consumes directly.
"""

from __future__ import annotations

from hashlib import blake2b
from typing import List, Optional, Sequence

import numpy as np


def _hash_leaves(leaf_bytes: Sequence[bytes]) -> List[bytes]:
    return [blake2b(lb).digest() for lb in leaf_bytes]


def _build_nodes(leaf_hashes: List[bytes]) -> List[bytes]:
    n = len(leaf_hashes)
    assert n & (n - 1) == 0 and n > 0, "number of leaves must be a power of two"
    nodes: List[Optional[bytes]] = [b"\x00" * 32] * (2 * n)
    nodes[n : 2 * n] = leaf_hashes
    for i in range(n - 1, 0, -1):
        nodes[i] = blake2b(nodes[2 * i] + nodes[2 * i + 1]).digest()
    return nodes


class Merkle:
    """Plain Merkle tree (used for combination codeword + FRI rounds,
    ref merkle.py:7-63)."""

    def __init__(self, leaf_bytes: Sequence[bytes]):
        self.num_leafs = len(leaf_bytes)
        self.depth = (self.num_leafs - 1).bit_length() if self.num_leafs > 1 else 0
        self.nodes = _build_nodes(_hash_leaves(leaf_bytes))

    def root(self) -> bytes:
        return self.nodes[1]

    def open(self, index: int) -> List[bytes]:
        path = []
        index = (1 << self.depth) | index
        while index > 1:
            path.append(self.nodes[index ^ 1])
            index >>= 1
        return path

    @staticmethod
    def verify(root: bytes, index: int, path: List[bytes], leaf: bytes) -> bool:
        running = blake2b(leaf).digest()
        for node in path:
            if index % 2 == 0:
                running = blake2b(running + node).digest()
            else:
                running = blake2b(node + running).digest()
            index >>= 1
        return running == root


class SaltedMerkle:
    """Merkle tree with a 24-byte salt hashed into every leaf — ZK hiding for
    the base/extension commitments (ref salted_merkle.py:7-68).

    `salted_payloads[i]` is the exact blake2b input for leaf i (the codec
    decides how element+salt combine — raw concatenation for the native
    format, pickled parts for reference interop)."""

    SALT_LEN = 24

    def __init__(self, salted_payloads: Sequence[bytes], salts: Sequence[bytes]):
        assert len(salted_payloads) == len(salts)
        self.num_leafs = len(salted_payloads)
        self.depth = (self.num_leafs - 1).bit_length() if self.num_leafs > 1 else 0
        self.salts = list(salts)
        hashes = [blake2b(p).digest() for p in salted_payloads]
        self.nodes = _build_nodes(hashes)

    def root(self) -> bytes:
        return self.nodes[1]

    def open(self, index: int):
        salt = self.salts[index]
        path = []
        index = (1 << self.depth) | index
        while index > 1:
            path.append(self.nodes[index ^ 1])
            index >>= 1
        return salt, path

    @staticmethod
    def verify(
        root: bytes, index: int, path: List[bytes], salted_payload: bytes
    ) -> bool:
        running = blake2b(salted_payload).digest()
        for node in path:
            if index % 2 == 0:
                running = blake2b(running + node).digest()
            else:
                running = blake2b(node + running).digest()
            index >>= 1
        return running == root
