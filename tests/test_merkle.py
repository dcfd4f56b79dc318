"""Merkle commitment tests — the reference's exhaustive negative testing
pattern (ref test_merkle.py): wrong leaf, wrong index, wrong root, corrupted
path, wrong salt must all fail."""

import numpy as np

from stark_brainfuck_tpu.protocol.channel import encode_leaf
from stark_brainfuck_tpu.protocol.merkle import Merkle, SaltedMerkle

RNG = np.random.default_rng(11)


def make_leaves(n=32):
    return [encode_leaf(int(v)) for v in RNG.integers(0, 1 << 60, n)]


def test_merkle_roundtrip_and_negatives():
    leaves = make_leaves()
    tree = Merkle(leaves)
    root = tree.root()
    for idx in [0, 1, 17, 31]:
        path = tree.open(idx)
        assert Merkle.verify(root, idx, path, leaves[idx])
        # wrong leaf
        assert not Merkle.verify(root, idx, path, leaves[(idx + 1) % 32])
        # wrong index
        assert not Merkle.verify(root, idx ^ 1, path, leaves[idx])
        # wrong root
        assert not Merkle.verify(b"\x00" * 64, idx, path, leaves[idx])
        # corrupted path element
        bad = list(path)
        bad[0] = bytes(64)
        assert not Merkle.verify(root, idx, bad, leaves[idx])


def test_salted_merkle_roundtrip_and_negatives():
    leaves = make_leaves(16)
    salts = [bytes([i + 1]) * 24 for i in range(16)]
    payloads = [lf + s for lf, s in zip(leaves, salts)]
    tree = SaltedMerkle(payloads, salts)
    root = tree.root()
    for idx in [0, 5, 15]:
        salt, path = tree.open(idx)
        assert salt == salts[idx]
        assert SaltedMerkle.verify(root, idx, path, leaves[idx] + salt)
        # wrong salt
        assert not SaltedMerkle.verify(root, idx, path, leaves[idx] + bytes(24))
        # wrong leaf
        assert not SaltedMerkle.verify(
            root, idx, path, leaves[(idx + 1) % 16] + salt
        )
        # wrong index
        assert not SaltedMerkle.verify(root, idx ^ 1, path, leaves[idx] + salt)


def test_merkle_matches_reference_hashing_shape():
    """Same tree arity/path length as the reference (depth = log2 n)."""
    leaves = make_leaves(64)
    tree = Merkle(leaves)
    assert len(tree.open(0)) == 6
