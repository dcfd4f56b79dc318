"""FRI accept/reject tests (ref test_fri.py pattern): a valid low-degree
codeword is accepted; a corrupted one is rejected."""

import numpy as np
import pytest

from stark_brainfuck_tpu.ops import field as f
from stark_brainfuck_tpu.protocol.channel import ProofStream
from stark_brainfuck_tpu.protocol.fri import Fri

RNG = np.random.default_rng(23)


def make_fri(n=256, expansion=4):
    omega = f.primitive_nth_root(n)
    return Fri(f.GENERATOR, omega, n, expansion, num_colinearity_tests=8)


def low_degree_codeword(fri):
    n = fri.domain.length
    degree = n // fri.expansion_factor - 1
    coeffs = RNG.integers(0, f.P, size=(degree + 1, 3), dtype=np.uint64)
    return np.asarray(fri.domain.xevaluate(coeffs, np))


def test_fri_accepts_low_degree():
    fri = make_fri()
    cw = low_degree_codeword(fri)
    ps = ProofStream()
    fri.prove(cw, ps)
    proof = ps.serialize()
    vs = ProofStream.deserialize(proof)
    from stark_brainfuck_tpu.protocol.merkle import Merkle
    from stark_brainfuck_tpu.protocol.channel import encode_leaf

    root = Merkle(
        [encode_leaf(tuple(int(v) for v in row)) for row in cw]
    ).root()
    assert fri.verify(vs, root)


def test_fri_rejects_high_degree():
    fri = make_fri()
    n = fri.domain.length
    # full-degree random codeword — exceeds the rate bound
    cw = RNG.integers(0, f.P, size=(n, 3), dtype=np.uint64)
    ps = ProofStream()
    fri.prove(cw, ps)
    vs = ProofStream.deserialize(ps.serialize())
    from stark_brainfuck_tpu.protocol.merkle import Merkle
    from stark_brainfuck_tpu.protocol.channel import encode_leaf

    root = Merkle(
        [encode_leaf(tuple(int(v) for v in row)) for row in cw]
    ).root()
    assert not fri.verify(vs, root)


def test_fri_rejects_corrupted_low_order_coeffs():
    """The reference's corruption pattern: zero a few low-order coefficients
    after evaluation tampers the codeword (ref test_fri.py:30-59)."""
    fri = make_fri()
    cw = low_degree_codeword(fri).copy()
    for i in range(4):
        cw[i] = 0  # pointwise corruption
    ps = ProofStream()
    fri.prove(cw, ps)
    vs = ProofStream.deserialize(ps.serialize())
    from stark_brainfuck_tpu.protocol.merkle import Merkle
    from stark_brainfuck_tpu.protocol.channel import encode_leaf

    root = Merkle(
        [encode_leaf(tuple(int(v) for v in row)) for row in cw]
    ).root()
    assert not fri.verify(vs, root)


def test_domain_base_evaluate_interpolate_roundtrip():
    """FriDomain.evaluate/interpolate (base-field variants, ref fri.py:26-37)
    invert each other and agree with naive pointwise evaluation."""
    fri = make_fri(n=64)
    d = fri.domain
    coeffs = RNG.integers(0, f.P, size=(17,), dtype=np.uint64)
    values = np.asarray(d.evaluate(coeffs, np))
    # naive check at a few points
    for i in [0, 1, 5, 63]:
        x = d(i)
        acc, xp_pow = 0, 1
        for c in coeffs:
            acc = (acc + int(c) * xp_pow) % f.P
            xp_pow = (xp_pow * x) % f.P
        assert int(values[i]) == acc
    back = np.asarray(d.interpolate(values, np))
    assert np.all(back[:17] == coeffs) and np.all(back[17:] == 0)
