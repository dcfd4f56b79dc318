"""Host polynomial layer tests (reference univariate.py parity) + the
DEBUG degree-check machinery."""

import numpy as np
import pytest

from stark_brainfuck_tpu.ops import field as f
from stark_brainfuck_tpu.ops import poly as pl

RNG = np.random.default_rng(31)


def rand_poly(d):
    return [int(v) for v in RNG.integers(0, f.P, d + 1, dtype=np.uint64)]


def test_divide_roundtrip():
    a = rand_poly(7)
    b = rand_poly(3)
    q, r = pl.divide(a, b)
    back = pl.add(pl.mul(q, b), r)
    assert pl.trim(back) == pl.trim(a)
    assert pl.degree(r) < pl.degree(b)


def test_xgcd_bezout():
    a = rand_poly(5)
    b = rand_poly(3)
    s, t, g = pl.xgcd(a, b)
    lhs = pl.add(pl.mul(s, a), pl.mul(t, b))
    assert pl.trim(lhs) == pl.trim(g)


def test_interpolate_evaluate_roundtrip():
    xs = [int(v) for v in RNG.choice(np.arange(1, 1000), 8, replace=False)]
    ys = [int(v) for v in RNG.integers(0, f.P, 8, dtype=np.uint64)]
    coeffs = pl.interpolate(xs, ys)
    assert pl.degree(coeffs) < 8
    assert pl.evaluate_domain(coeffs, xs) == ys


def test_zerofier_vanishes():
    xs = [3, 17, 99]
    z = pl.zerofier(xs)
    assert pl.degree(z) == 3
    for x in xs:
        assert pl.evaluate(z, x) == 0


def test_colinearity():
    # y = 5x + 7
    pts = [(1, 12), (2, 17), (10, 57)]
    assert pl.test_colinearity(pts)
    assert not pl.test_colinearity([(1, 12), (2, 17), (10, 58)])


def test_debug_degree_checks_pass_on_honest_prove():
    from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine

    program = VirtualMachine.compile("+>[+<-]")
    trace = VirtualMachine.simulate(program)
    bfs = BrainfuckStark(
        trace["processor"].shape[0], trace["memory"].shape[0], program, "",
        trace["output_data"],
        StarkConfig(seed=0, debug_degree_checks=True),
    )
    proof = bfs.prove(
        trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"], xp=np,
    )
    assert bfs.verify(proof)
