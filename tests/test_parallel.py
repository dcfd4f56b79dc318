"""Sharded-kernel tests on the virtual 8-device CPU mesh: distributed
four-step NTT vs the single-device butterfly network, sharded prover core
vs the unsharded stages, and mesh-shape determinism (the framework's
'race detector' — proof math must be invariant to how work is sharded,
SURVEY §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stark_brainfuck_tpu.ops import field as f
from stark_brainfuck_tpu.ops import ntt as nt
from stark_brainfuck_tpu.parallel.dntt import (
    distributed_coset_evaluate,
    distributed_ntt,
)
from stark_brainfuck_tpu.parallel.mesh import make_mesh

RNG = np.random.default_rng(41)

# Every test here jit-compiles shard_map programs on the virtual CPU mesh —
# seconds of math under minutes of XLA compile. They are correctness gates,
# not quick checks: the whole module is `slow` tier (round-4 verdict item 7;
# the fast tier must stay under a few minutes cold).
pytestmark = pytest.mark.slow

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_devices
@pytest.mark.parametrize("logn", [10, 12])
def test_distributed_ntt_matches_single_device(logn):
    n = 1 << logn
    root = f.primitive_nth_root(n)
    x = RNG.integers(0, f.P, size=(3, n), dtype=np.uint64)
    mesh = make_mesh(8)
    got = np.asarray(distributed_ntt(jnp.asarray(x), root, mesh))
    want = np.asarray(nt.ntt(x, root, np))
    assert np.array_equal(got, want)


@needs_devices
def test_distributed_ntt_mesh_shape_invariant():
    n = 1 << 10
    root = f.primitive_nth_root(n)
    x = RNG.integers(0, f.P, size=(2, n), dtype=np.uint64)
    outs = []
    for d in [2, 4, 8]:
        mesh = make_mesh(d)
        outs.append(np.asarray(distributed_ntt(jnp.asarray(x), root, mesh)))
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[1], outs[2])


@needs_devices
def test_distributed_coset_evaluate():
    n, d = 1 << 10, 200
    root = f.primitive_nth_root(n)
    coeffs = RNG.integers(0, f.P, size=(2, d), dtype=np.uint64)
    mesh = make_mesh(4)
    got = np.asarray(
        distributed_coset_evaluate(jnp.asarray(coeffs), f.GENERATOR, root, n, mesh)
    )
    want = np.asarray(nt.coset_evaluate(coeffs, f.GENERATOR, root, n, np))
    assert np.array_equal(got, want)


@needs_devices
def test_sharded_prove_core_matches_unsharded():
    """The full prover core under an 8-device mesh must produce the same
    combination codeword as the single-device run (proof-bytes determinism
    across shardings)."""
    from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine
    from stark_brainfuck_tpu.parallel.prover import (
        dryrun_sharded_prove,
        make_prove_core,
        prove_core_inputs,
    )

    program = VirtualMachine.compile("++++")
    trace = VirtualMachine.simulate(program)

    def run(mesh_size):
        bfs = BrainfuckStark(
            trace["processor"].shape[0], trace["memory"].shape[0], program,
            "", trace["output_data"], StarkConfig(seed=0),
        )
        if mesh_size is None:
            inputs = prove_core_inputs(bfs, trace, seed=0, xp=jnp)
            core = jax.jit(make_prove_core(bfs, mesh=None, xp=jnp))
            acc, _ = core(
                inputs["mats"], inputs["rand_coeffs"], inputs["base_rands"],
                inputs["ext_rands"], inputs["challenges"], inputs["initials"],
                inputs["weights"], inputs["shift_ratios"],
                inputs["offset_pows"], inputs["zinv_flat"],
                inputs["terminals"], inputs["packs"],
            )
            return np.asarray(acc)
        return dryrun_sharded_prove(mesh_size, "++++", seed=0)

    unsharded = run(None)
    sharded = run(8)
    assert np.array_equal(unsharded, sharded)


@needs_devices
@pytest.mark.slow
def test_prove_bytes_mesh_invariant():
    """Full production prove() under mesh sizes 1/2/8 on a >=2^10-cycle
    trace: the serialized proof BYTES must be identical — the strongest
    form of the sharding-determinism ('race detector') guarantee, and the
    multi-chip path the driver dry-runs (__graft_entry__.dryrun_multichip).
    """
    from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine

    # largest counter program whose runtime + program length stays inside
    # the 2^10 bucket (same construction as bench.py)
    inner = "[->" + "+" * 32 + "[-]<]"
    lo, hi = 1, 64
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        program = VirtualMachine.compile("+" * mid + inner)
        rt, _, _ = VirtualMachine.run(program)
        if rt + len(program) < (1 << 10):
            lo = mid
        else:
            hi = mid
    src = "+" * lo + inner
    program = VirtualMachine.compile(src)
    trace = VirtualMachine.simulate(program)
    assert trace["processor"].shape[0] >= (1 << 9)

    def run(mesh_shape):
        bfs = BrainfuckStark(
            trace["processor"].shape[0], trace["memory"].shape[0], program,
            "", trace["output_data"],
            StarkConfig(seed=0, mesh_shape=mesh_shape),
        )
        proof = bfs.prove(
            trace["processor"], trace["memory"], trace["instruction"],
            trace["input"], trace["output"],
        )
        assert bfs.verify(proof)
        return proof

    p1 = run(None)
    p2 = run((("shard", 2),))
    p8 = run((("shard", 8),))
    assert p1 == p2 == p8
