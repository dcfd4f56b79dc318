"""Sharded prover core: the full device-side algebraic pipeline under a mesh.

`algebraic_prove_core` composes the three jittable prover stages (base LDE →
extend+ext LDE → quotients+combination) into ONE function with optional
sharding constraints on every codeword-scale intermediate. Under a
`jax.sharding.Mesh` the FRI-domain axis is partitioned across devices and
XLA inserts the collectives (all-to-alls for the NTT index mixing, halo
exchange for the transition-row shift, all-gathers where needed).

This is both the multi-chip dry-run entry (driver-validated on a virtual CPU
mesh) and the scaffold the dedicated shard_map kernels (dntt.py) plug into.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops import field as f
from ..protocol.stark import BrainfuckStark
from ..utils.rng import Rng
from .mesh import codeword_spec

U64 = np.uint64


def prove_core_inputs(bfs: BrainfuckStark, trace, seed: int = 0, xp=None):
    """Host-side preparation of every array input to the algebraic core
    (randomness, challenge stand-ins, degree-shift tables)."""
    if xp is None:
        import jax.numpy as xp
    rng = Rng(seed)
    matrices = [
        trace["processor"], trace["instruction"], trace["memory"],
        trace["input"], trace["output"],
    ]
    for t, m in zip(bfs.tables, matrices):
        t.matrix = np.asarray(m, dtype=U64).reshape(-1, t.base_width)
        if len(t.matrix) > 0:
            t.pad()
    mats = tuple(xp.asarray(t.matrix) for t in bfs.tables)

    rand_coeffs = xp.asarray(rng.x_elements((bfs.max_degree + 1,), chunk=9))
    base_rands = tuple(
        xp.asarray(rng.base_elements((t.base_width, t.num_randomizers)))
        if t.num_randomizers > 0 and t.height > 0 else None
        for t in bfs.tables
    )
    ext_rands = tuple(
        xp.asarray(rng.x_elements((t.num_ext_columns, t.num_randomizers)))
        if t.num_randomizers > 0 and t.height > 0 else None
        for t in bfs.tables
    )
    challenges = xp.asarray(rng.x_elements((11,)))
    initials = xp.asarray(rng.x_elements((2,)))

    # stand-in terminals/bounds: real proving derives these between stages;
    # for the compile-check core we use placeholder terminals (the graph
    # structure is identical)
    challenges_h = [tuple(int(v) for v in np.asarray(challenges)[i]) for i in range(11)]
    terminals_h = [(0, 0, 0)] * 5
    qdb = []
    for t in bfs.tables:
        qdb += t.all_quotient_degree_bounds(challenges_h, terminals_h)
    for pa in bfs.permutation_arguments:
        qdb.append(pa.quotient_degree_bound())
    all_bounds = bfs._base_degree_bounds() + bfs._ext_degree_bounds() + qdb
    shifts = xp.asarray(
        np.asarray([bfs.max_degree - b for b in all_bounds], dtype=np.int64)
    )
    offset_pows = xp.asarray(
        np.asarray(
            [f.h_pow(bfs.fri.domain.offset, bfs.max_degree - b) for b in all_bounds],
            dtype=U64,
        )
    )
    num_terms = len(all_bounds)
    weights = xp.asarray(rng.x_elements((1 + 2 * num_terms,)))
    terminals = xp.asarray(np.asarray(terminals_h, dtype=U64))
    zinv = bfs._zerofier_inverses(xp)
    # launder through host: the zerofier builder runs as an AOT-exported
    # module whose outputs carry pinned single-device shardings, which
    # conflict with the dry-run's multi-device sharding constraints
    # (tiny dry-run/entry shapes — the copy is negligible)
    zinv_flat = tuple(
        xp.asarray(np.asarray(zinv[t.height][k]))
        for t in bfs.tables
        for k in ("boundary", "transition", "terminal")
    )
    shift_ratios = bfs._shift_ratios(np.asarray(shifts), xp)
    packs = bfs._lde_packs(xp)
    return dict(
        mats=mats, rand_coeffs=rand_coeffs, base_rands=base_rands,
        ext_rands=ext_rands, challenges=challenges, initials=initials,
        weights=weights, shifts=shifts, offset_pows=offset_pows,
        shift_ratios=shift_ratios, zinv_flat=zinv_flat, terminals=terminals,
        packs=packs,
    )


def make_prove_core(bfs: BrainfuckStark, mesh=None, xp=None):
    """Returns a single jittable function running LDE → extend → quotients →
    combination. With a mesh, codeword-scale intermediates carry sharding
    constraints over the FRI-domain axis."""
    if xp is None:
        import jax.numpy as xp

    def constrain(arr, sharded_axis):
        if mesh is None:
            return arr
        import jax

        return jax.lax.with_sharding_constraint(
            arr, codeword_spec(mesh, arr.ndim, sharded_axis)
        )

    def prove_core(
        mats, rand_coeffs, base_rands, ext_rands, challenges, initials,
        weights, shift_ratios, offset_pows, zinv_flat, terminals,
        packs,
    ):
        rand_cw, base_cws = bfs._stage_base_lde(
            mats, rand_coeffs, base_rands, packs, xp
        )
        rand_cw = constrain(rand_cw, 0)
        base_cws = tuple(constrain(cw, 1) for cw in base_cws)
        # extension columns in-graph (scans at tiny dry-run shapes), then
        # the shared ext LDE stage
        xcols = []
        term_arrays = []
        for t, m in zip(bfs.tables, mats):
            cols, terms = t.extend_pure(m, challenges, initials, xp)
            xcols.append(cols)
            term_arrays.append(terms)
        ext_cws = bfs._stage_ext_lde(tuple(xcols), ext_rands, packs, xp)
        ext_cws = tuple(constrain(cw, 1) for cw in ext_cws)
        acc = bfs._stage_combination(
            rand_cw, base_cws, ext_cws, challenges, terminals, weights,
            shift_ratios, offset_pows, zinv_flat, xp,
        )
        return constrain(acc, 0), term_arrays

    return prove_core


def dryrun_sharded_prove(n_devices: int, src: str = "++++", seed: int = 0):
    """Build a mesh over n devices, jit the full prover core with real
    codeword shardings, and run one step on tiny shapes."""
    import jax
    import jax.numpy as jnp

    from ..config import StarkConfig
    from ..vm.machine import VirtualMachine
    from .mesh import make_mesh

    program = VirtualMachine.compile(src)
    trace = VirtualMachine.simulate(program)
    bfs = BrainfuckStark(
        trace["processor"].shape[0], trace["memory"].shape[0], program, "",
        trace["output_data"], StarkConfig(seed=seed),
    )
    mesh = make_mesh(n_devices)
    inputs = prove_core_inputs(bfs, trace, seed=seed, xp=jnp)
    core = jax.jit(make_prove_core(bfs, mesh=mesh, xp=jnp))
    with mesh:
        acc, terms = core(
            inputs["mats"], inputs["rand_coeffs"], inputs["base_rands"],
            inputs["ext_rands"], inputs["challenges"], inputs["initials"],
            inputs["weights"], inputs["shift_ratios"], inputs["offset_pows"],
            inputs["zinv_flat"], inputs["terminals"],
            inputs["packs"],
        )
        jax.block_until_ready(acc)
    return np.asarray(acc)
