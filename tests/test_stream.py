"""Streamed (strided-block) commitments must be bit-identical to the
resident device trees — roots, auth paths, salts, opened rows."""

import numpy as np
import pytest

from stark_brainfuck_tpu.ops import field as f
from stark_brainfuck_tpu.ops import ntt as nt
from stark_brainfuck_tpu.protocol.device_merkle import (
    DeviceMerkle,
    DeviceSaltedMerkle,
    salt_words,
)
from stark_brainfuck_tpu.protocol.stream import (
    make_stream_plan,
    reopen_rows,
    streamed_commit,
)

U64 = np.uint64


def _setup(N=2048, B=8, seed=0, xp=np):
    """Random offset-prescaled coefficient groups + the full-domain
    codeword rows they evaluate to."""
    rng = np.random.default_rng(seed)
    omega = f.primitive_nth_root(N)
    offset = f.GENERATOR
    scale = nt.scale_table(offset, N, np)
    groups_np = []
    for d in (N // 4, N // 8 + 1, 3):  # mixed degrees incl. a fold (d > S?)
        raw = rng.integers(0, f.P, (2, d), dtype=np.uint64)
        groups_np.append(f.mul(raw, scale[:d], np))
    pack_N = nt.make_pack(N, omega, False, np)
    rows_full = []
    for g in groups_np:
        padded = np.concatenate(
            [g, np.zeros((g.shape[0], N - g.shape[1]), dtype=U64)], axis=1
        )
        rows_full.append(nt.ntt_with(padded, pack_N, np))
    values = np.concatenate(rows_full, axis=0)  # (k, N)
    zipped = np.ascontiguousarray(values.T)  # (N, k)
    plan = make_stream_plan(N, B, omega, xp)
    groups = tuple(xp.asarray(g) for g in groups_np)
    return groups, zipped, plan, omega


@pytest.mark.parametrize("B", [2, 8])
def test_streamed_plain_tree_matches_resident(B):
    groups, zipped, plan, _ = _setup(B=B)
    resident = DeviceMerkle(zipped, np, cut=2)
    streamed = streamed_commit(groups, None, plan, np)
    assert streamed.root() == resident.root()

    idx = [0, 1, 5, 1023, 2047, 777]
    streamed.resolve(idx, reopen_rows(groups, plan, np))
    resident.prefetch(idx)
    streamed.prefetch(idx)
    for i in idx:
        assert streamed.open(i) == resident.open(i)
        assert np.array_equal(streamed.row_at(i), resident.row_at(i))


def test_streamed_salted_tree_matches_resident():
    groups, zipped, plan, _ = _setup(B=4)
    key = b"0123456789abcdef"
    N = zipped.shape[0]
    salts = salt_words(key, N, np)
    resident = DeviceSaltedMerkle(zipped, salts, np, cut=2)
    streamed = streamed_commit(groups, key, plan, np)
    assert streamed.root() == resident.root()

    idx = [3, 512, 2046]
    streamed.resolve(idx, reopen_rows(groups, plan, np))
    resident.prefetch(idx)
    streamed.prefetch(idx)
    for i in idx:
        s_salt, s_path = streamed.open(i)
        r_salt, r_path = resident.open(i)
        assert s_salt == r_salt
        assert s_path == r_path


def test_streamed_tree_jax_matches_numpy():
    import jax.numpy as jnp

    groups_np, zipped, plan_np, omega = _setup(B=8)
    streamed_np = streamed_commit(groups_np, None, plan_np, np)
    N = zipped.shape[0]
    plan_j = make_stream_plan(N, 8, omega, jnp)
    groups_j = tuple(jnp.asarray(np.asarray(g)) for g in groups_np)
    streamed_j = streamed_commit(groups_j, None, plan_j, jnp)
    assert streamed_j.root() == streamed_np.root()

    idx = [17, 900]
    streamed_np.resolve(idx, reopen_rows(groups_np, plan_np, np))
    streamed_j.resolve(idx, reopen_rows(groups_j, plan_j, jnp))
    streamed_np.prefetch(idx)
    streamed_j.prefetch(idx)
    for i in idx:
        assert streamed_j.open(i) == streamed_np.open(i)


def _prove_with_config(src, cfg, inp="", xp=np):
    from stark_brainfuck_tpu import BrainfuckStark, VirtualMachine

    program = VirtualMachine.compile(src)
    trace = VirtualMachine.simulate(program, inp)
    bfs = BrainfuckStark(
        running_time=trace["processor"].shape[0],
        memory_length=trace["memory"].shape[0],
        program=program,
        input_symbols=inp,
        output_symbols=trace["output_data"],
        config=cfg,
    )
    proof = bfs.prove(
        trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"], xp=xp,
    )
    return bfs, proof


@pytest.mark.slow
@pytest.mark.parametrize("src,inp", [(",+.", "a"), ("+" * 6 + "[->++<]", "")])
def test_streamed_prove_matches_resident(src, inp):
    """Full streamed prove (strided-block commits + streamed combination +
    second-pass reopen) must produce byte-identical proofs to the resident
    prover and verify."""
    from stark_brainfuck_tpu import StarkConfig

    base = StarkConfig(seed=11)
    streamed = StarkConfig(seed=11, stream_min=1, stream_classes=4)
    bfs_r, proof_r = _prove_with_config(src, base, inp)
    bfs_s, proof_s = _prove_with_config(src, streamed, inp)
    assert bfs_s.fri.domain.length >= 1, "sanity"
    assert proof_s == proof_r, "streamed transcript must match resident"
    assert bfs_s.verify(proof_s)
    assert bfs_r.verify(proof_s)
