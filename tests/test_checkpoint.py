"""Checkpoint/resume: trace save/load roundtrip and proof cache.

The reference's only persistence is the pickled-proof cache in its test
(ref test_brainfuck_stark.py:194-204); utils/checkpoint.py persists both
ends (trace .npz + finished proofs) and bench.py uses `simulate_cached`
for large traces.
"""

import numpy as np

from stark_brainfuck_tpu import StarkConfig, VirtualMachine
from stark_brainfuck_tpu.utils.checkpoint import (
    load_proof,
    load_trace,
    proof_key,
    save_proof,
    save_trace,
    simulate_cached,
    trace_key,
)


def test_trace_roundtrip(tmp_path):
    program = VirtualMachine.compile("++[->+<].")
    trace = VirtualMachine.simulate(program)
    save_trace(str(tmp_path), trace, program)
    loaded = load_trace(str(tmp_path), program)
    assert loaded is not None
    for k in ("processor", "memory", "instruction", "input", "output"):
        assert (np.asarray(loaded[k]) == np.asarray(trace[k])).all(), k
    assert loaded["output_data"] == trace["output_data"]


def test_load_trace_misses_on_different_program(tmp_path):
    p1 = VirtualMachine.compile("+++")
    p2 = VirtualMachine.compile("++++")
    save_trace(str(tmp_path), VirtualMachine.simulate(p1), p1)
    assert load_trace(str(tmp_path), p2) is None
    assert trace_key(p1) != trace_key(p2)


def test_simulate_cached_hits(tmp_path, monkeypatch):
    program = VirtualMachine.compile(",+.")
    first = simulate_cached(program, "a", directory=str(tmp_path))

    def boom(*a, **k):
        raise AssertionError("cache must be hit, not re-simulated")

    monkeypatch.setattr(VirtualMachine, "simulate", boom)
    second = simulate_cached(program, "a", directory=str(tmp_path))
    assert (second["processor"] == first["processor"]).all()
    assert second["output_data"] == first["output_data"]


def test_proof_cache_roundtrip(tmp_path):
    program = VirtualMachine.compile("+++.")
    cfg = StarkConfig(seed=0)
    key = proof_key(program, "", "x", cfg)
    assert load_proof(str(tmp_path), key) is None
    save_proof(str(tmp_path), key, b"proof-bytes")
    assert load_proof(str(tmp_path), key) == b"proof-bytes"
    # a different claim keys a different slot
    assert proof_key(program, "", "y", cfg) != key


def test_stage_level_prove_resume(tmp_path):
    """Seeded streamed prove persists per-stage commitment checkpoints; a
    'killed' run (simulated by a fresh BrainfuckStark over the same claim)
    resumes past the completed base/ext commit passes to a BYTE-IDENTICAL
    proof, and records which stages it skipped."""
    import os

    import numpy as np

    from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine

    src = ",+."
    program = VirtualMachine.compile(src)
    trace = VirtualMachine.simulate(program, "a")
    cdir = str(tmp_path / "ckpt")

    def build():
        return BrainfuckStark(
            trace["processor"].shape[0], trace["memory"].shape[0], program,
            "a", trace["output_data"],
            StarkConfig(seed=11, stream_min=1, stream_classes=4,
                        checkpoint_dir=cdir),
        )

    args = (trace["processor"], trace["memory"], trace["instruction"],
            trace["input"], trace["output"])

    bfs1 = build()
    proof1 = bfs1.prove(*args, xp=np)
    assert bfs1.last_commit_resumes == []
    files = sorted(os.listdir(cdir))
    assert [f.split("_")[-1] for f in files] == ["base.npz", "ext.npz"]

    # death after base commit: the ext checkpoint never got written
    os.remove(os.path.join(cdir, files[1]))
    bfs2 = build()
    proof2 = bfs2.prove(*args, xp=np)
    assert bfs2.last_commit_resumes == ["base"]
    assert proof2 == proof1, "resumed proof must be byte-identical"
    assert bfs2.verify(proof2)

    # full restart with both checkpoints present skips both passes
    bfs3 = build()
    proof3 = bfs3.prove(*args, xp=np)
    assert bfs3.last_commit_resumes == ["base", "ext"]
    assert proof3 == proof1


def test_unseeded_prove_never_reuses_commitments(tmp_path):
    """Without a seed the prover draws real randomness — stage checkpoints
    must not be written or read (stale salts would leak/break)."""
    import os

    import numpy as np

    from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine

    program = VirtualMachine.compile("++")
    trace = VirtualMachine.simulate(program)
    cdir = str(tmp_path / "ckpt")
    bfs = BrainfuckStark(
        trace["processor"].shape[0], trace["memory"].shape[0], program,
        "", trace["output_data"],
        StarkConfig(stream_min=1, stream_classes=4, checkpoint_dir=cdir),
    )
    bfs.prove(trace["processor"], trace["memory"], trace["instruction"],
              trace["input"], trace["output"], xp=np)
    assert bfs.last_commit_resumes == []
    assert not os.path.exists(cdir) or os.listdir(cdir) == []
