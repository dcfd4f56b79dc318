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
