"""Multi-process execution seam (BASELINE config 5 stand-in).

The sandbox has one TPU host, so the multi-host path is validated the only
way it allows: N CPU processes x M virtual devices each, joined with
`jax.distributed.initialize` on localhost, running the sharded prover core
over the global mesh. The result must be process-layout-invariant and
equal to the single-process mesh run — the determinism gate that plays the
cross-host race-detector role (SURVEY §5)."""

import hashlib

import numpy as np
import pytest

from stark_brainfuck_tpu.parallel.multihost import spawn_dryrun


@pytest.mark.slow
def test_multiprocess_core_matches_single_process():
    # single-process 2-virtual-device digest (this process: 8 CPU devices
    # via conftest XLA_FLAGS; mesh over the first 2)
    from stark_brainfuck_tpu.parallel.prover import dryrun_sharded_prove

    acc = dryrun_sharded_prove(2, seed=0)
    single = hashlib.sha256(
        np.ascontiguousarray(np.asarray(acc).astype("<u8")).tobytes()
    ).hexdigest()

    multi = spawn_dryrun(num_processes=2, seed=0)
    assert multi == single, (
        "2-process x 1-device global mesh must reproduce the single-process "
        "2-device result bit-exactly"
    )


@pytest.mark.slow
def test_multiprocess_full_prove_bytes_match_single_process():
    """The COMPLETE prove() — device commitments, Fiat-Shamir transcript,
    FRI, openings, serialization — across 2 localhost processes (every
    codeword-scale array sharded over the global 2-device mesh, every
    host→device upload a replicated global array via GlobalXp, every
    host fetch through to_host's replicate-then-read collective). The
    proof BYTES must equal the plain single-process run: the transcript
    host logic is SPMD-identical on every process (r4 verdict item 4 —
    previously only the algebraic core had crossed processes)."""
    from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine

    program = VirtualMachine.compile("++++")
    t = VirtualMachine.simulate(program)
    bfs = BrainfuckStark(
        t["processor"].shape[0], t["memory"].shape[0], program, "",
        t["output_data"],
        # device_commit_min lowered so the tiny trace exercises the device
        # commitment path (same override run_full_prove_global applies)
        StarkConfig(seed=0, device_commit_min=1024),
    )
    proof = bfs.prove(
        t["processor"], t["memory"], t["instruction"], t["input"],
        t["output"],
    )
    assert bfs.verify(proof)
    single = hashlib.sha256(proof).hexdigest()

    multi = spawn_dryrun(num_processes=2, mode="prove", seed=0)
    assert multi == single, (
        "2-process full prove must serialize byte-identically to the "
        "single-process prove"
    )
