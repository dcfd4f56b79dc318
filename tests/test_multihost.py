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
