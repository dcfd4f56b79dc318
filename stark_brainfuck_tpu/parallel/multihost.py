"""Multi-host (multi-process) execution seam.

The reference is strictly single-process (SURVEY §2: no distributed
communication backend of any kind); this module is the new first-class
layer that lets the sharded prover core (parallel/prover.py) span JAX
*processes* — the TPU-native stand-in for a multi-host pod slice, where
each host drives its local chips and XLA collectives ride ICI within a
slice and DCN across slices.

Design (see also docs/DESIGN.md "Multi-host"):

  - `jax.distributed.initialize` forms the process group; afterwards
    `jax.devices()` is the GLOBAL device list, so `mesh.make_mesh` and the
    sharding specs work unchanged — the mesh axis simply spans hosts.
  - Every host runs the SAME program (multi-controller SPMD). All prover
    inputs are host-deterministic (seeded Rng, trace matrices), so each
    process materializes identical host values and `replicate_tree` turns
    them into fully-replicated global jax.Arrays via `jax.device_put`
    (legal in multi-controller JAX precisely because the value is the
    same everywhere).
  - Codeword-scale intermediates carry FRI-domain-axis sharding
    constraints exactly as in single-process mesh runs; XLA partitions
    them across *all* hosts' devices and inserts ICI/DCN collectives.
  - Small host-bound results (Merkle roots, terminals, the dry-run's
    combination codeword) come back via `fetch_global`, which allgathers
    non-addressable shards so every host sees the full value — the
    transcript stays bit-identical on every host because every
    Fiat-Shamir input is.

The environment (and CI) has no second TPU host, so the multi-process
path is validated the only way this sandbox allows: N CPU processes on
localhost (`spawn_dryrun`; one device per process — JAX ignores
`--xla_force_host_platform_device_count` under `jax.distributed`),
asserting the sharded core's output digest is process-layout-invariant
and equal to the single-process mesh run (tests/test_multihost.py).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
from typing import Optional

import numpy as np


def init_from_env() -> bool:
    """Join a jax process group when the STARK_COORDINATOR env seam is set.

    Env: STARK_COORDINATOR=host:port, STARK_NUM_PROCESSES, STARK_PROCESS_ID.
    Returns True when distributed mode was initialized. Must run before
    any other jax API touches the backend."""
    coord = os.environ.get("STARK_COORDINATOR")
    if not coord:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["STARK_NUM_PROCESSES"]),
        process_id=int(os.environ["STARK_PROCESS_ID"]),
    )
    return True


def to_host(tree):
    """Host numpy value(s) of device arrays, valid across processes.

    Single-process: plain device_get. Multi-process: a global array may
    have non-addressable shards, so each such leaf is first resharded to
    fully-replicated via a jitted identity with replicated out_shardings
    (a collective every process executes — host logic is SPMD-identical
    on all processes, so the calls line up), then read locally. This is
    the one primitive the full multi-process prove() needs at its
    host-fetch points (Merkle tops, opening prefetch, FRI host tail,
    terminals)."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if jax.process_count() == 1:
        return jax.tree_util.tree_unflatten(treedef, jax.device_get(leaves))
    from jax.sharding import NamedSharding, PartitionSpec

    out = []
    for a in leaves:
        if not hasattr(a, "sharding") or a.is_fully_addressable:
            out.append(np.asarray(a))
            continue
        rep = jax.jit(
            lambda t: t,
            out_shardings=NamedSharding(
                a.sharding.mesh, PartitionSpec()
            ),
        )(a)
        out.append(np.asarray(rep.addressable_data(0)))
    return jax.tree_util.tree_unflatten(treedef, out)


class GlobalXp:
    """jax.numpy-compatible namespace whose EAGER array-creation ops
    produce fully-replicated global arrays over a (possibly
    multi-process) mesh.

    The prover threads `xp` through every stage, tree and codec, so
    passing `GlobalXp(mesh)` as prove(..., xp=...) turns every host→device
    upload (trace matrices, challenges, Fiat-Shamir weights, NTT packs,
    FRI fold seeds) into a replicated global array — the form
    multi-controller jit requires for inputs — with no per-site changes.
    Under an active trace the creations delegate to plain jnp (they are
    graph constants there, not uploads); everything else delegates to
    jax.numpy via __getattr__."""

    def __init__(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec

        self.mesh = mesh
        self._sharding = NamedSharding(mesh, PartitionSpec())

    def __getattr__(self, name):
        import jax.numpy as jnp

        return getattr(jnp, name)

    def _tracing(self) -> bool:
        try:
            from jax._src import core as _core

            return not _core.trace_state_clean()
        except Exception:
            return False

    def _put(self, host):
        import jax

        return jax.device_put(host, self._sharding)

    def asarray(self, x, dtype=None):
        import jax
        import jax.numpy as jnp
        from jax._src import core as _core

        if (
            isinstance(x, jax.Array)
            or isinstance(x, _core.Tracer)
            or self._tracing()
        ):
            return jnp.asarray(x) if dtype is None else jnp.asarray(x, dtype)
        return self._put(np.asarray(x) if dtype is None
                         else np.asarray(x, dtype))

    def zeros(self, shape, dtype=None):
        import jax.numpy as jnp

        if self._tracing():
            return jnp.zeros(shape, dtype)
        return self._put(np.zeros(shape, dtype))

    def ones(self, shape, dtype=None):
        import jax.numpy as jnp

        if self._tracing():
            return jnp.ones(shape, dtype)
        return self._put(np.ones(shape, dtype))

    def arange(self, *args, **kwargs):
        import jax.numpy as jnp

        if self._tracing():
            return jnp.arange(*args, **kwargs)
        return self._put(np.arange(*args, **kwargs))


def replicate_tree(tree, mesh):
    """device_put every array leaf as a fully-replicated global array over
    `mesh` (which may span processes). Each process must hold the SAME
    host value — true for all prover inputs, which are seeded/derived
    deterministically."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec())

    def put(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, tree)


def fetch_global(arr) -> np.ndarray:
    """Full host value of a (possibly cross-process sharded) array on every
    process. Single-process arrays take the plain device_get path."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(jax.device_get(arr))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def run_core_global(seed: int = 0, src: str = "++++") -> np.ndarray:
    """The sharded prover core over a mesh of ALL global devices (however
    many processes contribute them); returns the full combination
    codeword on every host."""
    import jax

    from ..config import StarkConfig
    from ..protocol.stark import BrainfuckStark
    from ..vm.machine import VirtualMachine
    from .mesh import make_mesh
    from .prover import make_prove_core, prove_core_inputs

    import jax.numpy as jnp

    program = VirtualMachine.compile(src)
    trace = VirtualMachine.simulate(program)
    bfs = BrainfuckStark(
        trace["processor"].shape[0], trace["memory"].shape[0], program, "",
        trace["output_data"], StarkConfig(seed=seed),
    )
    mesh = make_mesh()  # all global devices
    inputs = prove_core_inputs(bfs, trace, seed=seed, xp=jnp)
    args = replicate_tree(
        (
            inputs["mats"], inputs["rand_coeffs"], inputs["base_rands"],
            inputs["ext_rands"], inputs["challenges"], inputs["initials"],
            inputs["weights"], inputs["shift_ratios"], inputs["offset_pows"],
            inputs["zinv_flat"], inputs["terminals"], inputs["packs"],
        ),
        mesh,
    )
    core = jax.jit(make_prove_core(bfs, mesh=mesh, xp=jnp))
    with mesh:
        acc, _terms = core(*args)
        jax.block_until_ready(acc)
    return fetch_global(acc)


def run_full_prove_global(seed: int = 0, src: str = "++++") -> bytes:
    """The COMPLETE prove() — commitments, Fiat-Shamir transcript, FRI,
    openings, serialization — with every codeword-scale array sharded over
    a mesh of ALL global devices. Every process executes the identical
    host logic (seeded rng → identical transcripts) and returns the same
    proof bytes; device work is partitioned by XLA across the process
    group. `device_commit_min` is lowered so the tiny test trace still
    exercises the device commitment path the big proves use."""
    import jax
    import jax.numpy as jnp  # noqa: F401  (backend init before mesh)

    from ..config import StarkConfig
    from ..protocol.stark import BrainfuckStark
    from ..vm.machine import VirtualMachine
    from .mesh import make_mesh

    program = VirtualMachine.compile(src)
    trace = VirtualMachine.simulate(program)
    D = jax.device_count()
    cfg = StarkConfig(
        seed=seed,
        mesh_shape=(("shard", D),),
        device_commit_min=1024,
    )
    bfs = BrainfuckStark(
        trace["processor"].shape[0], trace["memory"].shape[0], program, "",
        trace["output_data"], cfg,
    )
    xp = GlobalXp(make_mesh(D))
    return bfs.prove(
        trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"], xp=xp,
    )


def _worker_main():
    """Entry for spawned dry-run workers: join the process group, run the
    global-mesh core (or the full prove when STARK_DRYRUN_MODE=prove),
    print the digest of the full result."""
    init_from_env()
    seed = int(os.environ.get("STARK_DRYRUN_SEED", "0"))
    if os.environ.get("STARK_DRYRUN_MODE") == "prove":
        proof = run_full_prove_global(seed=seed)
        digest = hashlib.sha256(proof).hexdigest()
    else:
        acc = run_core_global(seed=seed)
        digest = hashlib.sha256(
            np.ascontiguousarray(acc.astype("<u8")).tobytes()
        ).hexdigest()
    print(f"MULTIHOST_DIGEST {digest}", flush=True)


def spawn_dryrun(
    num_processes: int = 2,
    port: int = 0,
    timeout: int = 1800,
    seed: int = 0,
    mode: str = "core",
) -> str:
    """Launch `num_processes` single-device CPU worker processes, all
    joined into ONE jax process group on localhost; every worker runs the
    sharded prover core over the global num_processes-device mesh.

    Returns the common result digest; raises if workers disagree (which
    would mean the cross-process partitioning changed the math)."""
    if port == 0:
        import socket

        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        # one device per process: jax.distributed ignores
        # --xla_force_host_platform_device_count, so multi-device ==
        # multi-process here
        "XLA_FLAGS": "",
        "STARK_COORDINATOR": f"127.0.0.1:{port}",
        "STARK_NUM_PROCESSES": str(num_processes),
        "STARK_DRYRUN_SEED": str(seed),
        "STARK_DRYRUN_MODE": mode,
    }
    procs = []
    for pid in range(num_processes):
        env = {**env_base, "STARK_PROCESS_ID": str(pid)}
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "stark_brainfuck_tpu.parallel.multihost"],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
                cwd=os.path.dirname(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                ),
            )
        )
    digests = []
    errs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        errs.append(err)
        for line in out.splitlines():
            if line.startswith("MULTIHOST_DIGEST "):
                digests.append(line.split()[1])
    if len(digests) != num_processes:
        raise RuntimeError(
            f"expected {num_processes} digests, got {len(digests)};"
            f" worker stderr:\n" + "\n---\n".join(e[-2000:] for e in errs)
        )
    assert all(d == digests[0] for d in digests), (
        f"multi-host digests disagree: {digests}"
    )
    return digests[0]


if __name__ == "__main__":
    _worker_main()
