"""Device mesh helpers for sharded proving.

The reference is strictly single-process (SURVEY §2: no parallelism of any
kind); the honest TPU-native parallelism for a STARK prover is *data
parallelism over codeword indices* (the FRI-domain axis): LDE NTTs, quotient
evaluation, the nonlinear combination, and FRI folds all shard over that
axis, with collectives only where the computation genuinely mixes indices
(NTT butterfly transposes, FRI pair-folding, transition-row halo shifts).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def make_mesh(n_devices: Optional[int] = None, axis: str = "shard"):
    """A 1-D mesh over the first n devices (default: all)."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def codeword_spec(mesh, ndim: int, sharded_axis: int):
    """PartitionSpec sharding `sharded_axis` of an ndim-array over the mesh's
    (single) axis, everything else replicated."""
    from jax.sharding import NamedSharding, PartitionSpec

    axis_name = mesh.axis_names[0]
    spec = [None] * ndim
    spec[sharded_axis] = axis_name
    return NamedSharding(mesh, PartitionSpec(*spec))
