"""Framework configuration.

The reference hardcodes its knobs as in-place-mutated constants
(`brainfuck_stark.py:33-46`) and one DEBUG env var (`table.py:170`).
Here every knob is an explicit dataclass field so runs are reproducible
and mesh/sharding choices are first-class.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class StarkConfig:
    # FRI / soundness parameters (defaults match the reference "for speed"
    # settings, brainfuck_stark.py:33-46; crank security_level to 160 and
    # log_expansion_factor to 4 for real deployments)
    log_expansion_factor: int = 2
    security_level: int = 2
    num_randomizers: int = 1

    # subgroup order from which all omicron/omega roots are derived
    order: int = 1 << 32

    # RNG: None -> os.urandom; an int seed gives a deterministic prover
    # (useful for tests/replays; the proof remains sound either way)
    seed: Optional[int] = None

    # transcript codec: "native" (canonical fixed-width byte format) or
    # "ref" (pickle-compatible with the reference's ProofStream, for
    # cross-implementation verification)
    codec: str = "native"

    # device mesh for sharded proving: None = single device; otherwise a
    # tuple of (axis_name, size) pairs, e.g. (("shard", 8),)
    mesh_shape: Optional[Tuple[Tuple[str, int], ...]] = None

    # commitments (Merkle leaf hashing + tree levels) run on the device via
    # the vectorized BLAKE2b kernel whenever the codeword length reaches this
    # threshold (and the backend is jax + the codec is native); below it the
    # host/hashlib path is cheaper than a jit round-trip. Device and host
    # paths produce byte-identical trees.
    device_commit_min: int = 4096

    # FRI rounds whose codeword is shorter than this finish on the HOST
    # even when the prove is device-resident: every device round must fetch
    # its Merkle root before the next Fiat-Shamir challenge — one
    # host-blocking dispatch round trip (~25 ms through the remote-tunnel
    # backend, measured) — while a short host round (vectorized numpy fold
    # + native-C++ tree) is single-digit ms. The switch itself pays one
    # codeword download (~20 MB/s through the tunnel), so the optimum
    # balances saved round trips against transfer bytes: measured best at
    # ~2^14 (BENCH fri_round_s r05 sweep). Clamped up to device_commit_min.
    fri_host_min: int = 1 << 14

    # streamed (strided-block) commitments: FRI domains >= stream_min never
    # materialize full base/ext codewords — coefficients are evaluated and
    # committed in `stream_classes` strided blocks (protocol/stream.py) and
    # re-evaluated at query time. Transcripts are byte-identical to the
    # resident path. Measured on the 16 GB v5e: the resident path's PEAK
    # (committed codewords + zipped leaf rows + quotient-chunk transients)
    # exhausts HBM at N = 2^22 (r05 ladder), so 2^22 streams.
    stream_min: int = 1 << 22
    # number of strided classes B (block size = N/B); must divide every
    # table's unit distance N/height — validated (and shrunk) at prove time
    stream_classes: int = 32

    # stage-level prove resume (seeded streamed runs only): directory for
    # per-stage commitment checkpoints keyed by (claim, stage, seed) —
    # a killed long prove resumes past completed commit passes to a
    # bit-identical proof. None disables.
    checkpoint_dir: Optional[str] = None

    # forward-LDE NTT backend: "auto" uses the int8-limb MXU kernels
    # (ops/pallas_ntt.py) on TPU backends for domains >= mxu_ntt_min and
    # the u64 butterfly network otherwise; "u64" / "mxu" force a path.
    # Both produce bit-identical codewords.
    ntt_backend: str = "auto"
    mxu_ntt_min: int = 1 << 14

    # opt-in expensive algebraic sanity checks (the reference's DEBUG mode,
    # table.py:170-176: interpolate each quotient and assert its degree)
    debug_degree_checks: bool = field(
        default_factory=lambda: os.environ.get("DEBUG") is not None
    )

    @property
    def expansion_factor(self) -> int:
        return 1 << self.log_expansion_factor

    @property
    def num_colinearity_checks(self) -> int:
        return self.security_level // self.log_expansion_factor

    def validate(self):
        assert self.expansion_factor >= 4, "expansion factor must be >= 4"
        assert (
            self.num_colinearity_checks * self.log_expansion_factor
            >= self.security_level
        ), "colinearity checks x log expansion must cover security level"
        return self
