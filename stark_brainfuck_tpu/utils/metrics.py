"""Structured per-stage prover metrics.

The reference has no observability beyond ad-hoc prints (SURVEY §5). Here
every prove() records wall-clock per pipeline stage plus derived throughput
figures (cycles/s, NTT butterflies/s, hashed leaves/s); `STARK_PROFILE=1`
streams marks to stderr, and the last run is always inspectable at
`BrainfuckStark.last_metrics`.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, Optional


class StageTimer:
    def __init__(self, stream_to_stderr: Optional[bool] = None):
        if stream_to_stderr is None:
            stream_to_stderr = os.environ.get("STARK_PROFILE") is not None
        self.stream = stream_to_stderr
        self.stages: Dict[str, float] = {}
        self._last = time.time()
        self._start = self._last

    def mark(self, label: str, sync=None):
        """Record time since the previous mark. With STARK_SYNC_STAGES set
        and a `sync` object given, block on it first so the attribution is
        truthful under async dispatch (otherwise a stage's device time is
        billed to whichever later stage first forces a sync)."""
        if sync is not None and os.environ.get("STARK_SYNC_STAGES"):
            try:
                import jax

                # block_until_ready is unreliable through remote-tunnel
                # backends (returns before execution completes); a 1-element
                # device_get is a true sync barrier. ONE batched get for all
                # leaves — each separate get costs a full tunnel round trip.
                leaves = [
                    leaf.ravel()[:1]
                    for leaf in jax.tree_util.tree_leaves(sync)
                    if hasattr(leaf, "ravel")
                ]
                if leaves:
                    jax.device_get(leaves)
            except Exception:
                pass
        now = time.time()
        dt = now - self._last
        self.stages[label] = self.stages.get(label, 0.0) + dt
        if self.stream:
            print(f"[prove] {label}: {dt:.2f}s", file=sys.stderr, flush=True)
        self._last = now

    def total(self) -> float:
        return time.time() - self._start

    def report(self, **derived) -> Dict:
        out = {
            "total_s": round(self.total(), 4),
            "stages_s": {k: round(v, 4) for k, v in self.stages.items()},
        }
        out.update(derived)
        return out
