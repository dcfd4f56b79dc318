"""Prover benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures steady-state end-to-end prover throughput (cycles proven per
second, trace generation excluded, jit warmup excluded) on a synthetic
counter workload of ~2^BENCH_LOG2_CYCLES cycles (default 20 — the
north-star BASELINE config-4 scale: ~1.04M-cycle trace, FRI domain 2^26,
streamed commitments), on whatever device JAX_PLATFORMS selects (the
driver runs this on real TPU). First contact with a trace-size bucket
compiles (persisted in .jax_cache/); steady state is seconds-to-a-minute.

vs_baseline compares against the measured reference CPython prover
(scripts/measure_reference.py -> reference_baseline.json). The reference is
only feasible to run on tiny traces; its cycles/sec *falls* with trace
length (superlinear symbolic evaluation), so using its small-trace number
as the denominator is conservative in the reference's favor.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def counter_program(target_cycles: int) -> str:
    """Two-level counter tuned so the padded table heights stay INSIDE the
    target power-of-two bucket: the largest program whose running time
    plus program length is < target. (Overshooting by even one cycle
    doubles every table height and therefore the FRI domain — 2x the
    whole prove for the same nominal scale.)"""
    from stark_brainfuck_tpu import VirtualMachine

    b = 32
    inner = "[->" + "+" * b + "[-]<]"

    def runtime(outer):
        src = "+" * outer + inner
        program = VirtualMachine.compile(src)
        rt, _, _ = VirtualMachine.run(program)
        return rt + len(program)

    lo, hi = 1, 1
    while runtime(hi) < target_cycles:
        lo, hi = hi, hi * 2
    # largest outer count with runtime < target
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        if runtime(mid) < target_cycles:
            lo = mid
        else:
            hi = mid
    return "+" * lo + inner


def main():
    log2 = int(os.environ.get("BENCH_LOG2_CYCLES", "20"))
    import jax

    # persist compiled executables across runs — stage compiles dominate
    # cold-start time and are shape-stable per trace-size bucket
    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import numpy as np

    from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine

    from stark_brainfuck_tpu.utils.checkpoint import simulate_cached

    src = counter_program(1 << log2)
    program = VirtualMachine.compile(src)
    t0 = time.time()
    trace = simulate_cached(
        program,
        directory=os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".stark_cache"
        ),
    )
    t_sim = time.time() - t0
    cycles = int(trace["processor"].shape[0])

    cfg_kwargs = {"seed": 0}
    if os.environ.get("BENCH_STREAM_MIN"):
        cfg_kwargs["stream_min"] = int(os.environ["BENCH_STREAM_MIN"])
    if os.environ.get("BENCH_STREAM_CLASSES"):
        cfg_kwargs["stream_classes"] = int(os.environ["BENCH_STREAM_CLASSES"])
    if os.environ.get("BENCH_CHECKPOINT_DIR"):
        # stage-level commit resume for long streamed runs: a killed
        # warmup/prove resumes past completed commitment passes
        cfg_kwargs["checkpoint_dir"] = os.environ["BENCH_CHECKPOINT_DIR"]

    def build():
        return BrainfuckStark(
            trace["processor"].shape[0], trace["memory"].shape[0], program,
            "", trace["output_data"], StarkConfig(**cfg_kwargs),
        )

    bfs = build()
    args = (
        trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"],
    )
    # warmup (jit compile) + correctness check
    t0 = time.time()
    proof = bfs.prove(*args)
    t_warm = time.time() - t0
    assert bfs.verify(proof), "benchmark proof failed to verify"

    # steady-state measurement
    best = None
    for _ in range(2):
        t0 = time.time()
        bfs.prove(*args)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)

    cps = cycles / best

    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "reference_baseline.json")
    vs_baseline = None
    if os.path.exists(ref_path):
        ref = json.load(open(ref_path))
        ref_cps = max(r["prover_cycles_per_sec"] for r in ref)
        vs_baseline = cps / ref_cps

    print(json.dumps({
        "metric": f"prover_cycles_per_sec_2e{log2}",
        "value": round(cps, 2),
        "unit": "cycles/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "detail": {
            "trace_cycles": cycles,
            "fri_domain": bfs.fri.domain.length,
            "prove_s": round(best, 3),
            "warmup_prove_s": round(t_warm, 3),
            "simulate_s": round(t_sim, 3),
            "proof_bytes": len(proof),
            "platform": os.environ.get("JAX_PLATFORMS", "default"),
            "backend": jax.default_backend(),
            "ntt_path": bfs.last_metrics.get("ntt_path"),
            "hash_path": bfs.last_metrics.get("hash_path"),
            "fri_round_s": bfs.last_metrics.get("fri_round_s"),
            "ntt_butterflies_per_s": bfs.last_metrics.get(
                "ntt_butterflies_per_s"
            ),
            "hash_leaves_per_s": bfs.last_metrics.get("hash_leaves_per_s"),
            "extend_rows_per_s": bfs.last_metrics.get("extend_rows_per_s"),
            "stages_s": bfs.last_metrics.get("stages_s"),
        },
    }))


if __name__ == "__main__":
    main()
