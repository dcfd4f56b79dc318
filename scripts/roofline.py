"""Roofline accounting for the three hot kernels (VERDICT r3 item 5).

Measures kernel-only steady throughput on the real device for
  1. BLAKE2b leaf hashing (Pallas, VMEM-resident state)
  2. forward NTT (u64 butterfly network and/or int8 MXU path)
  3. FRI fold math (extension-field combine)
and compares each against its speed-of-light on one TPU v5e chip:

  HBM bandwidth       819 GB/s
  VPU u32 lane ops    ~3.85e12/s   ((8,128) vregs x 4 ALUs x 0.94 GHz)
  MXU int8            394 TOP/s

Op-count model (documented per kernel below; these set the compute
roofline):
  - BLAKE2b compression ~= 3.3k u32 VPU ops (12 rounds x 8 G x ~34)
  - u64 modmul ~= 25 u32 ops; butterfly = modmul + modadd + modsub ~= 40
  - fold output point ~= 2 xfield muls + combine ~= 570 u32 ops

Prints one JSON line per kernel: achieved, compute-SoL, memory-SoL,
percent of min(SoL). Run on the TPU:  python scripts/roofline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

HBM_BPS = 819e9
VPU_OPS = 3.85e12
MXU_INT8_OPS = 394e12


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.device_get(leaves[-1].ravel()[0])


def timeit(fn, *args, reps=3, chain=16):
    """Kernel-only time: enqueue `chain` back-to-back dispatches and sync
    ONCE, then divide — the remote-tunnel backend costs ~25 ms per
    host-blocking sync, which would otherwise swamp any kernel under
    ~100 ms (the round-4 roofline run was RT-polluted exactly this way).
    Dispatches on one device execute serially, so elapsed/chain is the
    per-call device time plus sub-ms enqueue overhead."""
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def measure_rt():
    """One blocking host<->device round trip (latency floor per sync)."""
    f = jax.jit(lambda a: a + 1)
    x = jnp.ones((8,), jnp.uint32)
    sync(f(x))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        sync(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def report(kernel, achieved, unit, sol_compute, sol_memory, detail):
    sol = min(sol_compute, sol_memory)
    print(json.dumps({
        "kernel": kernel,
        "achieved": round(achieved / 1e6, 1),
        "unit": f"M {unit}/s",
        "sol_compute_M": round(sol_compute / 1e6, 1),
        "sol_memory_M": round(sol_memory / 1e6, 1),
        "bound": "compute" if sol_compute < sol_memory else "memory",
        "pct_of_sol": round(100 * achieved / sol, 1),
        "detail": detail,
    }), flush=True)


def bench_blake2b():
    from stark_brainfuck_tpu.ops.pallas_blake2b import blake2b_words_pallas

    N, W = 1 << 20, 32  # 2-block messages: the salted base-leaf shape
    msg_len = 8 * 23
    rng = np.random.default_rng(0)
    m_lo = jnp.asarray(rng.integers(0, 2**32, (N, W), dtype=np.uint32))
    m_hi = jnp.asarray(rng.integers(0, 2**32, (N, W), dtype=np.uint32))
    f1 = jax.jit(lambda a, b: blake2b_words_pallas(a, b, msg_len))
    t = timeit(f1, m_lo, m_hi)
    compr = (W // 16) * N
    ops_per_compr = 3300.0
    bytes_per_leaf = 8 * W + 64  # read both limb planes, write digest
    report(
        "blake2b_leaf_hash", N / t, "leaves",
        VPU_OPS / ops_per_compr / (W // 16),
        HBM_BPS / bytes_per_leaf,
        {
            "n": N, "words": W, "ms": round(t * 1e3, 2),
            "M_compressions_per_s": round(compr / t / 1e6, 1),
            "GB_per_s_touched": round(N * bytes_per_leaf / t / 1e9, 1),
        },
    )

    # single-block (FRI fold leaves / parent levels) variant
    N2, W2 = 1 << 20, 16
    m_lo2, m_hi2 = m_lo[:, :16], m_hi[:, :16]
    f2 = jax.jit(lambda a, b: blake2b_words_pallas(a, b, 128))
    t2 = timeit(f2, m_lo2, m_hi2)
    report(
        "blake2b_parent_level", N2 / t2, "nodes",
        VPU_OPS / ops_per_compr,
        HBM_BPS / (8 * W2 + 64),
        {"n": N2, "ms": round(t2 * 1e3, 2)},
    )


def bench_ntt():
    from stark_brainfuck_tpu.ops import field as f
    from stark_brainfuck_tpu.ops import ntt as nt

    N, ROWS = 1 << 18, 8
    omega = f.primitive_nth_root(N)
    pack = nt.make_pack(N, omega, False, jnp)
    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.integers(0, f.P, (ROWS, N), dtype=np.uint64))
    fwd = jax.jit(lambda r, p: nt.ntt_with(r, p, jnp))
    t = timeit(fwd, rows, pack)
    logn = N.bit_length() - 1
    butterflies = ROWS * (N // 2) * logn
    ops_per_butterfly = 40.0
    # per stage: read+write each u64 element (16 B per element per stage)
    bytes_total = ROWS * N * 16 * logn
    report(
        "ntt_u64_butterfly", butterflies / t, "butterflies",
        VPU_OPS / ops_per_butterfly,
        HBM_BPS / 32,  # 32 B moved per butterfly per stage
        {
            "n": N, "rows": ROWS, "ms": round(t * 1e3, 2),
            "GB_per_s_touched": round(bytes_total / t / 1e9, 1),
        },
    )

    from stark_brainfuck_tpu.ops.blake2b import _pallas_available

    if _pallas_available():
        from stark_brainfuck_tpu.ops.pallas_ntt import (
            make_pallas_plan, ntt_pallas,
        )

        plan = make_pallas_plan(N, omega, False, jnp)
        fwd2 = jax.jit(lambda r: ntt_pallas(r, plan))
        t2 = timeit(fwd2, rows)
        report(
            "ntt_mxu_int8", butterflies / t2, "butterflies",
            # int8 limb matmul: radix-128 DFT = 128x(9x17) int8 MACs per
            # point per level; levels = logn/7
            MXU_INT8_OPS / (2 * 128 * 9 * 17) * 7 / 2,
            HBM_BPS / 32,
            {"n": N, "rows": ROWS, "ms": round(t2 * 1e3, 2)},
        )


def bench_fold():
    from stark_brainfuck_tpu.ops import field as f
    from stark_brainfuck_tpu.protocol.fri import _fold_device

    N = 1 << 20
    rng = np.random.default_rng(2)
    cw = jnp.asarray(rng.integers(0, f.P, (N, 3), dtype=np.uint64))
    alpha = jnp.asarray(rng.integers(0, f.P, (3,), dtype=np.uint64))
    omega = f.primitive_nth_root(N)

    def fold(c, a):
        return _fold_device(c, a, omega, f.GENERATOR, jnp, with_tree=False)

    t = timeit(fold, cw, alpha)
    half = N // 2
    ops_per_point = 570.0
    bytes_per_point = 2 * 24 + 8 + 24
    report(
        "fri_fold_math", half / t, "points",
        VPU_OPS / ops_per_point,
        HBM_BPS / bytes_per_point,
        {"n": N, "ms": round(t * 1e3, 2)},
    )


def main():
    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    rt = measure_rt()
    print(json.dumps({
        "kernel": "host_device_round_trip",
        "ms": round(rt * 1e3, 2),
        "note": "latency floor per host-blocking sync (root fetches, "
                "Fiat-Shamir barriers); subtracted from nothing — kernel "
                "times below amortize it over a 16-deep dispatch chain",
    }), flush=True)
    bench_blake2b()
    bench_ntt()
    bench_fold()


if __name__ == "__main__":
    main()
