"""Separate tunnel RTT / dispatch overhead from real device time."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ONLY = set(sys.argv[1:])  # run a subset: overhead scale builder


def sync(out):
    for l in jax.tree_util.tree_leaves(out):
        jax.device_get(l.ravel()[0])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    if ONLY and "overhead" not in ONLY:
        pass
    else:
        overhead()
    if not ONLY or "scale" in ONLY:
        scale()
    if not ONLY or "builder" in ONLY:
        builder()


def overhead():
    x = jnp.ones((8, 128), jnp.uint32)

    # RTT: trivial jit + sync
    f0 = jax.jit(lambda a: a + 1)
    print(f"trivial jit+sync RTT:      {timeit(f0, x)*1e3:8.2f} ms")

    # chain of 10 trivial kernels in one jit
    def chain(a):
        for _ in range(10):
            a = a + 1
        return a
    print(f"10-op chain jit+sync:      {timeit(jax.jit(chain), x)*1e3:8.2f} ms")

    # 10 pallas no-op kernels in one jit
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def pk(a_ref, o_ref):
        o_ref[:] = a_ref[:] + 1

    def pchain(a):
        for _ in range(10):
            a = pl.pallas_call(
                pk, out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a)
        return a
    print(f"10 pallas no-ops jit+sync: {timeit(jax.jit(pchain), x)*1e3:8.2f} ms")


def scale():
    # big-vs-small pallas hash kernels: scaling check
    from stark_brainfuck_tpu.ops.pallas_blake2b import blake2b_words_pallas
    rng = np.random.default_rng(0)
    for logn in (14, 17, 19, 20):
        N = 1 << logn
        W = 16
        m_lo = jnp.asarray(rng.integers(0, 2**32, (N, W), dtype=np.uint32))
        m_hi = jnp.asarray(rng.integers(0, 2**32, (N, W), dtype=np.uint32))
        f = jax.jit(lambda a, b: blake2b_words_pallas(a, b, 128))
        t = timeit(f, m_lo, m_hi)
        print(f"pallas hash N=2^{logn} W=16:  {t*1e3:8.2f} ms  "
              f"{N/t/1e6:7.2f} M compr/s")


def builder():
    # builder profile: message assembly only vs leaf hash vs levels
    from stark_brainfuck_tpu.ops import blake2b as B
    rng = np.random.default_rng(0)
    N = 1 << 19
    rows64 = jnp.asarray(rng.integers(0, 2**63, (N, 18), dtype=np.uint64))
    salts = jnp.asarray(rng.integers(0, 2**32, (N, 6), dtype=np.uint32))

    def assemble(rows, s):
        lo, hi = B.u64_to_limbs(rows, jnp)
        z = jnp.zeros((N, 32 - 21), dtype=jnp.uint32)
        m_lo = jnp.concatenate([lo, s[:, 0::2], z], axis=1)
        m_hi = jnp.concatenate([hi, s[:, 1::2], z], axis=1)
        return m_lo, m_hi
    print(f"assemble only:             {timeit(jax.jit(assemble), rows64, salts)*1e3:8.2f} ms")

    def leaf_only(rows, s):
        m_lo, m_hi = assemble(rows, s)
        return B.blake2b_words(m_lo, m_hi, 8 * 21, jnp)
    print(f"assemble+leaf hash:        {timeit(jax.jit(leaf_only), rows64, salts)*1e3:8.2f} ms")

    def two_levels(rows, s):
        d_lo, d_hi = leaf_only(rows, s)
        return B.merkle_parents(d_lo, d_hi, jnp)
    print(f"assemble+leaf+1 level:     {timeit(jax.jit(two_levels), rows64, salts)*1e3:8.2f} ms")

    def l4(rows, s):
        d_lo, d_hi = leaf_only(rows, s)
        for _ in range(4):
            d_lo, d_hi = B.merkle_parents(d_lo, d_hi, jnp)
        return d_lo, d_hi
    print(f"assemble+leaf+4 levels:    {timeit(jax.jit(l4), rows64, salts)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
