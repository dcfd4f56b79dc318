"""Round-3 hashing bottleneck profile: pallas leaf hash, parent levels,
full tree builder, and the per-level launch-chain cost."""
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

from stark_brainfuck_tpu.ops import blake2b as B
from stark_brainfuck_tpu.ops.pallas_blake2b import blake2b_words_pallas


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.device_get(leaves[-1].ravel()[0])


def timeit(fn, *args, reps=5):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    cold = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, cold


def main():
    N = 1 << 19
    W = 32
    MSG_LEN = 8 * 21
    rng = np.random.default_rng(0)
    m_lo = jnp.asarray(rng.integers(0, 2**32, (N, W), dtype=np.uint32))
    m_hi = jnp.asarray(rng.integers(0, 2**32, (N, W), dtype=np.uint32))

    f1 = jax.jit(lambda a, b: blake2b_words_pallas(a, b, MSG_LEN))
    t, cold = timeit(f1, m_lo, m_hi)
    print(f"pallas leaf hash  N=2^19 W={W}: {t*1e3:8.2f} ms  "
          f"{N/t/1e6:7.2f} M leaves/s (cold {cold:.1f}s)", flush=True)

    # parent level at full size
    d_lo = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
    d_hi = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
    f4 = jax.jit(lambda a, b: B.merkle_parents(a, b, jnp))
    t, cold = timeit(f4, d_lo, d_hi)
    print(f"merkle_parents 2^19->2^18:     {t*1e3:8.2f} ms  "
          f"{(N//2)/t/1e6:7.2f} M hashes/s (cold {cold:.1f}s)", flush=True)

    # full tree build via the cached builder
    from stark_brainfuck_tpu.protocol.device_merkle import _get_builder
    rows64 = jnp.asarray(
        rng.integers(0, 2**63, (N, 18), dtype=np.uint64))
    salts = jnp.asarray(rng.integers(0, 2**32, (N, 6), dtype=np.uint32))
    builder = _get_builder(N, 18, True, jnp)
    t, cold = timeit(builder, rows64, salts)
    print(f"full salted tree N=2^19 k=18:  {t*1e3:8.2f} ms  "
          f"{N/t/1e6:7.2f} M leaves/s (cold {cold:.1f}s)", flush=True)

    # launch ladder: all parent levels 2^19 -> 512, as one jit
    def ladder(a, b):
        n = a.shape[0]
        while n > 512:
            a, b = B.merkle_parents(a, b, jnp)
            n //= 2
        return a, b
    f5 = jax.jit(ladder)
    t, cold = timeit(f5, d_lo, d_hi)
    print(f"parent ladder 2^19->512:       {t*1e3:8.2f} ms (cold {cold:.1f}s)",
          flush=True)

    # dispatch RTT
    f0 = jax.jit(lambda a: a + 1)
    x = jnp.ones((8, 128), jnp.uint32)
    t, cold = timeit(f0, x)
    print(f"trivial jit+sync RTT:          {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
