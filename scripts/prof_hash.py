"""Microbenchmark the device Merkle hashing path to locate the bottleneck.

Times, on the real device:
  1. raw fused-pallas leaf hash (2^19 leaves, W=32)   — kernel-only cost
  2. one merkle_parents level at 2^19                 — parent-level cost
  3. full DeviceMerkle jitted builder (leaf + levels) — end-to-end tree
  4. the jnp (non-pallas) builds for comparison
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stark_brainfuck_tpu.ops import blake2b as B
from stark_brainfuck_tpu.ops.pallas_blake2b import blake2b_words_pallas

jax.config.update("jax_enable_x64", True)


def sync(out):
    # block_until_ready through the axon tunnel can return before remote
    # execution finishes; a device_get of one element is a true barrier.
    # Only fetch from the LAST leaf (executables complete atomically) so the
    # sync itself costs one tunnel round trip, not one per output.
    leaves = jax.tree_util.tree_leaves(out)
    jax.device_get(leaves[-1].ravel()[0])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    N = 1 << 19
    W = 32
    MSG_LEN = 8 * 21  # ~18 u64 cols + 3 salt words
    rng = np.random.default_rng(0)
    m_lo = jnp.asarray(rng.integers(0, 2**32, (N, W), dtype=np.uint32))
    m_hi = jnp.asarray(rng.integers(0, 2**32, (N, W), dtype=np.uint32))

    # 1. raw pallas leaf hash
    f1 = jax.jit(lambda a, b: blake2b_words_pallas(a, b, MSG_LEN))
    t, _ = timeit(f1, m_lo, m_hi)
    print(f"pallas leaf hash  N=2^19 W={W}: {t*1e3:8.2f} ms  "
          f"{N/t/1e6:7.2f} M leaves/s  ({2*N/t/1e6:.1f} M compr/s)")

    # 1b. pallas without the surrounding transposes (word-major in/out)
    rows = N // 128
    ml = jnp.transpose(m_lo.reshape(rows, 128, W), (2, 0, 1))
    mh = jnp.transpose(m_hi.reshape(rows, 128, W), (2, 0, 1))
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from stark_brainfuck_tpu.ops.pallas_blake2b import _kernel_body, _BLOCK_ROWS

    br = _BLOCK_ROWS
    zero = np.int32(0)
    in_spec = pl.BlockSpec((W, br, 128), lambda i: (zero, i, zero),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8, br, 128), lambda i: (zero, i, zero),
                            memory_space=pltpu.VMEM)

    def kern(a, b, c, d):
        _kernel_body(a, b, c, d, W=W, msg_len=MSG_LEN, xp=jnp)

    f2 = jax.jit(lambda a, b: pl.pallas_call(
        kern, grid=(rows // br,),
        out_shape=[jax.ShapeDtypeStruct((8, rows, 128), jnp.uint32)] * 2,
        in_specs=[in_spec, in_spec], out_specs=[out_spec, out_spec],
    )(a, b))
    t, _ = timeit(f2, ml, mh)
    print(f"pallas kernel only (no transposes):  {t*1e3:8.2f} ms  "
          f"{N/t/1e6:7.2f} M leaves/s")

    # 1c. just the transposes
    f3 = jax.jit(lambda a: jnp.transpose(a.reshape(rows, 128, W), (2, 0, 1)))
    t, _ = timeit(f3, m_lo)
    print(f"transpose (n,W)->(W,r,128) alone:    {t*1e3:8.2f} ms")

    # 2. one parent level at N/2
    d_lo = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
    d_hi = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
    f4 = jax.jit(lambda a, b: B.merkle_parents(a, b, jnp))
    t, _ = timeit(f4, d_lo, d_hi)
    print(f"merkle_parents level 2^19->2^18:     {t*1e3:8.2f} ms  "
          f"{(N//2)/t/1e6:7.2f} M hashes/s")

    # 3. full tree build via the cached builder
    from stark_brainfuck_tpu.protocol.device_merkle import _get_builder
    rows64 = jnp.asarray(
        rng.integers(0, 2**63, (N, 18), dtype=np.uint64))
    salts = jnp.asarray(rng.integers(0, 2**32, (N, 6), dtype=np.uint32))
    builder = _get_builder(N, 18, True, jnp)
    t, _ = timeit(builder, rows64, salts)
    print(f"full salted tree build N=2^19 k=18:  {t*1e3:8.2f} ms  "
          f"{N/t/1e6:7.2f} M leaves/s")

    # 4. jnp (non-pallas) comparison, leaf hash only
    os.environ["STARK_NO_PALLAS"] = "1"
    B._PALLAS_OK = None
    f5 = jax.jit(lambda a, b: B.blake2b_words(a, b, MSG_LEN, jnp))
    t, _ = timeit(f5, m_lo, m_hi, reps=2)
    print(f"jnp leaf hash (no pallas):           {t*1e3:8.2f} ms  "
          f"{N/t/1e6:7.2f} M leaves/s")
    del os.environ["STARK_NO_PALLAS"]
    B._PALLAS_OK = None


if __name__ == "__main__":
    main()
