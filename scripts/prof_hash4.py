"""Step-by-step timing with progress prints to find where time goes."""
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

T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-T0:8.2f}s] {msg}", flush=True)


from stark_brainfuck_tpu.ops import blake2b as B
from stark_brainfuck_tpu.ops.pallas_blake2b import blake2b_words_pallas

log("imports done")

x = jnp.ones((8, 128), jnp.uint32)
f0 = jax.jit(lambda a: a + 1)
r = f0(x)
jax.device_get(np.asarray(r[0, 0]))
log("trivial jit warm")
for _ in range(3):
    t = time.perf_counter()
    r = f0(x)
    v = jax.device_get(r)[0, 0]
    log(f"trivial dispatch+get: {(time.perf_counter()-t)*1e3:.1f} ms")

for logn in (14, 17, 19):
    N = 1 << logn
    W = 32
    MSG_LEN = 8 * 21
    rng = np.random.default_rng(0)
    t = time.perf_counter()
    m_lo = jax.device_put(rng.integers(0, 2**32, (N, W), dtype=np.uint32))
    m_hi = jax.device_put(rng.integers(0, 2**32, (N, W), dtype=np.uint32))
    jax.block_until_ready((m_lo, m_hi))
    log(f"N=2^{logn}: host->device 2x{N*W*4>>20}MB: "
        f"{time.perf_counter()-t:.2f}s")

    f1 = jax.jit(lambda a, b: blake2b_words_pallas(a, b, MSG_LEN))
    t = time.perf_counter()
    out = f1(m_lo, m_hi)
    jax.block_until_ready(out)
    log(f"N=2^{logn}: pallas leaf cold (compile+run): "
        f"{time.perf_counter()-t:.2f}s")
    for _ in range(3):
        t = time.perf_counter()
        out = f1(m_lo, m_hi)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t
        log(f"N=2^{logn}: pallas leaf: {dt*1e3:9.2f} ms "
            f"{N/dt/1e6:8.2f} M leaves/s")
