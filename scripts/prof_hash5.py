"""Time the full device tree builder and its pieces at 2^19."""
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

N = 1 << 19
rng = np.random.default_rng(0)
d_lo = jax.device_put(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
d_hi = jax.device_put(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
jax.block_until_ready((d_lo, d_hi))
log("digest inputs on device")


def bench(name, fn, *args, reps=3):
    t = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    log(f"{name}: cold {time.perf_counter()-t:.2f}s")
    best = 1e9
    for _ in range(reps):
        t = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t)
    log(f"{name}: {best*1e3:9.2f} ms")
    return out


# one parent level 2^19 -> 2^18
f4 = jax.jit(lambda a, b: B.merkle_parents(a, b, jnp))
bench("merkle_parents 2^19", f4, d_lo, d_hi)

# full ladder 2^19 -> 512 in one jit
def ladder(a, b):
    n = a.shape[0]
    while n > 512:
        a, b = B.merkle_parents(a, b, jnp)
        n //= 2
    return a, b
bench("ladder 2^19->512", jax.jit(ladder), d_lo, d_hi)

# full salted tree builder at k=18
from stark_brainfuck_tpu.protocol.device_merkle import _get_builder
rows64 = jax.device_put(rng.integers(0, 2**63, (N, 18), dtype=np.uint64))
salts = jax.device_put(rng.integers(0, 2**32, (N, 6), dtype=np.uint32))
jax.block_until_ready((rows64, salts))
builder = _get_builder(N, 18, True, jnp)
bench("salted tree build N=2^19 k=18", builder, rows64, salts)

# salt PRF alone
from stark_brainfuck_tpu.protocol.device_merkle import (
    salt_words_device, salt_key_limbs)
klo, khi = salt_key_limbs(b"0123456789abcdef")
klo, khi = jnp.asarray(klo), jnp.asarray(khi)
f5 = jax.jit(lambda a, b: salt_words_device(a, b, N, jnp))
bench("salt PRF N=2^19", f5, klo, khi)
