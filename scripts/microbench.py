"""Microbenchmarks for the float-limb kernel design (VERDICT item 4).

Measures, on whatever device JAX selects:
  1. current u64-emulation field mul throughput (ops/field.py mul)
  2. elementwise f32 8-bit-limb field mul prototype (VPU path)
  3. bf16 matmul throughput at radix-128 DFT shapes (MXU path)
  4. int8->int32 matmul throughput at the same shapes (alt MXU path)
  5. device<->host transfer bandwidth

Run: python scripts/microbench.py [log2_n]
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stark_brainfuck_tpu.ops import field as f


def _sync(out):
    """block_until_ready alone is unreliable through the axon tunnel —
    force a scalar readback."""
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, reps=5, inner=4):
    out = fn(*args)
    _sync(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        dt = (time.perf_counter() - t0) / inner
        best = dt if best is None else min(best, dt)
    return best, out


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << log2n
    print(f"device: {jax.devices()[0].device_kind}, n = 2^{log2n}")
    rng = np.random.default_rng(0)
    a_np = rng.integers(0, f.P, size=n, dtype=np.uint64)
    b_np = rng.integers(0, f.P, size=n, dtype=np.uint64)
    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)

    # 1. u64 emulation mul
    mul_jit = jax.jit(lambda x, y: f.mul(x, y, jnp))
    dt, _ = timeit(mul_jit, a, b)
    print(f"u64-emulation mul:   {n/dt/1e9:8.3f} Gmul/s  ({dt*1e3:.2f} ms)")

    # 2. f32 8-bit-limb elementwise mul (correctness-shaped prototype):
    # 8 limbs of 8 bits; convolution c_u = sum_{s+t=u} a_s b_t (15 sums,
    # each < 8*255^2 < 2^19 exact in f32); renorm to bytes; fold mod p.
    def to_limbs(x):
        sh = [(x >> np.uint64(8 * i)) & np.uint64(0xFF) for i in range(8)]
        return jnp.stack([s.astype(jnp.float32) for s in sh], axis=-1)

    def limb_mul_f32(al, bl):
        # al, bl: (..., 8) f32 byte limbs
        c = [jnp.zeros(al.shape[:-1], jnp.float32) for _ in range(15)]
        for s in range(8):
            for t in range(8):
                c[s + t] = c[s + t] + al[..., s] * bl[..., t]
        # renorm 15 f32 (<2^19) coeffs into 17 byte limbs
        d = [jnp.zeros(al.shape[:-1], jnp.float32) for _ in range(17)]
        for u in range(15):
            lo = jnp.floor(c[u] * (1.0 / 256.0))
            e0 = c[u] - lo * 256.0
            hi = jnp.floor(lo * (1.0 / 256.0))
            e1 = lo - hi * 256.0
            d[u] = d[u] + e0
            d[u + 1] = d[u + 1] + e1
            d[u + 2] = d[u + 2] + hi
        # fold mod p: 2^(64+8m) == 2^(32+8m) - 2^(8m) (m=0..3);
        #             2^(96+8r) == -2^(8r) (r=0..4)
        pos = list(d[:8])
        neg = [jnp.zeros(al.shape[:-1], jnp.float32) for _ in range(8)]
        for m2 in range(4):
            pos[4 + m2] = pos[4 + m2] + d[8 + m2]
            neg[m2] = neg[m2] + d[8 + m2]
        for r in range(5):
            neg[r] = neg[r] + d[12 + r]
        return jnp.stack(pos, -1), jnp.stack(neg, -1)

    al = to_limbs(a)
    bl = to_limbs(b)
    limb_jit = jax.jit(limb_mul_f32)
    dt, _ = timeit(limb_jit, al, bl)
    print(f"f32-limb mul (VPU):  {n/dt/1e9:8.3f} Gmul/s  ({dt*1e3:.2f} ms)")

    # 3. MXU bf16 DFT-shaped matmul: (n/128, 8, 128) x (128, 8*128)
    rows = n // 128
    x_bf = jnp.asarray(
        rng.integers(0, 256, size=(rows * 8, 128)), dtype=jnp.bfloat16
    )
    w_bf = jnp.asarray(
        rng.integers(0, 256, size=(128, 8 * 128)), dtype=jnp.bfloat16
    )

    def dft_mm(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    mm_jit = jax.jit(dft_mm)
    dt, _ = timeit(mm_jit, x_bf, w_bf)
    macs = rows * 8 * 128 * 8 * 128
    print(f"bf16 MXU matmul:     {macs/dt/1e12:8.3f} Tmac/s  ({dt*1e3:.2f} ms)"
          f" -> {n/dt/1e9:.3f} Gelem/s per radix-128 stage")

    # 4. int8 matmul
    x_i8 = jnp.asarray(rng.integers(-127, 127, size=(rows * 8, 128)), dtype=jnp.int8)
    w_i8 = jnp.asarray(rng.integers(-127, 127, size=(128, 8 * 128)), dtype=jnp.int8)

    def dft_mm_i8(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    try:
        mm8_jit = jax.jit(dft_mm_i8)
        dt, _ = timeit(mm8_jit, x_i8, w_i8)
        print(f"int8 MXU matmul:     {macs/dt/1e12:8.3f} Tmac/s  ({dt*1e3:.2f} ms)")
    except Exception as e:  # pragma: no cover
        print(f"int8 matmul failed: {e}")

    # 5. transfer bandwidth
    big = jnp.zeros((1 << 26,), dtype=jnp.uint8)  # 64 MB
    jax.block_until_ready(big)
    t0 = time.perf_counter()
    _ = np.asarray(big)
    d2h = time.perf_counter() - t0
    h_np = np.zeros((1 << 26,), dtype=np.uint8)
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(h_np))
    h2d = time.perf_counter() - t0
    print(f"d2h: {64/d2h:8.1f} MB/s   h2d: {64/h2d:8.1f} MB/s")


if __name__ == "__main__":
    main()
