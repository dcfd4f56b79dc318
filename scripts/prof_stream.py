"""Locate the cost inside the streamed commit/reopen passes at N=2^22."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
import numpy as np
from stark_brainfuck_tpu.ops import field as f, ntt as nt
from stark_brainfuck_tpu.protocol import stream as st
from stark_brainfuck_tpu.protocol.device_merkle import leaf_digests, salt_words_device, salt_key_limbs

def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.device_get(leaves[-1].ravel()[0])

def timeit(fn, *args, reps=3):
    out = fn(*args); sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(*args); sync(out)
        best = min(best, time.perf_counter() - t0)
    return best

N, B = 1 << 22, 32
S = N // B
plan = st.make_stream_plan(N, B, f.primitive_nth_root(N), jnp)
rng = np.random.default_rng(0)
# realistic groups: randomizer (3, N/4), 17 base rows at H=2^16
g1 = jnp.asarray(rng.integers(0, f.P, (3, N // 4), dtype=np.uint64))
g2 = jnp.asarray(rng.integers(0, f.P, (17, 1 << 16), dtype=np.uint64))
groups = (g1, g2)
scale_len = N // 4
wb = jnp.asarray(np.asarray([7], dtype=np.uint64))

bv = jax.jit(lambda gs, w, pk: st.block_values(gs, w, scale_len, pk, S, jnp))
t = timeit(bv, groups, wb, plan["pack_S"])
print(f"block_values (1 class, 20 rows): {t*1e3:.1f} ms")

rows = bv(groups, wb, plan["pack_S"]).T
klo, khi = salt_key_limbs(b"0123456789abcdef")
ld = jax.jit(lambda r: leaf_digests(r, salt_words_device(jnp.asarray(klo), jnp.asarray(khi), S, jnp), jnp))
t = timeit(ld, rows)
print(f"leaf_digests+salts (1 class, S=2^17): {t*1e3:.1f} ms")

def commit_once():
    tr = st.streamed_commit(groups, b"0123456789abcdef", plan, jnp)
    return tr.levels
t0 = time.perf_counter(); lv = commit_once(); sync(lv)
t1 = time.perf_counter(); lv = commit_once(); sync(lv)
print(f"full streamed_commit (B=32): warm {time.perf_counter()-t1:.2f} s (first {t1-t0:.2f} s)")

reopen = st.reopen_rows(groups, plan, jnp)
t0 = time.perf_counter(); out = reopen(list(range(8))); t1 = time.perf_counter()
print(f"reopen (8 positions, warm+exec): {t1-t0:.2f} s")
t0 = time.perf_counter(); out = reopen(list(range(8, 16))); t1 = time.perf_counter()
print(f"reopen (8 positions, steady): {t1-t0:.2f} s")
