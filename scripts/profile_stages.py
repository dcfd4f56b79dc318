"""Profile trace/compile/run time of the three prover stages on CPU."""

import os, sys, time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine
from stark_brainfuck_tpu.utils.rng import Rng

program = VirtualMachine.compile("++++")
trace = VirtualMachine.simulate(program)
bfs = BrainfuckStark(
    trace["processor"].shape[0], trace["memory"].shape[0], program, "", "",
    StarkConfig(seed=0),
)
print("fri domain:", bfs.fri.domain.length, "max_degree:", bfs.max_degree)

mats_list = [trace["processor"], trace["instruction"], trace["memory"], trace["input"], trace["output"]]
for t, m in zip(bfs.tables, mats_list):
    t.matrix = np.asarray(m, dtype=np.uint64).reshape(-1, t.base_width)
    if len(t.matrix) > 0:
        t.pad()
mats = tuple(jnp.asarray(t.matrix) for t in bfs.tables)
rng = Rng(0)
N = bfs.fri.domain.length

rc = jnp.asarray(rng.x_elements((bfs.max_degree + 1,), chunk=9))
br = tuple(
    jnp.asarray(rng.base_elements((t.base_width, t.num_randomizers)))
    if t.num_randomizers > 0 and t.height > 0 else None
    for t in bfs.tables
)

t0 = time.time()
fa = jax.jit(lambda m_, rc_, br_: bfs._stage_base_lde(m_, rc_, br_, jnp))
lowered = fa.lower(mats, rc, br)
t1 = time.time()
compiled = lowered.compile()
t2 = time.time()
out = jax.block_until_ready(compiled(mats, rc, br))
t3 = time.time()
print(f"stage A: trace {t1-t0:.2f}s compile {t2-t1:.2f}s run {t3-t2:.3f}s")
rand_cw, base_cws = out

ch = jnp.asarray(rng.x_elements((11,)))
ini = jnp.asarray(rng.x_elements((2,)))
er = tuple(
    jnp.asarray(rng.x_elements((t.num_ext_columns, t.num_randomizers)))
    if t.num_randomizers > 0 and t.height > 0 else None
    for t in bfs.tables
)
t0 = time.time()
fb = jax.jit(lambda m_, c_, i_, e_: bfs._stage_extend_lde(m_, c_, i_, e_, jnp))
lb = fb.lower(mats, ch, ini, er)
t1 = time.time()
cb = lb.compile()
t2 = time.time()
outb = jax.block_until_ready(cb(mats, ch, ini, er))
t3 = time.time()
print(f"stage B: trace {t1-t0:.2f}s compile {t2-t1:.2f}s run {t3-t2:.3f}s")
ext_cws, term_arrays = outb

challenges_h = [tuple(int(v) for v in np.asarray(ch)[i]) for i in range(11)]
for t, terms in zip(bfs.tables, term_arrays):
    terms = np.asarray(terms)
    t.terminals = {
        n: tuple(int(v) for v in terms[i]) for i, n in enumerate(t.terminal_names)
    }
terminals_h = bfs._terminals_list()

qdb = []
tq0 = time.time()
for t in bfs.tables:
    qdb += t.all_quotient_degree_bounds(challenges_h, terminals_h)
for pa in bfs.permutation_arguments:
    qdb.append(pa.quotient_degree_bound())
tq1 = time.time()
print(f"symbolic degree bounds: {tq1-tq0:.2f}s ({len(qdb)} quotients)")

import stark_brainfuck_tpu.ops.field as f

all_bounds = bfs._base_degree_bounds() + bfs._ext_degree_bounds() + qdb
shifts = jnp.asarray([bfs.max_degree - b for b in all_bounds], dtype=jnp.int64)
opows = jnp.asarray(
    np.asarray([f.h_pow(bfs.fri.domain.offset, bfs.max_degree - b) for b in all_bounds], dtype=np.uint64)
)
weights = jnp.asarray(rng.x_elements((1 + 2 * (16 + 9 + len(qdb)),)))
terminals_arr = jnp.asarray(np.asarray(terminals_h, dtype=np.uint64))
zinv = bfs._zerofier_inverses(jnp)
zf = tuple(zinv[t.height][k] for t in bfs.tables for k in ("boundary", "transition", "terminal"))
omp = bfs._omega_power_table(jnp)

t0 = time.time()
fc = jax.jit(
    lambda rcw, bcw, ecw, c_, tm, w_, s_, o_, m_, z_: bfs._stage_combination(
        rcw, bcw, ecw, c_, tm, w_, s_, o_, m_, z_, jnp
    )
)
lc = fc.lower(rand_cw, base_cws, ext_cws, ch, terminals_arr, weights, shifts, opows, omp, zf)
t1 = time.time()
print(f"stage C: trace {t1-t0:.2f}s", flush=True)
cc = lc.compile()
t2 = time.time()
outc = jax.block_until_ready(cc(rand_cw, base_cws, ext_cws, ch, terminals_arr, weights, shifts, opows, omp, zf))
t3 = time.time()
print(f"stage C: compile {t2-t1:.2f}s run {t3-t2:.3f}s")
