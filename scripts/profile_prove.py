"""Wall-clock breakdown of a full prove at a given size on CPU."""

import os, sys, time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

import bench
from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine

log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 12
src = bench.counter_program(1 << log2)
program = VirtualMachine.compile(src)
t0 = time.time()
trace = VirtualMachine.simulate(program)
print(f"simulate: {time.time()-t0:.2f}s cycles={trace['processor'].shape[0]}")

t0 = time.time()
bfs = BrainfuckStark(
    trace["processor"].shape[0], trace["memory"].shape[0], program, "",
    trace["output_data"], StarkConfig(seed=0),
)
print(f"init (degree sweep): {time.time()-t0:.2f}s fri={bfs.fri.domain.length}")

# monkeypatch timers around key internals
import stark_brainfuck_tpu.protocol.stark as S
import stark_brainfuck_tpu.protocol.fri as F
from stark_brainfuck_tpu.protocol.merkle import Merkle, SaltedMerkle

times = {}


def wrap(obj, name):
    orig = getattr(obj, name)

    def timed(*a, **k):
        t = time.time()
        r = orig(*a, **k)
        times[f"{obj.__name__}.{name}"] = times.get(f"{obj.__name__}.{name}", 0) + time.time() - t
        return r

    setattr(obj, name, timed)


wrap(S, "_rows_to_leaf_bytes")
orig_salted_init = SaltedMerkle.__init__
def timed_sm(self, *a, **k):
    t = time.time(); orig_salted_init(self, *a, **k)
    times["SaltedMerkle"] = times.get("SaltedMerkle", 0) + time.time() - t
SaltedMerkle.__init__ = timed_sm
orig_m_init = Merkle.__init__
def timed_m(self, *a, **k):
    t = time.time(); orig_m_init(self, *a, **k)
    times["Merkle"] = times.get("Merkle", 0) + time.time() - t
Merkle.__init__ = timed_m

orig_zinv = BrainfuckStark._zerofier_inverses
def timed_zinv(self, xp):
    t = time.time(); r = orig_zinv(self, xp)
    times["zerofier_inverses"] = times.get("zerofier_inverses", 0) + time.time() - t
    return r
BrainfuckStark._zerofier_inverses = timed_zinv

orig_fri_prove = F.Fri.prove
def timed_fri(self, *a, **k):
    t = time.time(); r = orig_fri_prove(self, *a, **k)
    times["fri.prove"] = times.get("fri.prove", 0) + time.time() - t
    return r
F.Fri.prove = timed_fri

orig_qdb = S.BrainfuckStark.prove
t0 = time.time()
proof = bfs.prove(
    trace["processor"], trace["memory"], trace["instruction"],
    trace["input"], trace["output"],
)
total = time.time() - t0
print(f"prove total: {total:.2f}s")
for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f"  {k}: {v:.2f}s")
print(f"  unaccounted: {total - sum(times.values()):.2f}s")

t0 = time.time()
ok = bfs.verify(proof)
print(f"verify: {time.time()-t0:.2f}s ok={ok}")

t0 = time.time()
proof = bfs.prove(
    trace["processor"], trace["memory"], trace["instruction"],
    trace["input"], trace["output"],
)
print(f"second prove: {time.time()-t0:.2f}s")
