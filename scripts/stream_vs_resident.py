"""Resident vs streamed prover comparison ON HARDWARE at the same N
(VERDICT r3 item 3): byte-identical proofs, per-stage timings for both
paths, reopen second-pass cost. Run: python scripts/stream_vs_resident.py
[log2_cycles=15]."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine
from stark_brainfuck_tpu.utils.checkpoint import simulate_cached
from bench import counter_program

log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 15
src = counter_program(1 << log2)
program = VirtualMachine.compile(src)
trace = simulate_cached(program, directory=os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".stark_cache"))
args = (trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"])

def run(tag, **kw):
    bfs = BrainfuckStark(
        trace["processor"].shape[0], trace["memory"].shape[0], program, "",
        trace["output_data"], StarkConfig(seed=5, **kw),
    )
    t0 = time.time(); proof = bfs.prove(*args); warm = time.time() - t0
    t0 = time.time(); proof = bfs.prove(*args); steady = time.time() - t0
    assert bfs.verify(proof)
    print(json.dumps({
        "path": tag, "N": bfs.fri.domain.length,
        "steady_prove_s": round(steady, 3), "warmup_s": round(warm, 1),
        "stages_s": bfs.last_metrics.get("stages_s"),
    }), flush=True)
    return proof

p_res = run("resident")
p_str = run("streamed", stream_min=1 << 20)
print("byte_identical:", p_res == p_str)
assert p_res == p_str, "streamed transcript must match resident"
