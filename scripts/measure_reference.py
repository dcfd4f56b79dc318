"""Measure the reference (pure-Python CPython) prover/verifier as the
BASELINE for bench.py's vs_baseline. Writes reference_baseline.json.

Run: python scripts/measure_reference.py [program]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference/code")
sys.dont_write_bytecode = True

from vm import VirtualMachine  # noqa: E402
from brainfuck_stark import BrainfuckStark  # noqa: E402


def measure(src, label):
    program = VirtualMachine.compile(src)
    running_time, input_symbols, output_symbols = VirtualMachine.run(program)
    t0 = time.time()
    pm, mm, im, inm, om = VirtualMachine.simulate(program, input_symbols)
    t_sim = time.time() - t0
    bfs = BrainfuckStark(running_time, len(mm), program, input_symbols, output_symbols)
    t0 = time.time()
    proof = bfs.prove(program, pm, mm, im, inm, om)
    t_prove = time.time() - t0
    t0 = time.time()
    ok = bfs.verify(proof)
    t_verify = time.time() - t0
    assert ok
    return {
        "label": label,
        "program": src,
        "running_time_cycles": running_time,
        "fri_domain": bfs.fri.domain.length,
        "simulate_s": t_sim,
        "prove_s": t_prove,
        "verify_s": t_verify,
        "prover_cycles_per_sec": running_time / t_prove,
        "proof_bytes": len(proof),
    }


if __name__ == "__main__":
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "reference_baseline.json")
    results = []
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    for src, label in [("++++", "plus4")] + (
        [(sys.argv[1], "custom")] if len(sys.argv) > 1 else []
    ):
        print(f"measuring reference on {label!r}...", flush=True)
        r = measure(src, label)
        print(json.dumps(r), flush=True)
        results = [x for x in results if x["label"] != r["label"]] + [r]
        json.dump(results, open(out_path, "w"), indent=1)
    print("wrote", out_path)
