"""End-to-end STARK tests: honest prove+verify round trips, tamper
rejection, and the Mallory adversarial-trace soundness test (ref
test_brainfuck_stark.py pattern)."""

import numpy as np
import pytest

from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine


def prove_program(src, inp="", seed=0, xp=np):
    program = VirtualMachine.compile(src)
    trace = VirtualMachine.simulate(program, inp)
    bfs = BrainfuckStark(
        running_time=trace["processor"].shape[0],
        memory_length=trace["memory"].shape[0],
        program=program,
        input_symbols=inp,
        output_symbols=trace["output_data"],
        config=StarkConfig(seed=seed),
    )
    proof = bfs.prove(
        trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"], xp=xp,
    )
    return bfs, proof


def test_prove_verify_tiny():
    bfs, proof = prove_program("++++")
    assert bfs.verify(proof), "honest proof must verify"


def test_prove_verify_with_loop_and_io():
    bfs, proof = prove_program(",+.", "a")
    assert bfs.verify(proof), "honest proof must verify"


def test_prove_verify_loop():
    bfs, proof = prove_program("+>[+<-]")
    assert bfs.verify(proof)


@pytest.mark.slow
def test_jax_prover_matches_numpy_prover():
    import jax.numpy as jnp

    _, proof_np = prove_program("++++", seed=42, xp=np)
    bfs, proof_jax = prove_program("++++", seed=42, xp=jnp)
    assert proof_np == proof_jax, "seeded proofs must be backend-invariant"
    assert bfs.verify(proof_jax)


@pytest.mark.slow
def test_device_commit_path_matches_host_path():
    """A trace large enough to cross StarkConfig.device_commit_min (FRI
    domain >= 4096) takes the device commitment + device FRI path under the
    jax backend; the transcript must be byte-identical to the all-host
    numpy prover and still verify. This is the determinism gate for the
    on-device BLAKE2b Merkle trees, salt PRF, and jitted FRI folds."""
    import jax.numpy as jnp

    src = "+" * 8 + "[->++++[-]<]"
    bfs_j, proof_j = prove_program(src, seed=7, xp=jnp)
    assert bfs_j.fri.domain.length >= bfs_j.config.device_commit_min, (
        "workload must actually exercise the device commitment path"
    )
    bfs_n, proof_n = prove_program(src, seed=7, xp=np)
    assert proof_j == proof_n, "device-commit proofs must be backend-invariant"
    assert bfs_j.verify(proof_j)


def test_tampered_proof_rejected():
    from stark_brainfuck_tpu.protocol.channel import ProofStream

    bfs, proof = prove_program("++++")
    ps = ProofStream.deserialize(proof)
    # corrupt a terminal (object index 2 = first terminal)
    t = list(ps.objects[2])
    t[0] = (t[0] + 1) % (2**64 - 2**32 + 1)
    ps.objects[2] = tuple(t)
    assert not bfs.verify(ps.serialize()), "tampered proof must be rejected"


def test_wrong_output_rejected():
    program = VirtualMachine.compile("++++.")
    trace = VirtualMachine.simulate(program)
    bfs = BrainfuckStark(
        running_time=trace["processor"].shape[0],
        memory_length=trace["memory"].shape[0],
        program=program,
        input_symbols="",
        output_symbols=trace["output_data"],
        config=StarkConfig(seed=1),
    )
    proof = bfs.prove(
        trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"], xp=np,
    )
    # a verifier instantiated with a different output claim must reject
    lying = BrainfuckStark(
        running_time=trace["processor"].shape[0],
        memory_length=trace["memory"].shape[0],
        program=program,
        input_symbols="",
        output_symbols="X",
        config=StarkConfig(seed=1),
    )
    assert not lying.verify(proof)


def mallory_simulate(program):
    """Forged trace: pretend every '[' is taken and fake the inverse witness
    (the attack from ref test_brainfuck_stark.py:7-162 / docs/attack.md)."""
    from stark_brainfuck_tpu.ops.field import P
    from stark_brainfuck_tpu.vm.machine import derive_memory_matrix

    n = len(program)
    ip, mp, mv, mvi, clk = 0, 0, 0, 0, 0
    ci = program[0] if n else 0
    ni = program[1] if n > 1 else 0
    memory = {}
    processor_rows = []
    instruction_rows = [
        (i, program[i], program[i + 1] if i + 1 < n else 0) for i in range(n)
    ]
    while ip < n:
        processor_rows.append((clk, ip, ci, ni, mp, mv, mvi))
        instruction_rows.append((ip, ci, ni))
        if ci == ord("["):
            # Mallory always enters the loop, regardless of mv
            ip += 2
        elif ci == ord("]"):
            ip = program[ip + 1] if mv != 0 else ip + 2
        elif ci == ord("<"):
            ip += 1
            mp = (mp - 1) % P
        elif ci == ord(">"):
            ip += 1
            mp = (mp + 1) % P
        elif ci == ord("+"):
            ip += 1
            memory[mp] = (memory.get(mp, 0) + 1) % P
        elif ci == ord("-"):
            ip += 1
            memory[mp] = (memory.get(mp, 0) - 1) % P
        else:
            raise AssertionError
        clk += 1
        ci = program[ip] if ip < n else 0
        ni = program[ip + 1] if ip < n - 1 else 0
        mv = memory.get(mp, 0)
        # forged inverse witness: claim mv is nonzero by faking mvi
        mvi = pow(mv, P - 2, P) if mv else 1
    processor_rows.append((clk, ip, ci, ni, mp, mv, mvi))
    instruction_rows.append((ip, ci, ni))
    instruction_rows.sort(key=lambda r: r[0])
    processor = np.array(processor_rows, dtype=np.uint64).reshape(-1, 7)
    return {
        "processor": processor,
        "memory": derive_memory_matrix(processor),
        "instruction": np.array(instruction_rows, dtype=np.uint64).reshape(-1, 3),
        "input": np.zeros((0, 1), dtype=np.uint64),
        "output": np.zeros((0, 1), dtype=np.uint64),
    }


def test_mallory_forged_trace_rejected():
    src = "+>[++<-]"
    program = VirtualMachine.compile(src)
    honest = VirtualMachine.simulate(program)
    forged = mallory_simulate(program)
    assert forged["processor"].shape[0] != honest["processor"].shape[0], (
        "attack must change the execution"
    )

    bfs = BrainfuckStark(
        running_time=forged["processor"].shape[0],
        memory_length=forged["memory"].shape[0],
        program=program,
        input_symbols="",
        output_symbols="",
        config=StarkConfig(seed=3),
    )
    try:
        proof = bfs.prove(
            forged["processor"], forged["memory"], forged["instruction"],
            forged["input"], forged["output"], xp=np,
        )
    except AssertionError:
        return  # prover refusing the inconsistent trace is also a pass
    assert not bfs.verify(proof), "Mallory's proof must fail to verify"


@pytest.mark.slow
def test_production_security_level():
    """Real security parameters (expansion 16, lambda=64 -> 16 colinearity
    checks; the FRI last codeword caps checks at 2*expansion, the same
    structural limit as the reference) prove and verify; the vectorized
    verifier stays fast as lambda grows."""
    import time

    program = VirtualMachine.compile("+>[+<-]")
    trace = VirtualMachine.simulate(program)
    bfs = BrainfuckStark(
        running_time=trace["processor"].shape[0],
        memory_length=trace["memory"].shape[0],
        program=program,
        input_symbols="",
        output_symbols=trace["output_data"],
        config=StarkConfig(
            seed=0, security_level=64, log_expansion_factor=4
        ),
    )
    proof = bfs.prove(
        trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"], xp=np,
    )
    t0 = time.time()
    assert bfs.verify(proof)
    assert time.time() - t0 < 10, "verification must stay fast at higher lambda"
