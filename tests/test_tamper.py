"""STARK-orchestrator tamper suite + the memory-sorting attack.

Merkle-layer negatives live in test_merkle.py; these exercise the glue in
`stark.verify` (base/ext openings, salts, combination leaves, FRI roots)
and the end-to-end soundness of the dummy-row defense. Every rejection
must also carry a diagnostic naming the failing site (`last_rejection`) —
the reference prints context on its FRI rejection paths
(ref fri.py:221,246-251,285); a bare False is undebuggable at scale.
"""

import numpy as np

from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine
from stark_brainfuck_tpu.protocol.channel import ProofStream

P = 2**64 - 2**32 + 1


def prove_program(src, inp="", seed=0):
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
        trace["input"], trace["output"], xp=np,
    )
    return bfs, proof


def _tampered_verify(bfs, proof, mutate):
    """Apply `mutate(objects)` to the deserialized stream, re-serialize,
    assert rejection, and return the diagnostic."""
    ps = ProofStream.deserialize(proof)
    mutate(ps.objects)
    assert not bfs.verify(ps.serialize()), "tampered proof must be rejected"
    assert bfs.last_rejection, "rejection must carry a diagnostic"
    return bfs.last_rejection


# Native-format object layout (see stark.prove): 0 = base root, 1 = ext
# root, 2-6 = terminals, 7 = combination root, then per query index and
# unit distance the cycle [base element, (salt, path), ext element,
# (salt, path)], then per query index [combination leaf, path], then FRI.


def test_base_opening_element_tamper():
    bfs, proof = prove_program("++++")

    def mutate(objs):
        el = list(objs[8])
        el[1] = (int(el[1]) + 1) % P
        objs[8] = tuple(el)

    reason = _tampered_verify(bfs, proof, mutate)
    assert "base codeword opening" in reason


def test_base_salt_tamper():
    bfs, proof = prove_program("++++")

    def mutate(objs):
        salt, path = objs[9]
        objs[9] = (bytes([salt[0] ^ 1]) + salt[1:], path)

    reason = _tampered_verify(bfs, proof, mutate)
    assert "base codeword opening" in reason


def test_ext_opening_element_tamper():
    bfs, proof = prove_program("++++")

    def mutate(objs):
        el = [tuple(c) for c in objs[10]]
        c0 = list(el[0])
        c0[0] = (int(c0[0]) + 1) % P
        el[0] = tuple(c0)
        objs[10] = tuple(el)

    reason = _tampered_verify(bfs, proof, mutate)
    assert "extension codeword opening" in reason


def test_ext_path_tamper():
    bfs, proof = prove_program("++++")

    def mutate(objs):
        salt, path = objs[11]
        path = list(path)
        path[0] = bytes([path[0][0] ^ 0xFF]) + path[0][1:]
        objs[11] = (salt, path)

    reason = _tampered_verify(bfs, proof, mutate)
    assert "extension codeword opening" in reason


def _first_combination_leaf_index(objs):
    """First 3-tuple of ints after the openings = first combination leaf."""
    for i in range(8, len(objs)):
        o = objs[i]
        if (
            isinstance(o, tuple)
            and len(o) == 3
            and all(isinstance(v, int) for v in o)
        ):
            return i
    raise AssertionError("no combination leaf found")


def test_combination_leaf_tamper():
    bfs, proof = prove_program("++++")

    def mutate(objs):
        i = _first_combination_leaf_index(objs)
        leaf = list(objs[i])
        leaf[2] = (leaf[2] + 1) % P
        objs[i] = tuple(leaf)

    reason = _tampered_verify(bfs, proof, mutate)
    assert "combination" in reason


def test_fri_root_tamper():
    bfs, proof = prove_program("++++")

    def mutate(objs):
        # last 64-byte bytes object = a late FRI round root
        for i in range(len(objs) - 1, 7, -1):
            if isinstance(objs[i], bytes) and len(objs[i]) == 64:
                objs[i] = bytes([objs[i][0] ^ 1]) + objs[i][1:]
                return
        raise AssertionError("no FRI root found")

    reason = _tampered_verify(bfs, proof, mutate)
    assert "FRI" in reason


def test_honest_proof_has_no_rejection_reason():
    bfs, proof = prove_program("++++")
    assert bfs.verify(proof)
    assert bfs.last_rejection is None


def test_memory_sorting_attack_rejected():
    """The clk-jump sorting attack (ref docs/attack.md:89-113, pattern at
    ref test_brainfuck_stark.py:225-252): a malicious prover submits a
    memory matrix sorted by (mp, clk) but WITHOUT the dummy rows that
    erase clk jumps. The memory permutation argument still holds (same
    multiset of rows), so only the memory-table transition AIR can catch
    it — the proof must be rejected end to end."""
    # revisits cell 0 after touching cell 1 -> a clk jump in memory order
    src = "+>++<-"
    program = VirtualMachine.compile(src)
    trace = VirtualMachine.simulate(program)

    processor = trace["processor"]
    honest_memory = trace["memory"]

    # forge: sort non-padding rows by (mp, clk), no dummy-row insertion
    rows = processor[processor[:, 2] != 0]  # ci != 0
    order = np.lexsort(
        (rows[:, 0].astype(np.int64), rows[:, 4].astype(np.int64))
    )
    sel = rows[order][:, [0, 4, 5]]
    forged_memory = np.concatenate(
        [sel, np.zeros((sel.shape[0], 1), dtype=np.uint64)], axis=1
    ).astype(np.uint64)

    assert forged_memory.shape[0] != honest_memory.shape[0] or (
        forged_memory != honest_memory
    ).any(), "attack must actually change the memory matrix"

    bfs = BrainfuckStark(
        running_time=trace["processor"].shape[0],
        memory_length=forged_memory.shape[0],
        program=program,
        input_symbols="",
        output_symbols=trace["output_data"],
        config=StarkConfig(seed=5),
    )
    try:
        proof = bfs.prove(
            trace["processor"], forged_memory, trace["instruction"],
            trace["input"], trace["output"], xp=np,
        )
    except AssertionError:
        return  # the prover refusing the inconsistent trace is also a pass
    assert not bfs.verify(proof), (
        "re-sorted memory without dummy rows must not produce a valid proof"
    )
