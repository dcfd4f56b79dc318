"""AIR tests: base constraints vanish on recorded traces (ref test_vm.py
test_air/test_pad pattern), extension columns + terminals match the
reference's extend loops, and degree bounds match the reference's symbolic
computation."""

import numpy as np
import pytest

from stark_brainfuck_tpu.models.instruction import InstructionTable
from stark_brainfuck_tpu.models.io import InputTable, OutputTable
from stark_brainfuck_tpu.models.memory import MemoryTable
from stark_brainfuck_tpu.models.processor import ProcessorTable
from stark_brainfuck_tpu.ops import xfield as xf
from stark_brainfuck_tpu.protocol.arguments import (
    evaluation_terminal,
    program_evaluation_terminal,
)
from stark_brainfuck_tpu.vm.machine import VirtualMachine

RNG = np.random.default_rng(7)


def rand_x():
    return tuple(int(v) for v in RNG.integers(0, 2**63, size=3))


def make_tables(src, inp=""):
    program = VirtualMachine.compile(src)
    trace = VirtualMachine.simulate(program, inp)
    rt = trace["processor"].shape[0]
    tables = {
        "processor": ProcessorTable(rt, 1),
        "instruction": InstructionTable(rt + len(program), 1),
        "memory": MemoryTable(trace["memory"].shape[0], 1),
        "input": InputTable(trace["input"].shape[0]),
        "output": OutputTable(trace["output"].shape[0]),
    }
    tables["processor"].matrix = trace["processor"]
    tables["instruction"].matrix = trace["instruction"]
    tables["memory"].matrix = trace["memory"]
    tables["input"].matrix = trace["input"]
    tables["output"].matrix = trace["output"]
    return program, trace, tables


PROGRAMS = [("++++", ""), ("+>[+<-]", ""), (",+.", "a"), ("++>+<[->+<]", "")]


@pytest.mark.parametrize("src,inp", PROGRAMS)
def test_base_air_holds_on_trace(src, inp):
    _, _, tables = make_tables(src, inp)
    for t in tables.values():
        t.test()


@pytest.mark.parametrize("src,inp", PROGRAMS)
def test_base_air_holds_after_pad(src, inp):
    _, _, tables = make_tables(src, inp)
    for t in tables.values():
        if len(t.matrix) > 0:
            t.pad()
        t.test()


@pytest.mark.parametrize("src,inp", [("+>[+<-]", ""), (",+.", "a")])
def test_extension_air_holds_after_extend(src, inp):
    _, _, tables = make_tables(src, inp)
    challenges = [rand_x() for _ in range(11)]
    initials = [rand_x() for _ in range(2)]
    for t in tables.values():
        if len(t.matrix) > 0:
            t.pad()
        t.extend(challenges, initials, np)
    terminals = [
        tables["processor"].terminals["instruction_permutation"],
        tables["processor"].terminals["memory_permutation"],
        tables["processor"].terminals["input_evaluation"],
        tables["processor"].terminals["output_evaluation"],
        tables["instruction"].terminals["evaluation"],
    ]
    for t in tables.values():
        t.xtest(challenges, terminals)


def test_extend_jax_matches_numpy():
    import jax.numpy as jnp

    _, _, tables = make_tables("+>[+<-]")
    challenges = [rand_x() for _ in range(11)]
    initials = [rand_x() for _ in range(2)]
    for t in tables.values():
        if len(t.matrix) > 0:
            t.pad()
        cols_np = np.asarray(t.extend(challenges, initials, np))
        terms_np = dict(t.terminals)
        cols_jax = np.asarray(t.extend(challenges, initials, jnp))
        assert np.array_equal(cols_np, cols_jax), t.name
        assert terms_np == t.terminals, t.name


def test_terminals_match_evaluation_arguments():
    """Processor I/O terminals and the instruction evaluation terminal must
    equal the verifier-side recomputation from public data."""
    program, trace, tables = make_tables(",+.", "a")
    challenges = [rand_x() for _ in range(11)]
    initials = [rand_x() for _ in range(2)]
    for t in tables.values():
        if len(t.matrix) > 0:
            t.pad()
        t.extend(challenges, initials, np)

    gamma, delta = challenges[8], challenges[9]
    assert tables["processor"].terminals["input_evaluation"] == (
        evaluation_terminal([ord("a")], gamma)
    )
    out_sym = [int(r[0]) for r in trace["output"]]
    assert tables["processor"].terminals["output_evaluation"] == (
        evaluation_terminal(out_sym, delta)
    )
    assert tables["instruction"].terminals["evaluation"] == (
        program_evaluation_terminal(
            program, challenges[0], challenges[1], challenges[2], challenges[10]
        )
    )
    # io table terminals match the processor's
    assert tables["input"].terminals["evaluation"] == (
        tables["processor"].terminals["input_evaluation"]
    )
    assert tables["output"].terminals["evaluation"] == (
        tables["processor"].terminals["output_evaluation"]
    )
    # permutation terminals agree across tables
    assert tables["processor"].terminals["instruction_permutation"] == (
        tables["instruction"].terminals["permutation"]
    )
    assert tables["processor"].terminals["memory_permutation"] == (
        tables["memory"].terminals["permutation"]
    )


def test_extend_matches_reference():
    from conftest import add_reference_to_path, reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    from algebra import BaseField, BaseFieldElement
    from extension_field import ExtensionField, ExtensionFieldElement
    from instruction_table import InstructionTable as RefInstr
    from io_table import InputTable as RefIn, OutputTable as RefOut
    from memory_table import MemoryTable as RefMem
    from processor_table import ProcessorTable as RefProc
    from univariate import Polynomial
    from vm import VirtualMachine as RefVM

    bf = BaseField.main()
    xfield = ExtensionField.main()

    def to_x(t):
        return ExtensionFieldElement(
            Polynomial([BaseFieldElement(int(c), bf) for c in t]), xfield
        )

    def from_x(e):
        cs = [c.value for c in e.polynomial.coefficients]
        return tuple(cs + [0] * (3 - len(cs)))

    src, inp = ",+.", "a"
    program, trace, tables = make_tables(src, inp)
    challenges = [rand_x() for _ in range(11)]
    initials = [rand_x() for _ in range(2)]

    order = 1 << 32
    gen = bf.primitive_nth_root(order)
    rt = trace["processor"].shape[0]
    ref_tables = [
        RefProc(bf, rt, 1, gen, order),
        RefInstr(bf, rt + len(program), 1, gen, order),
        RefMem(bf, trace["memory"].shape[0], 1, gen, order),
        RefIn(bf, trace["input"].shape[0], gen, order),
        RefOut(bf, trace["output"].shape[0], gen, order),
    ]
    mats = ["processor", "instruction", "memory", "input", "output"]
    for rt_, key in zip(ref_tables, mats):
        rt_.matrix = [
            [BaseFieldElement(int(v), bf) for v in row]
            for row in trace[key]
        ]
        if len(rt_.matrix) > 0:
            rt_.pad()
        rt_.codewords = []
        rt_.extend([to_x(c) for c in challenges], [to_x(i) for i in initials])

    ours = tables
    for t in ours.values():
        if len(t.matrix) > 0:
            t.pad()
        t.extend(challenges, initials, np)

    for rt_, key in zip(ref_tables, mats):
        t = ours[key]
        ref_ext = [
            [from_x(row[j]) for j in range(t.base_width, t.full_width)]
            for row in rt_.matrix
        ]
        got = [
            [tuple(int(c) for c in t.xcolumns[i, j]) for j in range(t.num_ext_columns)]
            for i in range(t.height)
        ]
        assert got == ref_ext, f"extension columns differ for {key}"

    # terminals
    assert from_x(ref_tables[0].instruction_permutation_terminal) == (
        ours["processor"].terminals["instruction_permutation"]
    )
    assert from_x(ref_tables[0].memory_permutation_terminal) == (
        ours["processor"].terminals["memory_permutation"]
    )
    assert from_x(ref_tables[0].input_evaluation_terminal) == (
        ours["processor"].terminals["input_evaluation"]
    )
    assert from_x(ref_tables[0].output_evaluation_terminal) == (
        ours["processor"].terminals["output_evaluation"]
    )
    assert from_x(ref_tables[1].evaluation_terminal) == (
        ours["instruction"].terminals["evaluation"]
    )


def test_degree_bounds_match_reference():
    from conftest import add_reference_to_path, reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    from algebra import BaseField
    from extension_field import ExtensionField
    from instruction_table import InstructionTable as RefInstr
    from memory_table import MemoryTable as RefMem
    from processor_table import ProcessorTable as RefProc

    bf = BaseField.main()
    xfield = ExtensionField.main()
    ones = [xfield.one()] * 11
    order = 1 << 32
    gen = bf.primitive_nth_root(order)

    pairs = [
        (ProcessorTable(42, 1), RefProc(bf, 42, 1, gen, order)),
        (InstructionTable(50, 1), RefInstr(bf, 50, 1, gen, order)),
        (MemoryTable(30, 1), RefMem(bf, 30, 1, gen, order)),
    ]
    for ours, ref in pairs:
        ref_airs = ref.transition_constraints_ext(ones)
        our_airs = ours.symbolic_transition_constraints([xf.H_ONE] * 11)
        assert len(ref_airs) == len(our_airs)
        bounds = [ours.interpolant_degree()] * (2 * ours.full_width)
        for ra, oa in zip(ref_airs, our_airs):
            assert ra.symbolic_degree_bound(bounds) == oa.symbolic_degree_bound(
                bounds
            ), f"degree bound mismatch in {ours.name}"
