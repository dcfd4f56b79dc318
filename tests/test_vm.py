"""VM tests: compile/run/simulate semantics, cross-checked against the
reference implementation (mirrors ref test_vm.py strategy)."""

import numpy as np
import pytest

from stark_brainfuck_tpu.vm.machine import VirtualMachine, derive_memory_matrix

HELLO = (
    "++++++++[>++++[>++>+++>+++>+<<<<-]>+>+>->>+[<]<-]>>.>---.+++++++.."
    "+++.>>.<-.<.+++.------.--------.>>+.>++."
)


def test_compile_jump_targets():
    program = VirtualMachine.compile("+[>+<-]+")
    # `+[9>+<-]3+` — loop ends recorded inline
    assert program == [ord("+"), ord("["), 9, ord(">"), ord("+"), ord("<"),
                       ord("-"), ord("]"), 3, ord("+")]


def test_run_hello_world():
    program = VirtualMachine.compile(HELLO)
    rt, inp, out = VirtualMachine.run(program)
    assert out == "Hello World!\n"
    assert rt > len(HELLO)


def test_run_with_input():
    program = VirtualMachine.compile(",+.")
    rt, inp, out = VirtualMachine.run(program, "a")
    assert out == "b"


def test_simulate_matches_run():
    program = VirtualMachine.compile("++>+<[->+<]")
    rt, _, out = VirtualMachine.run(program)
    trace = VirtualMachine.simulate(program)
    assert trace["processor"].shape[0] == rt
    assert trace["output_data"] == out
    # instruction matrix = program rows + one per cycle, sorted by address
    assert trace["instruction"].shape[0] == rt + len(program)
    addrs = trace["instruction"][:, 0]
    assert np.all(addrs[:-1] <= addrs[1:])


def test_simulate_matches_reference():
    from conftest import add_reference_to_path, reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    from vm import VirtualMachine as RefVM

    for src, inp in [("++++", ""), ("++>+<[->+<]", ""), (",+.", "a"), (HELLO, "")]:
        program = VirtualMachine.compile(src)
        ref_program = RefVM.compile(src)
        assert program == [p.value for p in ref_program]

        trace = VirtualMachine.simulate(program, inp)
        rp, rm, ri, rin, rout = RefVM.simulate(ref_program, list(inp))

        assert trace["processor"].tolist() == [
            [e.value for e in row] for row in rp
        ]
        assert trace["memory"].tolist() == [[e.value for e in row] for row in rm]
        assert trace["instruction"].tolist() == [
            [e.value for e in row] for row in ri
        ]
        assert trace["input"].tolist() == [[e.value for e in row] for row in rin]
        assert trace["output"].tolist() == [[e.value for e in row] for row in rout]


def test_memory_matrix_dummy_rows():
    # program with a clk gap for a revisited cell
    program = VirtualMachine.compile("+>++<-")
    trace = VirtualMachine.simulate(program)
    mem = trace["memory"]
    # dummy rows fill clk gaps within each mp group
    for i in range(len(mem) - 1):
        if mem[i][1] == mem[i + 1][1]:
            assert int(mem[i + 1][0]) == int(mem[i][0]) + 1


def test_run_interactive_stdin_fallback(monkeypatch):
    """',' past the provided input falls back to live stdin (the
    reference's _Getch behavior, ref vm.py:13-54,151-158); the returned
    input string includes the interactively-consumed characters."""
    import io

    monkeypatch.setattr("sys.stdin", io.StringIO("zq"))
    program = VirtualMachine.compile(",.,.")
    rt, consumed, out = VirtualMachine.run(program, "")
    assert out == "zq"
    assert consumed == "zq"

    # exhausted stdin raises EOFError instead of asserting
    monkeypatch.setattr("sys.stdin", io.StringIO(""))
    import pytest

    with pytest.raises(EOFError):
        VirtualMachine.run(VirtualMachine.compile(","), "")
