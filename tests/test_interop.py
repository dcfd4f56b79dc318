"""Cross-implementation transcript interop.

The hardest compatibility gate (SURVEY §7): Fiat-Shamir hashes pickled
object prefixes, so byte-level agreement is required for proofs to cross
implementations. Tests:

  - our prover (codec='ref') -> reference BrainfuckStark.verify accepts;
  - reference prover -> our verifier (codec='ref') accepts;
  - our ref-codec proof verifies under our own ref-codec verifier.
"""

import os

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine

SRC = "++++"


def our_instance(codec="ref", seed=0):
    program = VirtualMachine.compile(SRC)
    trace = VirtualMachine.simulate(program)
    bfs = BrainfuckStark(
        running_time=trace["processor"].shape[0],
        memory_length=trace["memory"].shape[0],
        program=program,
        input_symbols="",
        output_symbols=trace["output_data"],
        config=StarkConfig(seed=seed, codec=codec),
    )
    return bfs, trace


def test_ref_codec_roundtrip():
    """Our ref-format proof verifies under our own ref-codec verifier."""
    bfs, trace = our_instance()
    proof = bfs.prove(
        trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"], xp=np,
    )
    assert bfs.verify(proof)


def test_ref_codec_rejects_tamper():
    bfs, trace = our_instance()
    proof = bfs.prove(
        trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"], xp=np,
    )
    import pickle

    from stark_brainfuck_tpu.interop.ref_shims import ensure_ref_modules

    ensure_ref_modules()
    objects = pickle.loads(proof)
    # corrupt the first terminal
    t = objects[2]
    t.polynomial.coefficients[0].value = (
        t.polynomial.coefficients[0].value + 1
    ) % (2**64 - 2**32 + 1)
    assert not bfs.verify(pickle.dumps(objects))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_our_proof_accepted_by_reference_verifier():
    add_reference_to_path()
    # the reference modules must be the ones pickle resolves
    import importlib

    bfs, trace = our_instance()
    proof = bfs.prove(
        trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"], xp=np,
    )

    from brainfuck_stark import BrainfuckStark as RefStark
    from vm import VirtualMachine as RefVM

    program = RefVM.compile(SRC)
    ref = RefStark(
        trace["processor"].shape[0], trace["memory"].shape[0], program,
        [], list(trace["output_data"]),
    )
    assert ref.verify(proof), (
        "reference verifier must accept our ref-format proof"
    )


GOLDEN_REF_PROOF = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "vectors", "ref_proof_plus4.bin"
)


def test_reference_proof_accepted_by_our_verifier():
    """Golden vector: a proof produced by the unmodified reference prover
    (scripts/measure_reference.py environment) for `++++`. Our ref-codec
    verifier must accept it."""
    proof = open(GOLDEN_REF_PROOF, "rb").read()
    bfs, _ = our_instance()
    assert bfs.verify(proof), (
        "our verifier must accept the reference prover's proof"
    )


@pytest.mark.skipif(
    not reference_available() or not os.environ.get("INTEROP_SLOW"),
    reason="set INTEROP_SLOW=1 to regenerate with the live reference prover "
    "(~8 min)",
)
def test_reference_proof_regenerated_live():
    add_reference_to_path()
    from brainfuck_stark import BrainfuckStark as RefStark
    from vm import VirtualMachine as RefVM

    program = RefVM.compile(SRC)
    rt, inp, out = RefVM.run(program)
    pm, mm, im, inm, om = RefVM.simulate(program, inp)
    ref = RefStark(rt, len(mm), program, inp, out)
    ref_proof = ref.prove(program, pm, mm, im, inm, om)
    assert ref.verify(ref_proof), "sanity: reference roundtrip"

    bfs, _ = our_instance()
    assert bfs.verify(ref_proof), (
        "our verifier must accept the reference prover's proof"
    )


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_our_io_proof_accepted_by_reference_verifier():
    """I/O programs exercise the IO tables' iota^(height-length) terminal
    offsets and the input/output evaluation arguments across the format
    boundary."""
    add_reference_to_path()

    src, inp = ",+.", "a"
    program = VirtualMachine.compile(src)
    trace = VirtualMachine.simulate(program, inp)
    bfs = BrainfuckStark(
        running_time=trace["processor"].shape[0],
        memory_length=trace["memory"].shape[0],
        program=program,
        input_symbols=inp,
        output_symbols=trace["output_data"],
        config=StarkConfig(seed=0, codec="ref"),
    )
    proof = bfs.prove(
        trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"], xp=np,
    )
    assert bfs.verify(proof)

    from brainfuck_stark import BrainfuckStark as RefStark
    from vm import VirtualMachine as RefVM

    ref_program = RefVM.compile(src)
    ref = RefStark(
        trace["processor"].shape[0], trace["memory"].shape[0], ref_program,
        list(inp), list(trace["output_data"]),
    )
    assert ref.verify(proof)


def test_shim_only_ref_codec_roundtrip():
    """The interop codec must work WITHOUT the reference repo mounted
    (shim classes only). Run in a clean subprocess that blocks the
    reference path."""
    import subprocess
    import sys

    code = r"""
import sys
sys.path = [p for p in sys.path if "reference" not in p]
import numpy as np
from stark_brainfuck_tpu import BrainfuckStark, StarkConfig, VirtualMachine

program = VirtualMachine.compile("++++")
trace = VirtualMachine.simulate(program)
bfs = BrainfuckStark(
    trace["processor"].shape[0], trace["memory"].shape[0], program, "",
    trace["output_data"], StarkConfig(seed=0, codec="ref"),
)
proof = bfs.prove(trace["processor"], trace["memory"], trace["instruction"],
                  trace["input"], trace["output"], xp=np)
assert bfs.verify(proof)
# the shims must also parse a proof pickled by the real reference classes
golden = open("tests/vectors/ref_proof_plus4.bin", "rb").read()
assert bfs.verify(golden), "shims must parse the reference-produced proof"
print("SHIM_OK")
"""
    env = dict(
        JAX_PLATFORMS="cpu",
        PATH="/usr/bin:/bin:/usr/local/bin",
        HOME="/tmp",
    )
    import os

    env.update({k: v for k, v in os.environ.items() if k.startswith("LD_")})
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert "SHIM_OK" in out.stdout, out.stderr[-2000:]


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_midsize_proof_accepted_by_reference_verifier():
    """A ~2^8-cycle workload (FRI domain 2^14) through the ref codec: our
    host prover's proof must be accepted by the unmodified reference
    verifier — format compatibility beyond the T<=6 toy cases (VERDICT r2
    item 8)."""
    add_reference_to_path()
    src = "+" * 12 + "[->++++[-]<]"  # ~270 cycles
    program = VirtualMachine.compile(src)
    trace = VirtualMachine.simulate(program)
    assert trace["processor"].shape[0] >= 200
    bfs = BrainfuckStark(
        trace["processor"].shape[0], trace["memory"].shape[0], program,
        "", trace["output_data"], StarkConfig(seed=1, codec="ref"),
    )
    proof = bfs.prove(
        trace["processor"], trace["memory"], trace["instruction"],
        trace["input"], trace["output"], xp=np,
    )

    from brainfuck_stark import BrainfuckStark as RefStark
    from vm import VirtualMachine as RefVM

    ref_program = RefVM.compile(src)
    ref = RefStark(
        trace["processor"].shape[0], trace["memory"].shape[0], ref_program,
        [], list(trace["output_data"]),
    )
    assert ref.verify(proof), (
        "reference verifier must accept our mid-size ref-format proof"
    )
