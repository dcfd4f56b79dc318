"""stark_brainfuck_tpu — a TPU-native STARK proving stack for Brainfuck.

A from-scratch JAX/XLA/Pallas re-design (NOT a port) of the capability set of
the reference implementation `aszepieniec/stark-brainfuck`:

  - Brainfuck compiler / VM / trace recorder          (vm/)
  - AIR arithmetization: processor, memory, instruction, input, output tables
    with permutation and evaluation arguments          (models/)
  - Goldilocks field p = 2^64 - 2^32 + 1 and its cubic extension, radix-2 NTT,
    low-degree extension, batched inversion            (ops/)
  - Salted/plain Merkle commitments, Fiat-Shamir proof stream, FRI, and the
    two-stage RAP prover/verifier orchestration        (protocol/)
  - Device-mesh sharding of the hot kernels (LDE NTTs, quotient evaluation,
    FRI folding) via shard_map + collectives           (parallel/)
  - Transcript-format interop with the reference implementation (interop/)

The compute path is array-programming first: trace columns, codewords and
quotients are u64 tensors; every hot loop of the reference (per-column
interpolation, per-point constraint evaluation, codeword folding) is a jitted
vectorized kernel.
"""

import sys

import jax

# The Goldilocks field needs exact 64-bit integer arithmetic; XLA emulates
# u64 with 32-bit pairs on TPU.
jax.config.update("jax_enable_x64", True)

# Tracing/lowering the large-domain stages (N >= 2^22: MXU NTT plans, fused
# Merkle builders) nests Python frames close to CPython's default 1000-frame
# limit; the margin depends on caller depth, so a 2^16-cycle prove died in
# RecursionError from inside bench.py while the identical trace succeeded
# from a shallow REPL. Raise (never lower) the limit.
if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)

from .config import StarkConfig  # noqa: E402
from .vm.machine import VirtualMachine  # noqa: E402
from .protocol.stark import BrainfuckStark  # noqa: E402

__all__ = ["StarkConfig", "VirtualMachine", "BrainfuckStark"]
__version__ = "0.1.0"
