"""FRI low-degree test: vectorized commit/fold, query, verify.

Protocol flow matches ref `fri.py:13-319` (iterated split-and-fold with the
(1 ± α/x)/2 combination, per-round Merkle commitments, colinearity spot
checks, explicit last-codeword interpolation), with the folding and domain
arithmetic as whole-codeword vectorized ops and the last-codeword degree
check via coset INTT instead of Lagrange interpolation.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..ops import field as f
from ..ops import ntt as nt
from ..ops import xfield as xf
from .channel import (
    ProofStream,
    encode_leaf,
    sample_indices_fri,
)
from .merkle import Merkle

U64 = np.uint64


class FriDomain:
    """The coset offset·⟨omega⟩ of size `length` (ref fri.py:14-44)."""

    def __init__(self, offset: int, omega: int, length: int):
        self.offset = offset
        self.omega = omega
        self.length = length

    def __call__(self, index: int) -> int:
        return f.h_mul(f.h_pow(self.omega, index), self.offset)

    def array(self, xp=np):
        return f.mul(f.powers(self.omega, self.length, xp),
                     xp.asarray(self.offset, dtype=xp.uint64), xp)

    def xevaluate(self, xcoeffs, xp=np):
        """Evaluate an extension polynomial (coeffs (d, 3)) on the domain."""
        c = xp.moveaxis(xcoeffs, -1, 0)  # (3, d)
        out = nt.coset_evaluate(c, self.offset, self.omega, self.length, xp)
        return xp.moveaxis(out, 0, -1)  # (length, 3)

    def xinterpolate(self, values, xp=np):
        """Interpolate extension values (N, 3) -> coefficients (N, 3)."""
        v = xp.moveaxis(values, -1, 0)
        c = nt.coset_interpolate(v, self.offset, self.omega, xp)
        return xp.moveaxis(c, 0, -1)


def _xleaf(arr_row) -> tuple:
    return tuple(int(v) for v in arr_row)


class _LazyLeaves:
    """Leaf-object view over a codeword array: tuples materialize on
    indexing (the native codec needs objects only at queried indices)."""

    def __init__(self, codeword: np.ndarray):
        self.codeword = codeword

    def __len__(self):
        return self.codeword.shape[0]

    def __getitem__(self, i: int) -> tuple:
        return _xleaf(self.codeword[i])


class Fri:
    def __init__(
        self,
        offset: int,
        omega: int,
        initial_domain_length: int,
        expansion_factor: int,
        num_colinearity_tests: int,
        codec=None,
    ):
        from .channel import NativeCodec

        self.domain = FriDomain(offset, omega, initial_domain_length)
        self.expansion_factor = expansion_factor
        self.num_colinearity_tests = num_colinearity_tests
        self.codec = codec if codec is not None else NativeCodec()
        assert self.num_rounds() >= 1, "FRI needs at least one round"

    def num_rounds(self) -> int:
        codeword_length = self.domain.length
        num = 0
        while codeword_length > self.expansion_factor:
            codeword_length //= 2
            num += 1
        return num

    # -- prover -------------------------------------------------------------

    def commit(self, codeword: np.ndarray, proof_stream: ProofStream,
               leaf_objs0=None):
        """codeword: (N, 3) u64. Returns (codewords, leaf-object lists,
        trees). Leaf-object lists preserve python identity across pushes —
        required for reference-format pickling, where repeated pushes of a
        leaf become pickle memo references."""
        offset = self.domain.offset
        omega = self.domain.omega
        trees: List[Merkle] = []
        codewords: List[np.ndarray] = []
        leaf_objs: List[list] = []
        two_inv = f.h_inverse(2)
        native = self.codec.name == "native"

        for r in range(self.num_rounds()):
            N = codeword.shape[0]
            if native:
                # leaves hashed straight from the codeword buffer; leaf
                # *objects* are only needed at the few queried indices
                objs = _LazyLeaves(codeword)
                tree = Merkle.from_buffer(
                    np.ascontiguousarray(codeword.astype("<u8")).tobytes(),
                    24, N,
                )
            else:
                if r == 0 and leaf_objs0 is not None:
                    objs = leaf_objs0
                else:
                    objs = [_xleaf(codeword[i]) for i in range(N)]
                tree = Merkle([self.codec.leaf_payload(o) for o in objs])
            if r > 0:
                proof_stream.push(tree.root())
            if r == self.num_rounds() - 1:
                leaf_objs.append(objs)
                break

            alpha = xf.h_sample(proof_stream.prover_fiat_shamir())
            codewords.append(codeword)
            leaf_objs.append(objs)
            trees.append(tree)

            # fold: new[i] = 2^-1·((1 + α/x_i)·cw[i] + (1 - α/x_i)·cw[i+N/2])
            # with 1/x_i = offset^-1·omega^-i in closed form
            half = N // 2
            inv_xs = f.mul(
                f.powers(f.h_inverse(omega), half, np),
                np.asarray(f.h_inverse(offset), dtype=U64), np,
            )  # (half,)
            a_over_x = xf.mul_base(
                np.broadcast_to(np.asarray(alpha, dtype=U64), (half, 3)),
                inv_xs, np,
            )
            one = xf.ones((half,), np)
            lo = xf.mul(xf.add(one, a_over_x, np), codeword[:half], np)
            hi = xf.mul(xf.sub(one, a_over_x, np), codeword[half:], np)
            codeword = f.mul(
                xf.add(lo, hi, np), np.asarray(two_inv, dtype=U64), np
            )

            omega = f.h_mul(omega, omega)
            offset = f.h_mul(offset, offset)

        last = leaf_objs[-1]
        if isinstance(last, _LazyLeaves):
            last = [last[i] for i in range(len(last))]
            leaf_objs[-1] = last
        proof_stream.push(last)
        codewords.append(codeword)
        return codewords, leaf_objs, trees

    def query(
        self,
        current_tree: Merkle,
        next_tree: Merkle,
        current_objs: list,
        next_objs: list,
        c_indices: List[int],
        proof_stream: ProofStream,
    ):
        a_indices = list(c_indices)
        b_indices = [i + len(current_objs) // 2 for i in c_indices]
        for s in range(self.num_colinearity_tests):
            proof_stream.push(
                (
                    current_objs[a_indices[s]],
                    current_objs[b_indices[s]],
                    next_objs[c_indices[s]],
                )
            )
        for s in range(self.num_colinearity_tests):
            proof_stream.push(current_tree.open(a_indices[s]))
            proof_stream.push(current_tree.open(b_indices[s]))
            proof_stream.push(next_tree.open(c_indices[s]))

    def query_last(
        self,
        current_tree: Merkle,
        current_objs: list,
        last_objs: list,
        c_indices: List[int],
        proof_stream: ProofStream,
    ):
        a_indices = list(c_indices)
        b_indices = [i + len(current_objs) // 2 for i in c_indices]
        for s in range(self.num_colinearity_tests):
            proof_stream.push(
                (
                    current_objs[a_indices[s]],
                    current_objs[b_indices[s]],
                    last_objs[c_indices[s]],
                )
            )
        for s in range(self.num_colinearity_tests):
            proof_stream.push(current_tree.open(a_indices[s]))
            proof_stream.push(current_tree.open(b_indices[s]))

    def prove(self, codeword: np.ndarray, proof_stream: ProofStream,
              leaf_objs0=None) -> List[int]:
        assert self.domain.length == codeword.shape[0]
        codewords, leaf_objs, trees = self.commit(
            codeword, proof_stream, leaf_objs0
        )

        top_level_indices = sample_indices_fri(
            proof_stream.prover_fiat_shamir(),
            codewords[1].shape[0] if len(codewords) > 1 else codewords[0].shape[0],
            codewords[-1].shape[0],
            self.num_colinearity_tests,
        )
        indices = list(top_level_indices)

        for i in range(len(trees) - 1):
            indices = [idx % (codewords[i].shape[0] // 2) for idx in indices]
            self.query(
                trees[i], trees[i + 1], leaf_objs[i], leaf_objs[i + 1],
                indices, proof_stream,
            )
        indices = [idx % codewords[-1].shape[0] for idx in indices]
        self.query_last(
            trees[-1], leaf_objs[len(trees) - 1], leaf_objs[-1], indices,
            proof_stream,
        )
        return top_level_indices

    # -- verifier -----------------------------------------------------------

    def verify(self, proof_stream: ProofStream, root: bytes) -> bool:
        omega = self.domain.omega
        offset = self.domain.offset

        roots = [root]
        alphas = []
        for r in range(self.num_rounds()):
            if r > 0:
                roots.append(proof_stream.pull())
            alphas.append(xf.h_sample(proof_stream.verifier_fiat_shamir()))

        last_codeword = proof_stream.pull()
        last_arr = np.asarray(last_codeword, dtype=U64)
        # hash the pulled objects directly: re-encoding must reproduce the
        # prover's leaf bytes (identity-sensitive in reference format)
        payloads = [self.codec.leaf_payload(el) for el in last_codeword]
        if roots[-1] != Merkle(payloads).root():
            return False  # last codeword does not match its root

        # low-degree check of the last codeword via coset INTT
        degree = (len(last_codeword) // self.expansion_factor) - 1
        last_omega, last_offset = omega, offset
        for _ in range(self.num_rounds() - 1):
            last_omega = f.h_mul(last_omega, last_omega)
            last_offset = f.h_mul(last_offset, last_offset)
        assert f.h_pow(last_omega, len(last_codeword)) == 1
        coeffs = FriDomain(last_offset, last_omega, len(last_codeword)).xinterpolate(
            last_arr, np
        )
        if np.any(coeffs[degree + 1 :] != 0):
            return False  # last codeword exceeds the degree bound

        top_level_indices = sample_indices_fri(
            proof_stream.verifier_fiat_shamir(),
            self.domain.length >> 1,
            self.domain.length >> (self.num_rounds() - 1),
            self.num_colinearity_tests,
        )

        for r in range(self.num_rounds() - 1):
            c_indices = [
                idx % (self.domain.length >> (r + 1)) for idx in top_level_indices
            ]
            a_indices = list(c_indices)
            b_indices = [
                idx + (self.domain.length >> (r + 1)) for idx in a_indices
            ]

            aa, bb, cc = [], [], []
            for s in range(self.num_colinearity_tests):
                ay, by, cy = proof_stream.pull()
                aa.append(ay)
                bb.append(by)
                cc.append(cy)
                ax = f.h_mul(offset, f.h_pow(omega, a_indices[s]))
                bx = f.h_mul(offset, f.h_pow(omega, b_indices[s]))
                if not _colinear(ax, ay, bx, by, alphas[r], cy):
                    return False  # colinearity check failure

            for s in range(self.num_colinearity_tests):
                path = proof_stream.pull()
                if not Merkle.verify(
                    roots[r], a_indices[s], path, self.codec.leaf_payload(aa[s])
                ):
                    return False
                path = proof_stream.pull()
                if not Merkle.verify(
                    roots[r], b_indices[s], path, self.codec.leaf_payload(bb[s])
                ):
                    return False
                if r + 1 != self.num_rounds() - 1:
                    path = proof_stream.pull()
                    if not Merkle.verify(
                        roots[r + 1], c_indices[s], path,
                        self.codec.leaf_payload(cc[s]),
                    ):
                        return False

            if r + 1 == self.num_rounds() - 1:
                for s in range(self.num_colinearity_tests):
                    if list(cc[s]) != [int(v) for v in last_codeword[c_indices[s]]]:
                        return False  # last-round leaf mismatch

            omega = f.h_mul(omega, omega)
            offset = f.h_mul(offset, offset)

        return True


def _colinear(ax: int, ay: tuple, bx: int, by: tuple, cx: tuple, cy: tuple) -> bool:
    """Check (cx, cy) lies on the line through (ax, ay), (bx, by); ax/bx are
    base-field, the rest extension (ref univariate.py:190-194 semantics)."""
    dx_inv = xf.h_from_base(f.h_inverse(f.h_sub(bx, ax)))
    slope = xf.h_mul(xf.h_sub(by, ay), dx_inv)
    expected = xf.h_add(
        ay, xf.h_mul(slope, xf.h_sub(cx, xf.h_from_base(ax)))
    )
    return expected == cy
