"""FRI low-degree test: vectorized commit/fold, query, verify.

Protocol flow matches ref `fri.py:13-319` (iterated split-and-fold with the
(1 ± α/x)/2 combination, per-round Merkle commitments, colinearity spot
checks, explicit last-codeword interpolation), with the folding and domain
arithmetic as whole-codeword vectorized ops and the last-codeword degree
check via coset INTT instead of Lagrange interpolation.

Device path (jax backend + native codec): the codeword stays resident on
the device; each round's fold is a jitted elementwise kernel and each
round's Merkle tree is built by the vectorized BLAKE2b kernel
(protocol/device_merkle.py). Only roots, query openings and the (tiny)
last codeword ever cross to the host — the transcript bytes are identical
to the host path's.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..ops import field as f
from ..ops import ntt as nt
from ..ops import xfield as xf
from .channel import (
    ProofStream,
    encode_leaf,
    reject,
    sample_indices_fri,
)
from .merkle import Merkle

U64 = np.uint64

_FOLD_CACHE: Dict[tuple, object] = {}


def _fold_math(cw, alpha, ixs, xp):
    """new[i] = 2^-1·((1 + α/x_i)·cw[i] + (1 - α/x_i)·cw[i+N/2])
    (ref fri.py:127-128). ixs = 1/x_i for the half-domain."""
    two_inv = f.h_inverse(2)
    half = cw.shape[0] // 2
    a_over_x = xf.mul_base(
        xp.broadcast_to(alpha[None, :], (half, 3)), ixs, xp
    )
    one = xf.ones((half,), xp)
    lo = xf.mul(xf.add(one, a_over_x, xp), cw[:half], xp)
    hi = xf.mul(xf.sub(one, a_over_x, xp), cw[half:], xp)
    return f.mul(
        xf.add(lo, hi, xp), xp.asarray(two_inv, dtype=xp.uint64), xp
    )


def _fold_device(codeword, alpha_arr, omega: int, offset: int, xp,
                 with_tree: bool = False, mesh=None):
    """One jitted FRI fold round on the device; with_tree=True additionally
    builds the folded codeword's whole Merkle tree in the SAME dispatch
    (fold + tree = one executable, one host round-trip per round). The
    1/x_i = offset^-1·omega^-i table is generated in-graph (log-depth
    doubling from the static round constants) — no per-round host
    precompute or upload. Jitted per (length, omega, offset, with_tree) —
    a handful of shapes per proof."""
    import jax

    key = (int(codeword.shape[0]), with_tree, mesh)
    if key not in _FOLD_CACHE:
        half = int(codeword.shape[0]) // 2

        def shard(arr):
            if mesh is None:
                return arr
            from ..parallel.mesh import codeword_spec

            return jax.lax.with_sharding_constraint(
                arr, codeword_spec(mesh, arr.ndim, 0)
            )

        def inv_xs(seeds):
            # seeds = [offset^-1, omega^-1] as a runtime ARGUMENT (embedding
            # them as constants would make XLA constant-fold the whole
            # O(N) doubling chain at compile time)
            return f.geometric_rows(seeds[0:1], seeds[1:2], half, xp)[0]

        if with_tree:
            from .device_merkle import build_levels, default_cut

            tree_cut = default_cut(half)

            def fold(cw, alpha, seeds):
                new_cw = shard(_fold_math(cw, alpha, inv_xs(seeds), xp))
                return new_cw, build_levels(new_cw, None, xp, tree_cut)
        else:
            def fold(cw, alpha, seeds):
                return shard(_fold_math(cw, alpha, inv_xs(seeds), xp))

        if mesh is None:
            from ..utils.aot import aot_jit

            _FOLD_CACHE[key] = aot_jit(
                f"fri.fold.n{codeword.shape[0]}.tree{int(with_tree)}", fold
            )
        else:
            _FOLD_CACHE[key] = jax.jit(fold)
    seeds = xp.asarray(
        np.asarray([f.h_inverse(offset), f.h_inverse(omega)], dtype=U64)
    )
    return _FOLD_CACHE[key](codeword, alpha_arr, seeds)


class _DeviceTreeLeaves:
    """Leaf-object view over a device Merkle tree: tuples materialize from
    prefetched/gathered rows only at queried indices."""

    def __init__(self, tree):
        self.tree = tree

    def __len__(self):
        return self.tree.num_leafs

    def __getitem__(self, i: int) -> tuple:
        return tuple(int(v) for v in self.tree.row_at(i))


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

    def evaluate(self, coeffs, xp=np):
        """Evaluate a base-field polynomial (coeffs (d,)) on the domain
        (ref fri.py:26-30)."""
        return nt.coset_evaluate(
            coeffs[None, :], self.offset, self.omega, self.length, xp
        )[0]

    def interpolate(self, values, xp=np):
        """Interpolate base-field values (length,) -> coefficients
        (ref fri.py:32-34)."""
        return nt.coset_interpolate(
            values[None, :], self.offset, self.omega, xp
        )[0]

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
        device_commit_min: int = 4096,
        host_min: Optional[int] = None,
    ):
        from .channel import NativeCodec

        self.domain = FriDomain(offset, omega, initial_domain_length)
        self.expansion_factor = expansion_factor
        self.num_colinearity_tests = num_colinearity_tests
        self.codec = codec if codec is not None else NativeCodec()
        self.device_commit_min = device_commit_min
        # rounds shorter than this run on the host even mid-device-prove:
        # a device round is bounded below by one blocking root fetch
        # (dispatch round-trip latency), a short host round by a few ms of
        # numpy fold + native tree (config.fri_host_min rationale)
        self.host_min = max(device_commit_min, host_min or 0)
        self.mesh = None  # set by the STARK orchestrator under mesh_shape
        assert self.num_rounds() >= 1, "FRI needs at least one round"

    def num_rounds(self) -> int:
        codeword_length = self.domain.length
        num = 0
        while codeword_length > self.expansion_factor:
            codeword_length //= 2
            num += 1
        return num

    # -- prover -------------------------------------------------------------

    def commit(self, codeword, proof_stream: ProofStream, leaf_objs0=None,
               xp=np, tree0=None):
        """codeword: (N, 3) u64 (numpy, or a jax array for the device
        path). Returns (codewords, leaf-object lists, trees). Leaf-object
        lists preserve python identity across pushes — required for
        reference-format pickling, where repeated pushes of a leaf become
        pickle memo references. `tree0`, when given, is the caller's
        existing commitment to the round-0 codeword (the STARK's
        combination tree) — round 0 reuses it instead of rebuilding an
        identical full-size tree."""
        import time as _time

        offset = self.domain.offset
        omega = self.domain.omega
        trees: List[Merkle] = []
        codewords: List = []
        leaf_objs: List[list] = []
        two_inv = f.h_inverse(2)
        native = self.codec.name == "native"
        on_device = native and xp is not np

        # per-round wall time (commit side): each entry spans one
        # fold+tree+root+Fiat-Shamir iteration; surfaced through
        # BrainfuckStark.last_metrics as fri_round_s
        self.last_round_s: List[float] = []
        _t_round = _time.time()

        pending_tree = None  # device tree built by the previous fused fold
        for r in range(self.num_rounds()):
            N = int(codeword.shape[0])
            if on_device and N < self.host_min:
                # tail rounds are tiny — finish on host (to_host: one
                # transfer; multi-process safe)
                from ..parallel.multihost import to_host

                codeword = np.asarray(to_host(codeword), dtype=U64)
                on_device = False
                pending_tree = None
            if r == 0 and tree0 is not None:
                tree = tree0
                if native:
                    objs = (
                        _DeviceTreeLeaves(tree)
                        if on_device
                        else _LazyLeaves(codeword)
                    )
                else:
                    objs = leaf_objs0
            elif pending_tree is not None:
                tree = pending_tree
                pending_tree = None
                objs = _DeviceTreeLeaves(tree)
            elif on_device:
                from .device_merkle import DeviceMerkle

                tree = DeviceMerkle(codeword, xp)
                objs = _DeviceTreeLeaves(tree)
            elif native:
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
            if on_device:
                from .device_merkle import _HOST_CUT, DeviceMerkle

                # build the NEXT round's tree inside the same dispatch when
                # it will still live on the device
                build_next = (
                    half >= self.host_min and half > _HOST_CUT
                )
                from .device_merkle import BUILD_CHUNK

                if build_next and half > BUILD_CHUNK:
                    # beyond the chunked-builder bound, the fused graph's
                    # unchunked leaf hash materializes a lane-padded
                    # message transpose of the WHOLE folded codeword
                    # (16 GB at a 2^25-leaf round — round-5 OOM): fold
                    # alone, then the chunked tree builder
                    codeword = _fold_device(
                        codeword,
                        xp.asarray(np.asarray(alpha, dtype=U64)),
                        omega, offset, xp, mesh=self.mesh,
                    )
                    pending_tree = DeviceMerkle(codeword, xp)
                elif build_next:
                    codeword, levels = _fold_device(
                        codeword,
                        xp.asarray(np.asarray(alpha, dtype=U64)),
                        omega, offset, xp,
                        with_tree=True, mesh=self.mesh,
                    )
                    from .device_merkle import default_cut as _dc

                    pending_tree = DeviceMerkle(
                        codeword, xp, levels=levels, cut=_dc(half)
                    )
                else:
                    codeword = _fold_device(
                        codeword,
                        xp.asarray(np.asarray(alpha, dtype=U64)),
                        omega, offset, xp, mesh=self.mesh,
                    )
            else:
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
            now = _time.time()
            self.last_round_s.append(round(now - _t_round, 4))
            _t_round = now

        last = leaf_objs[-1]
        if isinstance(last, (_LazyLeaves, _DeviceTreeLeaves)):
            if isinstance(last, _DeviceTreeLeaves):
                last.tree.prefetch(range(len(last)))
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
        if hasattr(current_tree, "prefetch"):
            current_tree.prefetch(a_indices + b_indices)
        if hasattr(next_tree, "prefetch"):
            next_tree.prefetch(c_indices)
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
        if hasattr(current_tree, "prefetch"):
            current_tree.prefetch(a_indices + b_indices)
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

    def prove(self, codeword, proof_stream: ProofStream,
              leaf_objs0=None, xp=np, tree0=None) -> List[int]:
        assert self.domain.length == codeword.shape[0]
        codewords, leaf_objs, trees = self.commit(
            codeword, proof_stream, leaf_objs0, xp=xp, tree0=tree0
        )

        top_level_indices = sample_indices_fri(
            proof_stream.prover_fiat_shamir(),
            codewords[1].shape[0] if len(codewords) > 1 else codewords[0].shape[0],
            codewords[-1].shape[0],
            self.num_colinearity_tests,
        )
        indices = list(top_level_indices)

        # every round's query indices are known now — gather all device
        # trees' openings in ONE host round trip instead of 2 per round
        from .device_merkle import DeviceMerkle, prefetch_trees

        want = {}
        probe = list(top_level_indices)
        for i in range(len(trees)):
            half = codewords[i].shape[0] // 2
            probe = [idx % half for idx in probe]
            s = want.setdefault(id(trees[i]), (trees[i], set()))[1]
            s.update(probe)
            s.update(idx + half for idx in probe)
            if i + 1 < len(leaf_objs) and i + 1 < len(trees):
                s2 = want.setdefault(
                    id(trees[i + 1]), (trees[i + 1], set())
                )[1]
                s2.update(probe)
        batch = [
            (tree, sorted(idxs))
            for tree, idxs in want.values()
            if isinstance(tree, DeviceMerkle)
        ]
        if batch:
            prefetch_trees(batch)

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
        self.last_rejection = None
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
            return reject(
                self, "FRI: last codeword does not match its Merkle root"
            )

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
            nz = np.nonzero(np.any(coeffs != 0, axis=1))[0]
            return reject(
                self,
                f"FRI: last codeword has degree {int(nz[-1])}, exceeding "
                f"the bound {degree}",
            )

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
                    return reject(
                        self,
                        f"FRI: colinearity check {s} failed in round {r} "
                        f"(indices a={a_indices[s]}, b={b_indices[s]}, "
                        f"c={c_indices[s]})",
                    )

            for s in range(self.num_colinearity_tests):
                path = proof_stream.pull()
                if not Merkle.verify(
                    roots[r], a_indices[s], path, self.codec.leaf_payload(aa[s])
                ):
                    return reject(
                        self,
                        f"FRI: Merkle path for a-leaf {a_indices[s]} "
                        f"rejected in round {r}",
                    )
                path = proof_stream.pull()
                if not Merkle.verify(
                    roots[r], b_indices[s], path, self.codec.leaf_payload(bb[s])
                ):
                    return reject(
                        self,
                        f"FRI: Merkle path for b-leaf {b_indices[s]} "
                        f"rejected in round {r}",
                    )
                if r + 1 != self.num_rounds() - 1:
                    path = proof_stream.pull()
                    if not Merkle.verify(
                        roots[r + 1], c_indices[s], path,
                        self.codec.leaf_payload(cc[s]),
                    ):
                        return reject(
                            self,
                            f"FRI: Merkle path for c-leaf {c_indices[s]} "
                            f"rejected in round {r + 1}",
                        )

            if r + 1 == self.num_rounds() - 1:
                for s in range(self.num_colinearity_tests):
                    if list(cc[s]) != [int(v) for v in last_codeword[c_indices[s]]]:
                        return reject(
                            self,
                            f"FRI: folded value at index {c_indices[s]} "
                            f"does not match the last codeword",
                        )

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
