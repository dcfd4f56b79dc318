"""Streamed commitments over strided codeword blocks (BASELINE config 4).

At FRI domains of 2^26+ a single committed u64 codeword row is 0.5-1 GiB
and the ~50 committed rows cannot coexist in one chip's HBM. This module
evaluates and commits codewords in B *strided classes*

    class b = { i : i ≡ b (mod B) },   block size S = N/B,

because a degree-<d polynomial restricted to a class is a plain size-S
NTT: with x_i = offset·ω^i and i = b + B·q,

    f(x_i) = Σ_k c_k·offset^k·ω^{bk}·(ω^B)^{qk}
           = NTT_S[ fold_{k mod S}( c_k·offset^k·ω^{bk} ) ](q),

ω^B being a primitive S-th root. So per block: one (1, d) geometric scale
row, a segment-fold, and one batched size-S NTT — the coefficient arrays
(H-sized, tiny) are the only persistent state.

Merkle accumulation: adjacent leaves 2t, 2t+1 live in classes (r, r+1) at
the same position q, so processing classes in order 0..B-1 and combining
level-k class pairs as they complete (a binary counter, log2(B) pending
(S, 8) digest arrays) yields the level-log2(B) digests — the natural-order
node array whose entry q covers leaves [q·B, (q+1)·B). The upper tree is
an ordinary ladder; levels below log2(B) are never stored. Query-time
openings re-evaluate the blocks (a second streaming pass), gather the
opened positions, and rebuild the pruned bottom subtrees host-side —
bit-identical to the resident-tree transcript.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..ops import blake2b as B2
from ..ops import field as f
from ..ops import ntt as nt
from .device_merkle import (
    _HOST_CUT,
    DeviceMerkle,
    _salt_bytes,
    leaf_digests,
    salt_key_limbs,
    salt_words_device,
)

U64 = np.uint64


def fold_mod(coeffs, S: int, xp):
    """(rows, d) coefficient arrays -> (rows, S) folded mod S:
    out[m] = Σ_{k ≡ m (mod S)} c_k (zero-padded past d)."""
    rows, d = int(coeffs.shape[0]), int(coeffs.shape[1])
    segs = (d + S - 1) // S
    if segs * S > d:
        pad = xp.zeros((rows, segs * S - d), dtype=xp.uint64)
        coeffs = xp.concatenate([coeffs, pad], axis=1)
    if segs == 1:
        return coeffs
    x = coeffs.reshape(rows, segs, S)
    acc = x[:, 0]
    for j in range(1, segs):
        acc = f.add(acc, x[:, j], xp)
    return acc


def block_values(groups: Sequence, wb, scale_len: int, pack_S, S: int, xp):
    """Evaluate offset-prescaled coefficient groups on strided class b.

    groups: list of (rows_g, d_g) u64 arrays (c_k·offset^k, the same
    prescaling `lde_coefficients` applies). wb: (1,) u64 = ω^b (runtime
    arg — per-block data must not be baked in as constants). Returns the
    (Σ rows_g, S) values, group-concatenated, position order q = 0..S-1
    (leaf index b + B·q)."""
    one = xp.ones((1,), dtype=xp.uint64)
    scale = f.geometric_rows(one, wb, scale_len, xp)[0]  # ω^{bk}
    folded = [
        fold_mod(f.mul(g, scale[: g.shape[1]], xp), S, xp) for g in groups
    ]
    allc = folded[0] if len(folded) == 1 else xp.concatenate(folded, axis=0)
    return nt.ntt_with(allc, pack_S, xp)


class StreamAccumulator:
    """Binary-counter Merkle accumulation over class digest blocks: feed
    class digests in order b = 0..B-1 (optionally pre-reduced group
    digests at a given level); at most log2(B) (S, 8)-digest pairs are
    pending at any time."""

    def __init__(self, xp):
        self.xp = xp
        self.pending: Dict[int, tuple] = {}
        self._jit = None

    def _combine(self, left, right):
        xp = self.xp
        if xp is np:
            return B2.merkle_parents_pair(
                left[0], left[1], right[0], right[1], np
            )
        if self._jit is None:
            from ..utils.aot import aot_jit

            self._jit = aot_jit(
                "stream.acc_combine",
                lambda ll, lh, rl, rh: B2.merkle_parents_pair(
                    ll, lh, rl, rh, xp
                ),
            )
        return self._jit(left[0], left[1], right[0], right[1])

    def add(self, digests, level: int = 0):
        lvl = level
        d = digests
        while lvl in self.pending:
            left = self.pending.pop(lvl)
            d = self._combine(left, d)
            lvl += 1
        self.pending[lvl] = d

    def finish(self):
        assert len(self.pending) == 1, "class count must be a power of two"
        (lvl, d), = self.pending.items()
        self.pending = {}
        return lvl, d


def _ladder_levels(d, xp):
    """Digest ladder from an (S, 8) level down to the host cut (the upper
    part of the streamed tree). Jitted per shape on the jax backend."""
    def ladder(lo, hi):
        count = int(lo.shape[0])
        levels = [(lo, hi)]
        while count > max(_HOST_CUT, 1):
            lo, hi = B2.merkle_parents(lo, hi, xp)
            count //= 2
            levels.append((lo, hi))
        return tuple(levels)

    if xp is np:
        return ladder(d[0], d[1])
    from ..utils.aot import aot_jit

    return aot_jit("stream.ladder", ladder)(d[0], d[1])


class StreamedMerkle(DeviceMerkle):
    """Merkle tree whose leaf rows are NOT resident: constructed from the
    accumulator's level-log2(B) digests; openings require a `resolve()`
    call that supplies the opened leaf rows from a second streaming pass."""

    salted = False

    def __init__(self, n: int, num_classes: int, top_digests, xp,
                 salt_key: Optional[bytes] = None):
        cut = (num_classes - 1).bit_length()
        assert 1 << cut == num_classes
        self.cut = cut
        self.num_leafs = n
        self.num_classes = num_classes
        self.depth = (n - 1).bit_length()
        self.rows = None
        self.salt_words = None
        self.salt_key = salt_key
        self.xp = xp
        self.levels = tuple(_ladder_levels(top_digests, xp))
        self._finish_host_top()
        self._node_cache = {}
        self._row_cache = {}
        self._salt_cache = {}

    def resolve(self, indices, rows_for_positions):
        """Make `indices` openable: `rows_for_positions(positions)` is the
        prover's second streaming pass — it must return a host uint64 array
        of shape (len(positions), B, k) with entry [j, b] = the zipped leaf
        row of index positions[j]·B + b. Rebuilds the pruned bottom
        subtrees from those rows (+ recomputed salts) host-side."""
        B = self.num_classes
        positions = sorted(
            {int(i) >> self.cut for i in indices
             if int(i) not in self._row_cache}
        )
        if not positions:
            return
        rows = np.asarray(rows_for_positions(positions), dtype=U64)
        assert rows.shape[:2] == (len(positions), B)
        leaf_idx = []
        for j, q in enumerate(positions):
            for b in range(B):
                i = q * B + b
                self._row_cache[i] = rows[j, b]
                leaf_idx.append(i)
        if self.salt_key is not None:
            words = np.asarray(
                salt_words_host(self.salt_key, np.asarray(leaf_idx))
            )
            for j, i in enumerate(leaf_idx):
                self._salt_cache[i] = _salt_bytes(words[j])
        self._rebuild_bottom(leaf_idx)

    def prefetch_plan(self, indices):
        idx = sorted({int(i) for i in indices})
        missing = [i for i in idx if i not in self._row_cache]
        if missing:
            raise RuntimeError(
                "streamed tree: call resolve() before opening "
                f"(unresolved indices {missing[:4]}...)"
            )
        per_level: List[List[int]] = []
        for j in range(self._device_level_count()):
            lvl = self.cut + j
            sibs = sorted({(i >> lvl) ^ 1 for i in idx})
            sibs = [s for s in sibs if (lvl, s) not in self._node_cache]
            per_level.append(sibs)
        gathered = []
        xp = self.xp
        for j, sibs in enumerate(per_level):
            if sibs:
                lidx = xp.asarray(sibs, dtype=xp.int32)
                gathered.append(xp.take(self.levels[j][0], lidx, axis=0))
                gathered.append(xp.take(self.levels[j][1], lidx, axis=0))
        return ([], per_level), gathered


class StreamedSaltedMerkle(StreamedMerkle):
    salted = True

    def __init__(self, n, num_classes, top_digests, xp, salt_key: bytes):
        super().__init__(n, num_classes, top_digests, xp, salt_key=salt_key)

    def salt_at(self, index: int) -> bytes:
        return self._salt_cache[index]

    def open(self, index: int):
        return self.salt_at(index), self._path(index)


def salt_words_host(seed_bytes: bytes, indices: np.ndarray):
    """Host salt PRF at explicit leaf indices (numpy backend)."""
    k_lo, k_hi = salt_key_limbs(seed_bytes)
    return salt_words_device(
        k_lo, k_hi, len(indices), np,
        indices=np.asarray(indices, dtype=np.uint32),
    )


def group_size_for(B: int, S: int, group_env: Optional[int] = None) -> int:
    """Classes per dispatch: amortize the per-dispatch host cost of a
    remote-tunnel backend without letting a group's transient block values
    grow past ~1 GiB (XLA frees each class's values before the next, but
    stay conservative)."""
    if group_env:
        return min(group_env, B)
    g = 1
    while g < B and g < 8 and g * S <= (1 << 23):
        g *= 2
    return g


def streamed_commit(groups, salt_key: Optional[bytes], plan, xp,
                    progress=None):
    """First streaming pass: evaluate + hash + accumulate every class.

    groups: offset-prescaled coefficient groups (device arrays).
    plan: dict with N, B, S, pack_S, omega (domain root), zip order is the
    group-concatenated row order — leaf row i = values[:, q] of class b.
    G consecutive classes are evaluated, hashed, AND pair-reduced log2(G)
    levels inside ONE dispatch (classes b0..b0+G-1 form complete sibling
    subtrees), so the host issues B/G calls with no per-class uploads —
    class constants (ω^b, salt counters) are generated in-graph from the
    one (B,) ω-power table.
    Returns a Streamed[Salted]Merkle."""
    N, B, S = plan["N"], plan["B"], plan["S"]
    pack_S = plan["pack_S"]
    omega = plan["omega"]
    scale_len = max(int(g.shape[1]) for g in groups)
    salted = salt_key is not None
    G = group_size_for(B, S, plan.get("group"))
    if salted:
        klo, khi = salt_key_limbs(salt_key)
        klo, khi = xp.asarray(klo), xp.asarray(khi)
    wbs = xp.asarray(
        np.asarray([f.h_pow(omega, b) for b in range(B)], dtype=U64)
    )
    biota = xp.asarray((np.arange(S, dtype=np.int64) * B).astype(np.uint32))

    def group_fn_body(gs, wbs_all, b0, pack, key_lo, key_hi):
        """b0 is a DYNAMIC scalar — one compiled executable serves all
        B/G dispatches of the streaming pass. The NTT pack AND the salt
        key limbs enter as runtime ARGUMENTS: closure capture would embed
        them as constants in the (name-keyed, cross-prove shared) AOT
        export — for the salt key that is a correctness bug, since every
        prove draws a fresh key."""
        dyn = xp is not np

        def slice1(arr, start):
            if dyn:
                import jax

                return jax.lax.dynamic_slice_in_dim(arr, start, 1)
            return arr[start : start + 1]

        digs = []
        for j in range(G):
            wb = slice1(wbs_all, b0 + j)
            vals = block_values(gs, wb, scale_len, pack, S, xp)
            rows = vals.T
            salts = None
            if salted:
                # leaf indices of class b: generated IN-graph (an iota op,
                # not an S-sized embedded literal)
                iota = (
                    xp.arange(S, dtype=xp.int64) * B
                    if dyn
                    else biota.astype(xp.int64)
                )
                bidx = (iota + (b0 + j)).astype(xp.uint32)
                salts = salt_words_device(key_lo, key_hi, S, xp, indices=bidx)
            digs.append(leaf_digests(rows, salts, xp))
        while len(digs) > 1:
            digs = [
                B2.merkle_parents_pair(
                    digs[2 * i][0], digs[2 * i][1],
                    digs[2 * i + 1][0], digs[2 * i + 1][1], xp,
                )
                for i in range(len(digs) // 2)
            ]
        return digs[0]

    if xp is np:
        group_fn = group_fn_body
    else:
        from ..utils.aot import aot_jit

        # B is baked into the closure (salt leaf indices iota·B), so it
        # must be part of the name-keyed registry/export key
        group_fn = aot_jit(
            f"stream.commit.G{G}.B{B}.S{S}.L{scale_len}.s{int(salted)}",
            group_fn_body,
        )

    if not salted:
        klo = khi = xp.zeros((2,), dtype=xp.uint32)
    acc = StreamAccumulator(xp)
    glvl = (G - 1).bit_length()
    for b0 in range(0, B, G):
        b0_arg = b0 if xp is np else xp.asarray(b0, dtype=xp.int32)
        acc.add(
            group_fn(tuple(groups), wbs, b0_arg, pack_S, klo, khi),
            level=glvl,
        )
        if progress is not None:
            progress(b0)
    lvl, top = acc.finish()
    assert lvl == (B - 1).bit_length()
    if salted:
        return StreamedSaltedMerkle(N, B, top, xp, salt_key)
    return StreamedMerkle(N, B, top, xp)


def reopen_rows(groups, plan, xp):
    """Second streaming pass factory: returns rows_for_positions(positions)
    suitable for StreamedMerkle.resolve — re-evaluates every class (G per
    dispatch), gathering only the requested positions (ONE host transfer
    total)."""
    N, B, S = plan["N"], plan["B"], plan["S"]
    pack_S = plan["pack_S"]
    omega = plan["omega"]
    scale_len = max(int(g.shape[1]) for g in groups)
    G = group_size_for(B, S, plan.get("group"))
    wbs_np = np.asarray([f.h_pow(omega, b) for b in range(B)], dtype=U64)
    wbs = xp.asarray(wbs_np)

    def group_vals_body(gs, wbs_all, pos, b0, pack):
        out = []
        for j in range(G):
            if xp is np:
                wb = wbs_all[b0 + j : b0 + j + 1]
            else:
                import jax

                wb = jax.lax.dynamic_slice_in_dim(wbs_all, b0 + j, 1)
            vals = block_values(gs, wb, scale_len, pack, S, xp)
            if xp is np:
                out.append(vals.T[pos])
            else:
                out.append(xp.take(vals.T, pos, axis=0))
        return xp.stack(out, axis=1)  # (Q, G, k)

    if xp is np:
        group_vals = group_vals_body
    else:
        from ..utils.aot import aot_jit

        group_vals = aot_jit(
            f"stream.reopen.G{G}.B{B}.S{S}.L{scale_len}", group_vals_body
        )

    def rows_for_positions(positions):
        pos = (
            np.asarray(positions, dtype=np.int32)
            if positions else np.zeros((0,), dtype=np.int32)
        )
        pos_dev = xp.asarray(pos)
        per_group = [
            group_vals(
                tuple(groups), wbs, pos_dev,
                b0 if xp is np else xp.asarray(b0, dtype=xp.int32),
                pack_S,
            )
            for b0 in range(0, B, G)
        ]
        if xp is np:
            host = [np.asarray(v) for v in per_group]
        else:
            import jax

            host = jax.device_get(per_group)
        # concat groups -> (Q, B, k)
        return np.concatenate(host, axis=1)

    return rows_for_positions


def make_stream_plan(N: int, B: int, omega: int, xp):
    """Shared per-domain tables for streamed evaluation: the size-S NTT
    pack with root ω^B."""
    S = N // B
    pack_S = nt.make_pack(S, f.h_pow(omega, B), False, xp)
    return {"N": N, "B": B, "S": S, "pack_S": pack_S, "omega": omega}
