"""Device-resident Merkle trees over codeword rows.

The host Merkle layer (merkle.py) needs every leaf payload on the host —
at FRI-domain scale that means shipping hundreds of MB of codewords
device→host per commitment, which dominates prover wall time (BASELINE.md
cost split). Here the tree is built where the data already lives:

  - leaf payloads are rows of a device-resident (N, k) u64 tensor
    (+ device-generated 24-byte salts), hashed with the vectorized BLAKE2b
    kernel (ops/blake2b.py) — bit-identical bytes to the native codec's
    `encode_leaf(row) [+ salt]`, so host `Merkle.verify` / the verifier are
    unchanged;
  - parent levels are computed on device down to `_HOST_CUT` nodes; the
    remaining top of the tree (a few KB) is finished on the host so the
    device graph stays shallow and the root is host-available;
  - levels below `cut` are NOT stored (pruned): at FRI-domain scale the
    leaf+low digest levels are ~2·N·64 bytes — gigabytes that would
    otherwise stay resident per tree. Openings recompute the bottom
    2^cut-leaf subtrees on the host from the gathered leaf rows (+salts),
    a few dozen hashlib calls per query;
  - only the root, the opened leaf rows/salts, and the sibling digests
    along opened paths ever cross to the host — `prefetch(indices)` gathers
    everything for a query set in one transfer.

Tree shape (heap layout, power-of-two leaves, index-bit-walk auth paths)
matches ref merkle.py:7-63 / salted_merkle.py:7-68 exactly.
"""

from __future__ import annotations

from hashlib import blake2b
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from ..ops import blake2b as B

HASH_LEN = 64
_HOST_CUT = 512  # finish the tree on host once a level fits in 32 KB
# prune: don't store digest levels below this (bottom subtrees are
# recomputed host-side per opened leaf — 2^cut hashlib calls per query)
DEFAULT_CUT = 6
# chunked tree build: bound the transient leaf-digest memory inside one
# executable by hashing/reducing this many leaves per dispatch
BUILD_CHUNK = 1 << 21


_BUILDER_CACHE: Dict[tuple, object] = {}


def default_cut(n: int) -> int:
    """Largest sensible prune level for an n-leaf tree: keep at least the
    levels from _HOST_CUT up on the device."""
    levels_above_host_cut = max(0, (n // (2 * _HOST_CUT)).bit_length())
    return min(DEFAULT_CUT, levels_above_host_cut)


def leaf_digests(rows, salts, xp):
    """(n, k) u64 rows (+ optional (n, 6) u32 salt words) -> (lo, hi)
    (n, 8) u32 digest limbs, bit-identical to
    hashlib.blake2b(encode_leaf(row) [+ salt])."""
    n, k = int(rows.shape[0]), int(rows.shape[1])
    salted = salts is not None
    nwords = k + (3 if salted else 0)
    msg_len = 8 * nwords
    W = ((nwords + 15) // 16) * 16
    lo, hi = B.u64_to_limbs(rows, xp)  # (n, k) u32 each
    parts_lo, parts_hi = [lo], [hi]
    if salted:
        parts_lo.append(salts[:, 0::2])
        parts_hi.append(salts[:, 1::2])
    if W > nwords:
        z = xp.zeros((n, W - nwords), dtype=xp.uint32)
        parts_lo.append(z)
        parts_hi.append(z)
    m_lo = xp.concatenate(parts_lo, axis=1)
    m_hi = xp.concatenate(parts_hi, axis=1)
    return B.blake2b_words(m_lo, m_hi, msg_len, xp)


def build_levels(rows, salts, xp, cut: int = 0):
    """Jit-traceable whole-tree build over (n, k) u64 rows (+ optional
    (n, 6) u32 salt words): returns the digest-limb levels from level `cut`
    up to the host cut. Levels below `cut` are computed but not returned
    (XLA frees them); `cut=0` returns the full leaf..cut ladder.
    Used directly inside fused prover stages (one dispatch for
    zip+salt+tree) and via `_get_builder` for standalone construction."""
    d_lo, d_hi = leaf_digests(rows, salts, xp)
    n = int(rows.shape[0])
    levels = []
    count = n
    level = 0
    if cut == 0:
        levels.append((d_lo, d_hi))
    while count > max(_HOST_CUT, 1):
        d_lo, d_hi = B.merkle_parents(d_lo, d_hi, xp)
        count //= 2
        level += 1
        if level >= cut:
            levels.append((d_lo, d_hi))
    assert levels, "tree too shallow for the requested cut"
    return tuple(levels)


def _get_builder(n: int, k: int, salted: bool, xp, cut: int = 0):
    """Whole-tree builder for shape (n, k) u64 rows (+ salts). Cached per
    (shape, backend, cut); the jax variant is jitted (compiled executables
    persist via the jax compilation cache) and chunks large leaf counts to
    bound transient memory, the numpy variant runs eagerly."""
    key = (n, k, salted, xp is np, cut)
    if key in _BUILDER_CACHE:
        return _BUILDER_CACHE[key]

    if xp is np or n <= BUILD_CHUNK:
        def build(rows, salts):
            return build_levels(rows, salts, xp, cut)

        if xp is np:
            fn = build
        else:
            from ..utils.aot import aot_jit

            fn = aot_jit(f"dm.build.n{n}.k{k}.s{int(salted)}.c{cut}", build)
    else:
        fn = _chunked_builder(n, cut, xp)
    _BUILDER_CACHE[key] = fn
    return fn


def _chunked_builder(n: int, cut: int, xp):
    """Large-n tree build as a sequence of per-chunk dispatches: each chunk
    hashes BUILD_CHUNK leaves and reduces them to their level-`cut_c`
    subtree tops (contiguous leaves — subtrees are tree-aligned), bounding
    transient digest memory at ~2·BUILD_CHUNK·64 B; the upper ladder then
    runs over the concatenated chunk outputs."""
    from ..utils.aot import aot_jit

    K = BUILD_CHUNK
    cut_c = max(cut, 1)

    def chunk_fn(rows, salts):
        d_lo, d_hi = leaf_digests(rows, salts, xp)
        level = 0
        while level < cut_c:
            d_lo, d_hi = B.merkle_parents(d_lo, d_hi, xp)
            level += 1
        return d_lo, d_hi

    chunk = aot_jit(f"dm.chunk.c{cut_c}", chunk_fn)

    def ladder_fn(d_lo, d_hi):
        count = int(d_lo.shape[0])
        levels = [(d_lo, d_hi)]
        while count > max(_HOST_CUT, 1):
            d_lo, d_hi = B.merkle_parents(d_lo, d_hi, xp)
            count //= 2
            levels.append((d_lo, d_hi))
        return tuple(levels)

    ladder = aot_jit("dm.ladder", ladder_fn)

    def build(rows, salts):
        tops_lo, tops_hi = [], []
        for c in range(0, n, K):
            s = None if salts is None else salts[c : c + K]
            t_lo, t_hi = chunk(rows[c : c + K], s)
            tops_lo.append(t_lo)
            tops_hi.append(t_hi)
        d_lo = xp.concatenate(tops_lo, axis=0)
        d_hi = xp.concatenate(tops_hi, axis=0)
        return ladder(d_lo, d_hi)

    return build


def salt_words_device(key_lo, key_hi, n: int, xp, indices=None):
    """Jit-traceable salt PRF: (n, 6) uint32 salt words with
    salt_i = blake2b(key16 ‖ LE64(i))[:24]. key_lo/key_hi: (2,) uint32 limb
    arrays of the two LE u64 key words. `indices` (optional (n,) uint32
    array) overrides the counter values — used by strided/streamed commits
    whose block covers a non-contiguous index set. Runs as ONE traced graph
    (part of the fused commit stage) — the bytes are identical to
    `salt_words`."""
    ctr = xp.arange(n, dtype=xp.uint32) if indices is None else indices
    zero = xp.zeros((n,), dtype=xp.uint32)

    def col(v):
        return xp.broadcast_to(v, (n,)).astype(xp.uint32)

    cols_lo = [col(key_lo[0]), col(key_lo[1]), ctr] + [zero] * 13
    cols_hi = [col(key_hi[0]), col(key_hi[1]), zero] + [zero] * 13
    d_lo, d_hi = B.blake2b_words(
        xp.stack(cols_lo, axis=-1), xp.stack(cols_hi, axis=-1), 24, xp
    )
    return xp.stack(
        [d_lo[:, 0], d_hi[:, 0], d_lo[:, 1], d_hi[:, 1], d_lo[:, 2], d_hi[:, 2]],
        axis=1,
    )


def prf_field_words(key_lo, key_hi, count: int, xp):
    """`count` uniform field elements from the BLAKE2b counter PRF,
    computed where the consumer lives (device for the jax backend, host
    for numpy) with bit-identical values: element 8i+j = digest-word j of
    blake2b(key16 ‖ LE64(i)) taken mod p (relative bias ~2^-32 — blinding
    randomness, not transcript challenges). Replaces host-side bulk
    drawing + upload of the degree-(max_degree) randomizer polynomial —
    400 MB of host shake+transfer at 2^20-cycle scale, 16 key bytes
    now."""
    n_digests = (count + 7) // 8
    words = prf_digest_words(key_lo, key_hi, n_digests, 0, xp)
    return words[:count]


def prf_digest_words(key_lo, key_hi, n_digests: int, ctr_offset, xp):
    """(8·n_digests,) field words from counter digests
    [ctr_offset, ctr_offset + n_digests) — the chunkable core of
    `prf_field_words`. `ctr_offset` may be a traced scalar so one compiled
    executable serves every chunk of a large draw (the full max_degree-
    sized draw in ONE dispatch needs ~5 KB of XLA temps per digest through
    the Pallas BLAKE2b kernel — 32 GB at 2^20-cycle scale, the round-5
    OOM; callers slice big draws into fixed-size chunks instead)."""
    ctr = xp.arange(n_digests, dtype=xp.uint32)
    if not isinstance(ctr_offset, int) or ctr_offset:
        ctr = ctr + (
            ctr_offset.astype(xp.uint32)
            if hasattr(ctr_offset, "astype")
            else xp.uint32(ctr_offset)
        )
    zero = xp.zeros((n_digests,), dtype=xp.uint32)

    def col(v):
        return xp.broadcast_to(v, (n_digests,)).astype(xp.uint32)

    cols_lo = [col(key_lo[0]), col(key_lo[1]), ctr] + [zero] * 13
    cols_hi = [col(key_hi[0]), col(key_hi[1]), zero] + [zero] * 13
    d_lo, d_hi = B.blake2b_words(
        xp.stack(cols_lo, axis=-1), xp.stack(cols_hi, axis=-1), 24, xp
    )
    words = d_lo.astype(xp.uint64) | (
        d_hi.astype(xp.uint64) << xp.uint64(32)
    )
    from ..ops.field import P

    return words.reshape(-1) % xp.uint64(P)


def salt_key_limbs(seed_bytes: bytes):
    """16-byte salt key -> ((2,) lo, (2,) hi) uint32 limb arrays (host)."""
    assert len(seed_bytes) >= 16, "salt PRF needs a 16-byte key"
    key_words = np.frombuffer(bytes(seed_bytes[:16]), dtype="<u8")
    return B.u64_to_limbs(key_words, np)


def salt_words(seed_bytes: bytes, n: int, xp, indices=None):
    """(n, 6) uint32 salt words: salt_i = blake2b(key16 ‖ LE64(i))[:24],
    computed with the vectorized BLAKE2b kernel in counter mode, keyed with
    the full 16 secret bytes. Replaces the reference's per-leaf host
    urandom(24) (ref salted_merkle.py:25) with a keyed PRF that is
    device-computable, backend-invariant (numpy and jax produce identical
    bytes), and recomputable from (seed, i) — which the query-driven
    recompute paths rely on. Salt bytes for leaf i are the 3 u64 digest
    words little-endian (see `_salt_bytes`)."""
    k_lo, k_hi = salt_key_limbs(seed_bytes)
    return salt_words_device(
        xp.asarray(k_lo), xp.asarray(k_hi), n, xp, indices=indices
    )


def salt_words_to_buffer(words) -> bytes:
    """(n, 6) uint32 words -> packed 24·n-byte salt buffer (host)."""
    return np.ascontiguousarray(np.asarray(words).astype("<u4")).tobytes()


def _salt_bytes(words_row: np.ndarray) -> bytes:
    return np.ascontiguousarray(words_row.astype("<u4")).tobytes()


def _row_payload_bytes(row: np.ndarray, salt: Optional[bytes]) -> bytes:
    """Host leaf payload: LE u64 row words (+ salt) — the byte string whose
    blake2b digest the device leaf hash reproduces."""
    payload = np.ascontiguousarray(row.astype("<u8")).tobytes()
    return payload + salt if salt is not None else payload


class DeviceMerkle:
    """Plain Merkle tree with device-side hashing; API-compatible subset of
    merkle.Merkle (root / open), plus batched `prefetch` and row access for
    building the opened leaf objects. With cut > 0 the bottom `cut` digest
    levels are pruned (recomputed host-side per opening)."""

    salted = False

    def __init__(self, rows, xp, salts=None, levels=None, cut: Optional[int] = None):
        n, k = int(rows.shape[0]), int(rows.shape[1])
        assert n & (n - 1) == 0 and n > _HOST_CUT
        if cut is None:
            cut = 0 if levels is not None else default_cut(n)
        self.cut = cut
        self.num_leafs = n
        self.depth = (n - 1).bit_length()
        self.rows = rows
        self.salt_words = salts
        self.xp = xp
        if levels is None:
            builder = _get_builder(n, k, salts is not None, xp, cut)
            levels = builder(rows, salts)
        self.levels = tuple(levels)  # level `cut`..host-cut, device
        self._finish_host_top()
        self._node_cache: Dict[Tuple[int, int], bytes] = {}
        self._row_cache: Dict[int, np.ndarray] = {}
        self._salt_cache: Dict[int, bytes] = {}

    # -- construction ------------------------------------------------------

    def _finish_host_top(self):
        top_lo, top_hi = self.levels[-1]
        cut = int(top_lo.shape[0])
        self._cut = cut
        if self.xp is np:
            top_lo_h, top_hi_h = np.asarray(top_lo), np.asarray(top_hi)
        else:
            # ONE batched fetch (each separate get is a full tunnel round
            # trip; FRI builds one tree per round, so per-tree gets
            # multiply into seconds of pure latency); `to_host` also
            # handles cross-process sharded arrays (multi-process prove)
            from ..parallel.multihost import to_host

            top_lo_h, top_hi_h = to_host((top_lo, top_hi))
        digests = B.digests_to_bytes(top_lo_h, top_hi_h)
        nodes = bytearray(2 * cut * HASH_LEN)
        nodes[cut * HASH_LEN :] = digests
        for i in range(cut - 1, 0, -1):
            child = 2 * i * HASH_LEN
            nodes[i * HASH_LEN : (i + 1) * HASH_LEN] = blake2b(
                bytes(nodes[child : child + 2 * HASH_LEN])
            ).digest()
        self._top_nodes = nodes

    def root(self) -> bytes:
        return bytes(self._top_nodes[HASH_LEN : 2 * HASH_LEN])

    # -- openings ------------------------------------------------------------

    def _device_level_count(self) -> int:
        return len(self.levels)

    def prefetch_plan(self, indices: Iterable[int]):
        """Stage the device gathers a set of leaf openings needs — the
        2^cut-aligned leaf-row runs (leaf objects + pruned-bottom
        recompute), salts, and sibling digests on stored device levels.
        Returns (plan, device_arrays); feed `jax.device_get(device_arrays)`
        to `prefetch_absorb`. Splitting plan/absorb lets several trees
        share ONE host round-trip (`prefetch_trees`)."""
        xp = self.xp
        idx = sorted({int(i) for i in indices})
        cut = self.cut
        run_len = 1 << cut
        runs = sorted(
            {i >> cut for i in idx if i not in self._row_cache}
        )
        want_rows = [
            q * run_len + j for q in runs for j in range(run_len)
        ]
        per_level: List[List[int]] = []
        for j in range(self._device_level_count()):
            lvl = cut + j
            sibs = sorted({(i >> lvl) ^ 1 for i in idx})
            sibs = [
                s for s in sibs if (lvl, s) not in self._node_cache
            ]
            per_level.append(sibs)

        gathered = []
        if want_rows:
            ridx = xp.asarray(want_rows, dtype=xp.int32)
            gathered.append(xp.take(self.rows, ridx, axis=0))
            if self.salt_words is not None:
                gathered.append(xp.take(self.salt_words, ridx, axis=0))
        for j, sibs in enumerate(per_level):
            if sibs:
                lidx = xp.asarray(sibs, dtype=xp.int32)
                gathered.append(xp.take(self.levels[j][0], lidx, axis=0))
                gathered.append(xp.take(self.levels[j][1], lidx, axis=0))
        return (want_rows, per_level), gathered

    def prefetch_absorb(self, plan, host):
        want_rows, per_level = plan
        pos = 0
        if want_rows:
            rows_h = np.asarray(host[pos], dtype=np.uint64)
            pos += 1
            salts_h = None
            if self.salt_words is not None:
                salts_h = np.asarray(host[pos])
                pos += 1
            for j, i in enumerate(want_rows):
                self._row_cache[i] = rows_h[j]
                if salts_h is not None:
                    self._salt_cache[i] = _salt_bytes(salts_h[j])
            if self.cut > 0:
                self._rebuild_bottom(want_rows)
        for j, sibs in enumerate(per_level):
            if not sibs:
                continue
            d = B.digests_to_bytes(host[pos], host[pos + 1])
            pos += 2
            for m, s in enumerate(sibs):
                self._node_cache[(self.cut + j, s)] = (
                    d[m * HASH_LEN : (m + 1) * HASH_LEN]
                )

    def _rebuild_bottom(self, leaf_indices):
        """Recompute the pruned bottom-subtree digests (levels < cut) for
        every complete 2^cut-aligned run in `leaf_indices` (host hashlib;
        payload bytes match the device leaf hash exactly)."""
        run_len = 1 << self.cut
        runs = sorted({i >> self.cut for i in leaf_indices})
        for q in runs:
            digs = []
            for j in range(run_len):
                i = q * run_len + j
                if i not in self._row_cache:
                    digs = None
                    break
                salt = self._salt_cache.get(i) if self.salted else None
                payload = _row_payload_bytes(self._row_cache[i], salt)
                digs.append(blake2b(payload).digest())
            if digs is None:
                continue
            pos0 = q * run_len
            for lvl in range(self.cut):
                width = run_len >> lvl
                base = pos0 >> lvl
                for m in range(width):
                    self._node_cache.setdefault((lvl, base + m), digs[m])
                digs = [
                    blake2b(digs[2 * m] + digs[2 * m + 1]).digest()
                    for m in range(width // 2)
                ]

    def prefetch(self, indices: Iterable[int]):
        """Gather everything the given leaf openings need in one device
        round-trip."""
        prefetch_trees([(self, indices)])

    def _device_node(self, lvl: int, pos: int) -> bytes:
        key = (lvl, pos)
        if key not in self._node_cache:
            if lvl < self.cut:
                # pruned level: fetch the covering run and rebuild
                self.prefetch([pos << lvl])
            else:
                # on-demand fallback (slow path: one transfer per node)
                j = lvl - self.cut
                lo = np.asarray(self.levels[j][0][pos : pos + 1])
                hi = np.asarray(self.levels[j][1][pos : pos + 1])
                self._node_cache[key] = B.digests_to_bytes(lo, hi)
        return self._node_cache[key]

    def row_at(self, index: int) -> np.ndarray:
        if index not in self._row_cache:
            self.prefetch([index])
        return self._row_cache[index]

    def _path(self, index: int) -> List[bytes]:
        path = []
        ndev = self.cut + self._device_level_count()
        for lvl in range(ndev):
            path.append(self._device_node(lvl, (index >> lvl) ^ 1))
        # host top: heap over `cut` digest-leaves; a row with c nodes
        # occupies heap[c : 2c), so node(count c, pos q) = heap[c + q].
        # Device levels covered counts N .. cut; the host continues at
        # count cut/2 (the cut-count siblings came from the device).
        for lvl in range(ndev, self.depth):
            c = self.num_leafs >> lvl
            h = c + ((index >> lvl) ^ 1)
            key = ("top", h)
            if key not in self._node_cache:
                self._node_cache[key] = bytes(
                    self._top_nodes[h * HASH_LEN : (h + 1) * HASH_LEN]
                )
            path.append(self._node_cache[key])
        return path

    def open(self, index: int) -> List[bytes]:
        return self._path(index)


def prefetch_trees(pairs):
    """Batched opening prefetch across several trees: stage every tree's
    gathers, then do ONE host fetch for everything — one round-trip total
    instead of one per tree (through a remote-tunnel backend each
    round-trip costs ~tens of ms). `to_host` handles cross-process
    sharded arrays for the multi-process prove."""
    from ..parallel.multihost import to_host

    plans = []
    all_dev: List = []
    for tree, indices in pairs:
        plan, dev = tree.prefetch_plan(indices)
        plans.append((tree, plan, len(dev)))
        all_dev += dev
    if not all_dev:
        return
    host = to_host(all_dev)
    pos = 0
    for tree, plan, count in plans:
        tree.prefetch_absorb(plan, host[pos : pos + count])
        pos += count


class DeviceSaltedMerkle(DeviceMerkle):
    """Salted variant: 24-byte device-generated salt appended to each leaf
    payload (ref salted_merkle.py:7-68). `open` returns (salt, path)."""

    salted = True

    def __init__(self, rows, salt_words, xp, levels=None, cut=None):
        super().__init__(rows, xp, salts=salt_words, levels=levels, cut=cut)

    def salt_at(self, index: int) -> bytes:
        if index not in self._salt_cache:
            self.prefetch([index])
        return self._salt_cache[index]

    def open(self, index: int):
        return self.salt_at(index), self._path(index)
