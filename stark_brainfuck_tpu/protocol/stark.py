"""BrainfuckStark: the two-stage RAP prover/verifier orchestration.

Protocol flow and transcript order match ref `brainfuck_stark.py:20-579`
exactly (base commit → challenges → extend → ext commit → quotients →
terminals → weights → combination commit → indices → openings → FRI);
the computation is reorganized TPU-first:

  - all codeword-scale math (LDE NTTs, extension scans, constraint
    evaluation, zerofier inversion, nonlinear combination) runs as
    vectorized u64 kernels on the `xp` backend (jax.numpy on device,
    numpy for host/oracle runs);
  - the verifier recomputes quotients with the same constraint builders
    over small numpy batches (one lane per query index);
  - hashing/transcript work stays host-side.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..config import StarkConfig
from ..models.instruction import InstructionTable
from ..models.interp import ArrayAlgebra, AVal
from ..models.io import InputTable, OutputTable
from ..models.memory import MemoryTable
from ..models.processor import ProcessorTable
from ..models.table import roundup_npo2
from ..ops import field as f
from ..ops import xfield as xf
from ..ops.blake2b import _pallas_available as _mxu_available
from ..utils.rng import Rng
from .arguments import (
    PermutationArgument,
    evaluation_terminal,
    program_evaluation_terminal,
)
from .channel import (
    ProofStream,
    encode_leaf,
    make_codec,
    reject,
    sample_indices_stark,
    sample_weights,
)
from .device_merkle import (
    DeviceMerkle,
    DeviceSaltedMerkle,
    build_levels as dm_build_levels,
    default_cut as dm_default_cut,
    prefetch_trees,
    salt_key_limbs,
    salt_words as dm_salt_words,
    salt_words_device,
    salt_words_to_buffer,
)
from .fri import Fri, FriDomain
from .merkle import Merkle, SaltBuffer, SaltedMerkle

U64 = np.uint64

# the composed Pallas NTT plan supports at most 2^26 points
# (ops/pallas_ntt.py make_pallas_plan asserts c <= SUB_MAX); auto mode
# must fall back to the u64 path above that instead of crashing
MXU_NTT_MAX = 1 << 26


def _tree_sum(x, xp):
    """Modular sum over axis 0 via log-depth halving."""
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        rest = x[2 * half :]
        x = f.add(x[:half], x[half : 2 * half], xp)
        if rest.shape[0]:
            x = xp.concatenate([x, rest], axis=0)
    return x[0]


class BrainfuckStark:
    def __init__(
        self,
        running_time: int,
        memory_length: int,
        program: List[int],
        input_symbols: str,
        output_symbols: str,
        config: Optional[StarkConfig] = None,
    ):
        self.config = (config or StarkConfig()).validate()
        cfg = self.config
        self.running_time = running_time
        self.memory_length = memory_length
        self.program = list(program)
        self.input_symbols = input_symbols
        self.output_symbols = output_symbols

        nr = cfg.num_randomizers
        self.processor_table = ProcessorTable(running_time, nr)
        self.instruction_table = InstructionTable(running_time + len(program), nr)
        self.memory_table = MemoryTable(memory_length, nr)
        self.input_table = InputTable(len(input_symbols))
        self.output_table = OutputTable(len(output_symbols))
        self.tables = [
            self.processor_table,
            self.instruction_table,
            self.memory_table,
            self.input_table,
            self.output_table,
        ]

        # permutation arguments: (table, column) pairs into the extended
        # column layout (ref brainfuck_stark.py:67-72)
        self.permutation_arguments = [
            PermutationArgument(self.tables, (0, 7), (1, 3)),
            PermutationArgument(self.tables, (0, 8), (2, 4)),
        ]

        # max symbolic quotient degree over all ext transition constraints
        # with all-one challenges (ref brainfuck_stark.py:85-97)
        ones = [xf.H_ONE] * 11
        self.max_degree = 1
        for table in self.tables:
            bounds = [table.interpolant_degree()] * (2 * table.full_width)
            for air in table.symbolic_transition_constraints(ones):
                degree = air.symbolic_degree_bound(bounds) - (table.height - 1)
                self.max_degree = max(self.max_degree, degree)
        self.max_degree = roundup_npo2(self.max_degree) - 1
        fri_domain_length = (self.max_degree + 1) * cfg.expansion_factor

        self.codec = make_codec(cfg.codec)
        self.fri = Fri(
            f.GENERATOR,
            f.primitive_nth_root(fri_domain_length),
            fri_domain_length,
            cfg.expansion_factor,
            cfg.num_colinearity_checks,
            codec=self.codec,
            device_commit_min=cfg.device_commit_min,
            host_min=getattr(cfg, "fri_host_min", None),
        )

    # ------------------------------------------------------------------

    def _terminals_list(self) -> List[tuple]:
        return [
            self.processor_table.terminals["instruction_permutation"],
            self.processor_table.terminals["memory_permutation"],
            self.processor_table.terminals["input_evaluation"],
            self.processor_table.terminals["output_evaluation"],
            self.instruction_table.terminals["evaluation"],
        ]

    def _base_degree_bounds(self) -> List[int]:
        out = []
        for t in self.tables:
            out += [t.interpolant_degree()] * t.base_width
        return out

    def _ext_degree_bounds(self) -> List[int]:
        out = []
        for t in self.tables:
            out += [t.interpolant_degree()] * t.num_ext_columns
        return out

    def _zerofier_inverses(self, xp) -> Dict[int, Dict[str, object]]:
        """Per-table-height zerofier-inverse tensors over the FRI domain.

        boundary: 1/(x - 1); transition: (x - o^{-1})/(x^H - 1) (all-zero
        when H == 0, reproducing ref table.py:196-199); terminal:
        1/(x - o^{-1}). Cached per backend on the instance — these depend
        only on (heights, FRI domain)."""
        key = "np" if xp is np else "jax"
        cache = getattr(self, "_zinv_cache", None)
        if cache is not None and cache[0] == key:
            return cache[1]
        N = self.fri.domain.length
        omega = self.fri.domain.omega
        offset = self.fri.domain.offset
        heights = []
        for t in self.tables:
            if t.height not in heights:
                heights.append(t.height)
        omicrons = {
            t.height: t.omicron for t in self.tables if t.height > 0
        }

        # runtime seed vector: [offset, omega] + per-height
        # [o_inv, offset^h, omega^h]. Passed as a jit ARGUMENT — embedding
        # these as tracer constants would make XLA constant-fold the whole
        # O(N) inversion graph at compile time (single-threaded, minutes).
        seeds = [offset, omega]
        for h in heights:
            if h > 0:
                seeds += [
                    f.h_inverse(omicrons[h]), f.h_pow(offset, h),
                    f.h_pow(omega, h),
                ]
            else:
                seeds += [1, 1, 1]
        seeds_np = np.asarray(seeds, dtype=U64)

        def build(sv, xb):
            """All zerofier-inverse tensors as one traced graph. Both
            backends run the identical code — a single O(N)-work,
            O(log)-depth program (domain by log-depth doubling, pow-ladder
            batch inversion), so at FRI-domain scale it runs on the device
            instead of serializing through host numpy (VERDICT r2 item 7).
            Returns one (boundary, transition, terminal) triple per height
            in `heights` order (tuple-structured — jax.export cannot
            serialize int-keyed dict pytrees)."""
            one = xb.asarray(1, dtype=xb.uint64)
            domain = f.geometric_rows(sv[0:1], sv[1:2], N, xb)[0]
            boundary = f.batch_inverse(f.sub(domain, one, xb), xb)
            out = []
            for j, h in enumerate(heights):
                o_inv, offset_h, omega_h = (
                    sv[2 + 3 * j], sv[3 + 3 * j], sv[4 + 3 * j]
                )
                x_minus_oinv = f.sub(domain, o_inv, xb)
                terminal = f.batch_inverse(x_minus_oinv, xb)
                if h > 0:
                    # x^H over the coset has period N/H: invert a small table
                    period = N // h
                    xs = f.geometric_rows(
                        sv[3 + 3 * j : 4 + 3 * j],
                        sv[4 + 3 * j : 5 + 3 * j],
                        period, xb,
                    )[0]
                    sub_inv_small = f.batch_inverse(f.sub(xs, one, xb), xb)
                    subgroup_inv = xb.tile(sub_inv_small, N // period)
                    transition = f.mul(subgroup_inv, x_minus_oinv, xb)
                else:
                    transition = xb.zeros((N,), dtype=xb.uint64)
                out.append((boundary, transition, terminal))
            return tuple(out)

        if xp is np:
            triples = build(seeds_np, np)
        else:
            triples = self._jitted("zinv", lambda sv: build(sv, xp))(
                xp.asarray(seeds_np)
            )
        out = {
            h: {
                "boundary": t[0],
                "transition": t[1],
                "terminal": t[2],
            }
            for h, t in zip(heights, triples)
        }
        self._zinv_cache = (key, out)
        return out

    def debug_check_degrees(
        self, base_host, ext_host, challenges_h, terminals_h
    ):
        """The reference's DEBUG mode (table.py:170-176, 219-234, 264-284):
        interpolate every quotient codeword and assert its degree is below
        both the FRI domain bound and its symbolic degree bound. Host-side
        (numpy); gated by StarkConfig.debug_degree_checks."""
        alg = ArrayAlgebra(np)
        N = self.fri.domain.length
        ch_vals = [alg.x(np.asarray(c, dtype=U64)) for c in challenges_h]
        tm_vals = [alg.x(np.asarray(t_, dtype=U64)) for t_ in terminals_h]
        zinv = self._zerofier_inverses(np)
        for t, base_cw, ext_cw in zip(self.tables, base_host, ext_host):
            ud = t.unit_distance(N)
            point = [alg.base(base_cw[j]) for j in range(t.base_width)]
            point += [alg.x(ext_cw[j]) for j in range(t.num_ext_columns)]
            point_next = [
                alg.base(np.roll(base_cw[j], -ud, axis=0))
                for j in range(t.base_width)
            ]
            point_next += [
                alg.x(np.roll(ext_cw[j], -ud, axis=0))
                for j in range(t.num_ext_columns)
            ]
            quotients = t.quotients(
                alg, point, point_next, ch_vals, tm_vals, zinv[t.height]
            )
            bounds = t.all_quotient_degree_bounds(challenges_h, terminals_h)
            for i, (q, bound) in enumerate(zip(quotients, bounds)):
                coeffs = self.fri.domain.xinterpolate(np.asarray(q), np)
                nz = np.nonzero(np.any(coeffs != 0, axis=1))[0]
                deg = int(nz[-1]) if len(nz) else -1
                assert deg < N - 1, (
                    f"{t.name} quotient {i}: degree {deg} hits the domain "
                    f"bound — AIR does not divide cleanly"
                )
                assert deg <= bound or deg == -1, (
                    f"{t.name} quotient {i}: degree {deg} > symbolic bound "
                    f"{bound}"
                )

    def _shift_ratios(self, shifts_np, xp):
        """Per-term x^shift codeword generators: ratios[i] = omega^shift_i.
        Combined with the offset powers as starts, the (chunk, N) x^s rows
        are generated closed-form by `f.geometric_rows` — no N-sized
        omega-power table or index-gather tensors on the device."""
        return xp.asarray(
            np.asarray(
                [f.h_pow(self.fri.domain.omega, int(s)) for s in shifts_np],
                dtype=U64,
            )
        )

    def _lde_packs(self, xp):
        """Host-precomputed NTT twiddle/scale tables, passed into the jitted
        stages as runtime arguments (embedding them as tracer constants
        makes XLA constant-fold limb arithmetic over N-sized tables at
        compile time). Cached per backend."""
        from ..ops import ntt as nt

        fri = self.fri
        N = fri.domain.length
        cfg = self.config
        # "auto" resolves to the u64 butterfly network: measured on the
        # v5e (ROOFLINE_r05 + prove-shaped sweeps, 64 rows x 2^20 / 32 x
        # 2^21), the int8-limb MXU path is 1.2-4.6x SLOWER than the u64
        # path at every prove shape (limb-unpack overhead dominates; it
        # falls off hard at N >= 2^21 where the Mosaic outer-twiddle
        # workaround kicks in). ntt_backend="mxu" still forces it.
        use_mxu = cfg.ntt_backend == "mxu" and (
            xp is not np and N <= MXU_NTT_MAX and _mxu_available()
        )
        # key includes the resolved NTT decision: changing ntt_backend /
        # mxu_ntt_min between prove() calls must not reuse stale packs
        key = (
            "np" if xp is np else "jax", use_mxu,
            getattr(self, "_mesh", None) is not None,
        )
        cache = getattr(self, "_packs_cache", None)
        if cache is not None and cache[0] == key:
            return cache[1]
        fwd_mxu = None
        if use_mxu:
            from ..ops.pallas_ntt import make_pallas_plan

            fwd_mxu = make_pallas_plan(N, fri.domain.omega, False, xp)
        dntt_tables = None
        mesh = getattr(self, "_mesh", None)
        if mesh is not None and not use_mxu:
            from ..parallel.dntt import make_dntt_tables

            D = mesh.devices.size
            pack_r, pack_c, T = make_dntt_tables(N, fri.domain.omega, xp)
            R, C = int(T.shape[0]), int(T.shape[1])
            if R % D == 0 and C % D == 0:
                dntt_tables = (pack_r, pack_c, T)
        # resolved-path provenance: recorded in last_metrics so every bench
        # artifact shows which NTT kernel actually ran (round-4 verdict:
        # nothing proved the MXU path engaged on the axon platform)
        self._resolved_ntt_path = (
            "u64-numpy" if xp is np
            else "mxu-pallas-int8" if use_mxu
            else "dntt-mesh" if dntt_tables is not None
            else "u64-jnp"
        )
        # streamed proves never run an N-point transform (S-sized class
        # NTTs + height-sized INTTs only) — the four-step pack's (R, C)
        # twiddle matrix alone is N u64 words (0.5 GB at a 2^26 domain)
        # of device memory the prove would carry for nothing
        use_stream = self.codec.name == "native" and N >= cfg.stream_min
        packs = {
            "fwd_mxu": fwd_mxu,
            "dntt": dntt_tables,
            "fwd": None if use_stream else nt.make_pack(
                N, fri.domain.omega, False, xp
            ),
            "rand_scale": nt.scale_table(fri.domain.offset, self.max_degree + 1, xp),
            "tables": tuple(
                (
                    nt.make_pack(t.height, t.omicron, True, xp),
                    nt.scale_table(
                        fri.domain.offset, t.height + t.num_randomizers, xp
                    ),
                )
                if t.height > 0
                else None
                for t in self.tables
            ),
        }
        if fwd_mxu is not None:
            from ..ops.pallas_ntt import plan_leaves

            self._mxu_template = fwd_mxu
            packs["fwd_mxu"] = plan_leaves(fwd_mxu)
        self._packs_cache = (key, packs)
        return packs

    def _fwd_ntt(self, coeffs, packs, xp):
        """The shared forward N-point NTT of both LDE stages: the int8-limb
        MXU path (ops/pallas_ntt.py) when configured, the explicit
        shard_map four-step dNTT (parallel/dntt.py — all_to_all index
        mixing over ICI) under a mesh, else the u64 butterfly network —
        bit-identical outputs in every case."""
        from ..ops import ntt as nt

        plan = packs.get("fwd_mxu")
        if plan is not None and xp is not np:
            from ..ops.pallas_ntt import ntt_pallas, plan_rebind

            return ntt_pallas(coeffs, plan_rebind(self._mxu_template, plan))
        dntt_tables = packs.get("dntt")
        if dntt_tables is not None and xp is not np:
            from ..parallel.dntt import distributed_ntt_with

            return distributed_ntt_with(coeffs, dntt_tables, self._mesh)
        return nt.ntt_with(coeffs, packs["fwd"], xp)

    # -- jittable prover stages ----------------------------------------

    def _stage_base_lde(self, mats, rand_coeffs, base_rands, packs, xp):
        """Randomizer codeword + per-table base codewords.

        All coefficient rows (randomizer limbs + every table's base columns)
        are batched into ONE shared forward NTT of the FRI domain size —
        one NTT graph instance per stage, not one per table."""
        from ..ops import ntt as nt

        N = self.fri.domain.length
        if rand_coeffs.ndim == 1:  # flat draw; see the randpoly.D note
            rand_coeffs = rand_coeffs.reshape(-1, 3)
        rows = [
            f.mul(
                xp.concatenate(
                    [
                        xp.moveaxis(rand_coeffs, -1, 0),
                        xp.zeros((3, N - rand_coeffs.shape[0]), dtype=xp.uint64),
                    ],
                    axis=-1,
                ),
                xp.concatenate(
                    [
                        packs["rand_scale"],
                        xp.zeros((N - rand_coeffs.shape[0],), dtype=xp.uint64),
                    ]
                ),
                xp,
            )
        ]
        for i, (t, m, r) in enumerate(zip(self.tables, mats, base_rands)):
            tp = packs["tables"][i]
            if t.height == 0:
                rows.append(xp.zeros((t.base_width, N), dtype=xp.uint64))
            else:
                rows.append(
                    nt.lde_coefficients(m.T, r, tp[0], tp[1], N, xp)
                )
        all_coeffs = xp.concatenate(rows, axis=0)
        all_cws = self._fwd_ntt(all_coeffs, packs, xp)
        rand_cw = self._shard(xp.moveaxis(all_cws[:3], 0, -1), 0)  # (N, 3)
        base_cws = []
        pos = 3
        for t in self.tables:
            base_cws.append(self._shard(all_cws[pos : pos + t.base_width], 1))
            pos += t.base_width
        return rand_cw, tuple(base_cws)

    def _host_extend(self, challenges_h, initials_h):
        """All tables' extension columns via ONE batched vectorized numpy
        scan on the host. Extension-column scan work is O(H log H) — tiny
        next to the O(N log N) LDE (N ~ 64H) — and running it host-side
        removes the scans from the compiled graphs entirely (their
        small-stride shift/concat layers dominated device compile time).

        Stores xcolumns/terminals on the tables; returns (xcols, terms)."""
        from ..ops import scan as sc

        ch = np.asarray(challenges_h, dtype=U64)
        ini = np.asarray(initials_h, dtype=U64)
        all_lanes = []
        lane_slices = []
        for t in self.tables:
            lanes = t.extend_lanes(np.asarray(t.matrix), ch, ini, np)
            lane_slices.append((len(all_lanes), len(all_lanes) + len(lanes)))
            all_lanes += lanes
        all_outs = sc.batched_affine_scan(all_lanes, np)

        xcols = []
        term_arrays = []
        for i, t in enumerate(self.tables):
            lo, hi = lane_slices[i]
            cols, terms = t.extend_finish(
                np.asarray(t.matrix), ch, ini, all_outs[lo:hi], np
            )
            t.xcolumns = cols
            terms = np.asarray(terms)
            t.terminals = {
                n: tuple(int(v) for v in terms[j])
                for j, n in enumerate(t.terminal_names)
            }
            xcols.append(np.asarray(cols))
            term_arrays.append(terms)
        return xcols, term_arrays

    def _device_extend(self, mats, challenges_arr, initials_arr, xp):
        """All tables' extension columns as ONE jitted device scan stage.

        Same math as `_host_extend` (the batched Hillis-Steele affine scan
        is exact mod-p arithmetic, so values are bit-identical across
        backends), but O(H log H) vectorized device work instead of
        single-core numpy — the host scan was measured at ~23 k rows/s,
        which would be minutes at 2^20 rows (VERDICT item 10). Returns
        (cols tuple, terms tuple), all device-resident."""
        from ..ops import scan as sc

        all_lanes = []
        lane_slices = []
        for t, m in zip(self.tables, mats):
            lanes = t.extend_lanes(m, challenges_arr, initials_arr, xp)
            lane_slices.append((len(all_lanes), len(all_lanes) + len(lanes)))
            all_lanes += lanes
        all_outs = sc.batched_affine_scan(all_lanes, xp)
        cols, terms = [], []
        for (lo, hi), t, m in zip(lane_slices, self.tables, mats):
            c, tm = t.extend_finish(
                m, challenges_arr, initials_arr, all_outs[lo:hi], xp
            )
            cols.append(c)
            terms.append(tm)
        return tuple(cols), tuple(terms)

    def _stage_ext_lde(self, xcols, ext_rands, packs, xp):
        """Extension LDE over precomputed extension columns; all tables
        share one batched forward NTT like the base stage."""
        from ..ops import ntt as nt

        N = self.fri.domain.length
        rows = []
        layout = []  # (table_index, n_ext) in order
        for i, (t, cols, r) in enumerate(zip(self.tables, xcols, ext_rands)):
            if t.height == 0:
                layout.append((i, 0))
                continue
            tp = packs["tables"][i]
            # (H, n_ext, 3) -> (3*n_ext, H) coefficient rows
            trace = xp.moveaxis(cols, 0, -1)  # (n_ext, 3, H)
            trace = trace.reshape((-1, trace.shape[-1]))
            rr = None
            if r is not None:
                # (n_ext, R, 3) -> (n_ext*3, R), limb-major per column
                rr = xp.moveaxis(r, -1, 1).reshape((-1, r.shape[1]))
            rows.append(nt.lde_coefficients(trace, rr, tp[0], tp[1], N, xp))
            layout.append((i, t.num_ext_columns))
        all_coeffs = (
            xp.concatenate(rows, axis=0)
            if rows
            else xp.zeros((0, N), dtype=xp.uint64)
        )
        all_cws = self._fwd_ntt(all_coeffs, packs, xp)
        ext_cws = []
        pos = 0
        for i, n_ext in layout:
            t = self.tables[i]
            if t.height == 0 or n_ext == 0:
                ext_cws.append(
                    xp.zeros((t.num_ext_columns, N, 3), dtype=xp.uint64)
                )
                continue
            block = all_cws[pos : pos + 3 * n_ext].reshape((n_ext, 3, N))
            ext_cws.append(self._shard(xp.moveaxis(block, 1, -1), 1))
            pos += 3 * n_ext
        return tuple(ext_cws)

    def _stage_combination(
        self,
        rand_cw,
        base_cws,
        ext_cws,
        challenges,
        terminals,
        weights,
        shift_ratios,
        offset_pows,
        zinv_flat,
        xp,
        chunk: int = 16,
    ):
        """Quotients + weighted nonlinear combination, fully on device.

        The quotient codewords never leave the device: only the combination
        is committed, and the verifier recomputes quotients from openings.

        Every non-randomizer term contributes w_plain·term + w_shift·x^s·term
        = (w_plain + w_shift·x^s)·term, so the weighted sum is computed as a
        chunked batched product: x^s coefficient rows generated closed-form
        (each is the geometric progression offset^s·(omega^s)^i — log-depth
        doubling, no N-sized index/gather tensors), one fused multiply
        against the stacked terms, and a log-depth modular tree-reduction.
        This keeps the unrolled graph small (compile time) and the
        arithmetic batched (runtime), unlike a per-term accumulation loop."""
        N = self.fri.domain.length
        alg = ArrayAlgebra(xp)
        ch_vals = [alg.x(challenges[i]) for i in range(11)]
        tm_vals = [alg.x(terminals[i]) for i in range(5)]

        num_base = sum(cw.shape[0] for cw in base_cws)
        num_ext = sum(cw.shape[0] for cw in ext_cws)
        num_terms = shift_ratios.shape[0]
        assert weights.shape[0] == 1 + 2 * num_terms
        w_pairs = weights[1:].reshape(num_terms, 2, 3)

        def coeffs(start, stop):
            """(stop-start, N, 3) tensors w_plain + w_shift·x^shift."""
            xs = f.geometric_rows(
                offset_pows[start:stop], shift_ratios[start:stop], N, xp
            )  # (c, N)
            w_plain = w_pairs[start:stop, 0]  # (c, 3)
            w_shift = w_pairs[start:stop, 1]
            c = xf.mul_base(
                xp.broadcast_to(w_shift[:, None, :], (stop - start, N, 3)),
                xs, xp,
            )
            return f.add(c, w_plain[:, None, :], xp)

        def tree_sum(x):
            """Modular sum over axis 0 via log-depth halving."""
            while x.shape[0] > 1:
                half = x.shape[0] // 2
                rest = x[2 * half :]
                x = f.add(x[:half], x[half : 2 * half], xp)
                if rest.shape[0]:
                    x = xp.concatenate([x, rest], axis=0)
            return x[0]

        acc = xf.mul(
            xp.broadcast_to(weights[0][None, :], (N, 3)), rand_cw, xp
        )

        def accumulate_ext_stack(stack, term_offset):
            """Fold a stacked (T, N, 3) term group into acc, chunked."""
            nonlocal acc
            for start in range(0, stack.shape[0], chunk):
                stop = min(start + chunk, stack.shape[0])
                c = coeffs(term_offset + start, term_offset + stop)
                contrib = xf.mul(c, stack[start:stop], xp)
                acc = xf.add(acc, tree_sum(contrib), xp)
            return stack.shape[0]

        # base stream: (num_base, N) stacked
        base_stack = xp.concatenate(list(base_cws), axis=0)
        for start in range(0, num_base, chunk):
            stop = min(start + chunk, num_base)
            c = coeffs(start, stop)
            contrib = xf.mul_base(c, base_stack[start:stop], xp)
            acc = xf.add(acc, tree_sum(contrib), xp)

        # extension columns
        term_pos = num_base
        term_pos += accumulate_ext_stack(xp.concatenate(list(ext_cws), axis=0),
                                         term_pos)

        # quotients, one table at a time so only one table's quotient
        # codewords are ever materialized (memory: O(max constraints · N)
        # instead of O(total constraints · N))
        def rot(arr, ud):
            """Cyclic shift by -ud along axis 0 as concat-of-slices.
            (jnp.roll lowered incorrectly on TPU inside this fused graph —
            the wrapped tail rows came out wrong at N=2^19; static slices
            sidestep that lowering.)"""
            if ud == 0:
                return arr
            return xp.concatenate([arr[ud:], arr[:ud]], axis=0)

        for ti, (t, base_cw, ext_cw) in enumerate(
            zip(self.tables, base_cws, ext_cws)
        ):
            ud = t.unit_distance(N)
            point = [alg.base(base_cw[j]) for j in range(t.base_width)]
            point += [alg.x(ext_cw[j]) for j in range(t.num_ext_columns)]
            point_next = [
                alg.base(rot(base_cw[j], ud)) for j in range(t.base_width)
            ]
            point_next += [
                alg.x(rot(ext_cw[j], ud)) for j in range(t.num_ext_columns)
            ]
            zinv = {
                "boundary": zinv_flat[3 * ti],
                "transition": zinv_flat[3 * ti + 1],
                "terminal": zinv_flat[3 * ti + 2],
            }
            q_terms = t.quotients(
                alg, point, point_next, ch_vals, tm_vals, zinv
            )
            term_pos += accumulate_ext_stack(
                xp.stack(q_terms, axis=0), term_pos
            )

        # permutation-argument difference quotients
        ext_col_lookup = {
            (0, 7): ext_cws[0][0], (0, 8): ext_cws[0][1],
            (1, 3): ext_cws[1][0], (2, 4): ext_cws[2][0],
        }
        boundary_zinv = zinv_flat[0]
        pa_terms = []
        for pa in self.permutation_arguments:
            diff = xf.sub(ext_col_lookup[pa.lhs], ext_col_lookup[pa.rhs], xp)
            pa_terms.append(xf.mul_base(diff, boundary_zinv, xp))
        term_pos += accumulate_ext_stack(xp.stack(pa_terms, axis=0), term_pos)

        assert term_pos == num_terms, "term/shift bookkeeping mismatch"
        return acc

    def _jitted(self, name, fn):
        """Per-instance jit cache (stages close over static table geometry).

        Single-device stages go through the AOT export cache
        (utils/aot.py): the traced module is serialized to disk keyed by
        stage name + instance geometry + input signature, so later
        processes skip the (expensive on this 2-core host) Python
        re-tracing. Mesh runs keep plain jit — shardings are not part of
        the export seam."""
        cache = getattr(self, "_jit_fns", None)
        if cache is None:
            cache = self._jit_fns = {}
        if name not in cache:
            if getattr(self, "_mesh", None) is not None:
                import jax

                cache[name] = jax.jit(fn)
            else:
                from ..utils.aot import aot_jit

                cache[name] = aot_jit(f"stark.{name}.{self._geometry_tag()}", fn)
        return cache[name]

    def _geometry_tag(self) -> str:
        """Closure constants of the jitted stages that are not recoverable
        from input shapes alone — part of the AOT cache key."""
        cfg = self.config
        return (
            f"N{self.fri.domain.length}"
            f".h{'-'.join(str(t.height) for t in self.tables)}"
            f".r{cfg.num_randomizers}.sc{cfg.stream_classes}"
            f".x{cfg.log_expansion_factor}"
        )

    def _shard(self, arr, axis: int):
        """Sharding constraint over the FRI-domain axis when proving under
        a mesh (config.mesh_shape); identity otherwise. Stages trace this
        at jit time, so a mesh is fixed per instance (build a fresh
        BrainfuckStark to change meshes)."""
        mesh = getattr(self, "_mesh", None)
        if mesh is None:
            return arr
        import jax

        from ..parallel.mesh import codeword_spec

        return jax.lax.with_sharding_constraint(
            arr, codeword_spec(mesh, arr.ndim, axis)
        )

    # -- combination pipeline pieces ------------------------------------
    # The monolithic fused combination graph miscompiled on TPU at N=2^19
    # (wrong values in the final tile rows; every constituent pattern is
    # correct when lowered separately). The pipeline below jits the same
    # math as independent pieces — per-table quotient stacks and per-group
    # weighted accumulations — which both sidesteps the fusion bug and
    # compiles faster (several small graphs instead of one huge one).

    def _acc_group(
        self, acc, stack, w_pairs_g, ratios_g, opow_g, xp,
        chunk: int = 16, length: Optional[int] = None,
    ):
        """acc += Σ_t (w_plain_t + w_shift_t·x^s_t)·stack[t], chunked.
        stack: (T, N) base or (T, N, 3) extension terms. The x^s rows are
        geometric progressions offset^s·(omega^s)^i, generated closed-form
        (no omega-power table or index gathers on device). `length`
        overrides N for blockwise (streamed) accumulation, where opow_g
        carries the per-block start (offset·ω^b)^s and ratios_g the
        per-position ratio (ω^B)^s."""
        N = length if length is not None else self.fri.domain.length
        base_stream = stack.ndim == 2
        for start in range(0, stack.shape[0], chunk):
            stop = min(start + chunk, stack.shape[0])
            xs = f.geometric_rows(
                opow_g[start:stop], ratios_g[start:stop], N, xp
            )
            w_plain = w_pairs_g[start:stop, 0]
            w_shift = w_pairs_g[start:stop, 1]
            c = xf.mul_base(
                xp.broadcast_to(w_shift[:, None, :], (stop - start, N, 3)),
                xs, xp,
            )
            c = f.add(c, w_plain[:, None, :], xp)
            if base_stream:
                contrib = xf.mul_base(c, stack[start:stop], xp)
            else:
                contrib = xf.mul(c, stack[start:stop], xp)
            acc = xf.add(acc, _tree_sum(contrib, xp), xp)
        return self._shard(acc, 0)

    def _table_quotient_stack(
        self, ti, base_cw, ext_cw, challenges, terminals, zinv_triple, xp,
        ud: Optional[int] = None,
    ):
        """All quotient codewords of table ti as one (T, N, 3) stack.
        `ud` overrides the row shift for blockwise (streamed) evaluation,
        where a global shift by unit_distance is a shift by
        unit_distance/B within each strided class."""
        t = self.tables[ti]
        alg = ArrayAlgebra(xp)
        ch_vals = [alg.x(challenges[i]) for i in range(11)]
        tm_vals = [alg.x(terminals[i]) for i in range(5)]
        if ud is None:
            ud = t.unit_distance(self.fri.domain.length)

        def rot(arr):
            if ud == 0:
                return arr
            return xp.concatenate([arr[ud:], arr[:ud]], axis=0)

        point = [alg.base(base_cw[j]) for j in range(t.base_width)]
        point += [alg.x(ext_cw[j]) for j in range(t.num_ext_columns)]
        point_next = [alg.base(rot(base_cw[j])) for j in range(t.base_width)]
        point_next += [alg.x(rot(ext_cw[j])) for j in range(t.num_ext_columns)]
        zinv = {
            "boundary": zinv_triple[0],
            "transition": zinv_triple[1],
            "terminal": zinv_triple[2],
        }
        q = t.quotients(alg, point, point_next, ch_vals, tm_vals, zinv)
        return self._shard(xp.stack(q, axis=0), 1)

    def _acc_terms(self, acc, terms, w_pairs_g, ratios_g, opow_g, xp, length):
        """acc += Σ_j (w_plain_j + w_shift_j·x^s_j)·terms[j] over a LIST of
        (length, 3) extension codewords — the stackless counterpart of
        `_acc_group`. Mod-p addition is exact and associative, so the
        per-term order produces bit-identical sums to the chunked
        tree-sum."""
        for j, term in enumerate(terms):
            xs = f.geometric_rows(
                opow_g[j : j + 1], ratios_g[j : j + 1], length, xp
            )[0]
            c = xf.mul_base(
                xp.broadcast_to(w_pairs_g[j, 1][None, :], (length, 3)),
                xs, xp,
            )
            c = f.add(c, w_pairs_g[j, 0][None, :], xp)
            acc = xf.add(acc, xf.mul(c, term, xp), xp)
        return acc

    def _acc_quotients(
        self, ti, acc, base_cw, ext_cw, challenges, terminals, zinv_triple,
        w_pairs_g, ratios_g, opow_g, xp, ud, length,
    ):
        """Fused quotient evaluation + weighted accumulation for table ti
        on one strided class: each quotient term is consumed the moment it
        is produced, so no (T, length, 3) stack ever crosses a stage
        boundary — XLA assigns such minor-dim-3 stacked buffers an
        (8, 128)-tiled layout (42.7x padding; the processor stack alone
        compiled to a 21 GB allocation at S=2^21, the round-5 streamed-
        combination OOM)."""
        t = self.tables[ti]
        alg = ArrayAlgebra(xp)
        ch_vals = [alg.x(challenges[i]) for i in range(11)]
        tm_vals = [alg.x(terminals[i]) for i in range(5)]

        def rot(arr):
            if ud == 0:
                return arr
            return xp.concatenate([arr[ud:], arr[:ud]], axis=0)

        point = [alg.base(base_cw[j]) for j in range(t.base_width)]
        point += [alg.x(ext_cw[j]) for j in range(t.num_ext_columns)]
        point_next = [alg.base(rot(base_cw[j])) for j in range(t.base_width)]
        point_next += [
            alg.x(rot(ext_cw[j])) for j in range(t.num_ext_columns)
        ]
        zinv = {
            "boundary": zinv_triple[0],
            "transition": zinv_triple[1],
            "terminal": zinv_triple[2],
        }
        q = t.quotients(alg, point, point_next, ch_vals, tm_vals, zinv)
        return self._acc_terms(
            acc, q, w_pairs_g, ratios_g, opow_g, xp, length
        )

    # -- streamed (strided-block) prover pieces --------------------------
    # At FRI domains >= config.stream_min, full base/ext codewords never
    # materialize: coefficient groups are evaluated and committed in B
    # strided classes (protocol/stream.py). Transcript bytes are identical
    # to the resident path (tests/test_stream.py, test_stark.py).

    def _stream_plan(self, xp):
        from .stream import make_stream_plan

        cache = getattr(self, "_splan_cache", None)
        key = "np" if xp is np else "jax"
        if cache is not None and cache[0] == key:
            return cache[1]
        N = self.fri.domain.length
        # B must divide every table's unit distance N/height so that the
        # transition-row shift stays within a class
        B = self.config.stream_classes
        for t in self.tables:
            if t.height > 0:
                B = min(B, t.unit_distance(N))
        B = max(B, 2)
        plan = make_stream_plan(N, B, self.fri.domain.omega, xp)
        self._splan_cache = (key, plan)
        return plan

    def _claim_key(self) -> str:
        from ..utils.checkpoint import proof_key

        return proof_key(
            self.program, self.input_symbols, self.output_symbols,
            self.config,
        )

    def _streamed_commit_cached(self, groups, salt_key, splan, xp, tag):
        """streamed_commit memoized at stage granularity: with a seeded rng
        and a configured checkpoint_dir, the accumulated class-level digest
        planes are persisted per (claim, stage); a resumed run re-derives
        the cheap deterministic state (groups, rng draws) and skips the
        expensive streaming hash pass, producing the identical tree. Tags
        of stages loaded from checkpoint are recorded in
        `last_commit_resumes` (observability + tests)."""
        from .stream import StreamedSaltedMerkle, streamed_commit
        from ..utils.checkpoint import load_commit_stage, save_commit_stage

        cfg = self.config
        if not cfg.checkpoint_dir or cfg.seed is None:
            return streamed_commit(groups, salt_key, splan, xp)
        key = self._claim_key()
        got = load_commit_stage(cfg.checkpoint_dir, key, tag)
        if got is not None:
            lo, hi = got
            self.last_commit_resumes.append(tag)
            return StreamedSaltedMerkle(
                splan["N"], splan["B"], (xp.asarray(lo), xp.asarray(hi)),
                xp, salt_key,
            )
        tree = streamed_commit(groups, salt_key, splan, xp)
        # levels[0] is the level-log2(B) digest plane the ladder rebuilds
        # everything above from
        save_commit_stage(
            cfg.checkpoint_dir, key, tag,
            np.asarray(tree.levels[0][0]), np.asarray(tree.levels[0][1]),
        )
        return tree

    def _stage_base_coeffs(self, mats, rand_coeffs, base_rands, packs, xp):
        """Offset-prescaled coefficient groups of every base commitment row
        (randomizer limbs first, then per-table base columns) — the
        persistent state of the streamed prover; zip order matches
        `_commit_base` exactly."""
        from ..ops import ntt as nt

        if rand_coeffs.ndim == 1:  # flat draw; see the randpoly.D note
            rand_coeffs = rand_coeffs.reshape(-1, 3)
        groups = [
            f.mul(
                xp.moveaxis(rand_coeffs, -1, 0),
                packs["rand_scale"][None, : rand_coeffs.shape[0]],
                xp,
            )
        ]
        for i, (t, m, r) in enumerate(zip(self.tables, mats, base_rands)):
            if t.height == 0:
                groups.append(xp.zeros((t.base_width, 1), dtype=xp.uint64))
                continue
            tp = packs["tables"][i]
            groups.append(
                nt.lde_coefficients_unpadded(m.T, r, tp[0], tp[1], xp)
            )
        return tuple(groups)

    def _stage_ext_coeffs(self, xcols, ext_rands, packs, xp):
        """Extension-column coefficient groups (3 limb rows per column,
        zip order matches `_commit_ext`)."""
        from ..ops import ntt as nt

        groups = []
        for i, (t, cols, r) in enumerate(zip(self.tables, xcols, ext_rands)):
            if t.height == 0:
                groups.append(
                    xp.zeros((3 * t.num_ext_columns, 1), dtype=xp.uint64)
                )
                continue
            tp = packs["tables"][i]
            trace = xp.moveaxis(cols, 0, -1)  # (n_ext, 3, H)
            trace = trace.reshape((-1, trace.shape[-1]))
            rr = None
            if r is not None:
                rr = xp.moveaxis(r, -1, 1).reshape((-1, r.shape[1]))
            groups.append(
                nt.lde_coefficients_unpadded(trace, rr, tp[0], tp[1], xp)
            )
        return tuple(groups)

    def _zinv_stream(self, xp):
        """Zerofier-inverse state for streamed proving: the full boundary /
        per-height terminal inverse arrays (natural order, strided-gathered
        per block) plus the SMALL periodic x^H-1 inverse tables — the
        transition inverse is recomposed per block instead of stored at
        full length (2 of the 3 N-arrays per height saved)."""
        key = "np" if xp is np else "jax"
        cache = getattr(self, "_zs_cache", None)
        if cache is not None and cache[0] == key:
            return cache[1]
        N = self.fri.domain.length
        omega = self.fri.domain.omega
        offset = self.fri.domain.offset
        heights = []
        for t in self.tables:
            if t.height not in heights:
                heights.append(t.height)
        omicrons = {t.height: t.omicron for t in self.tables if t.height > 0}
        seeds = [offset, omega]
        periods = {}
        for h in heights:
            if h > 0:
                periods[h] = N // h
                seeds += [
                    f.h_inverse(omicrons[h]), f.h_pow(offset, h),
                    f.h_pow(omega, h),
                ]
            else:
                seeds += [1, 1, 1]
        seeds_np = np.asarray(seeds, dtype=U64)

        def build(sv, xb):
            """(boundary, per-height (terminal, small, o_inv) | None)
            tuples in `heights` order — tuple-structured for jax.export."""
            one = xb.asarray(1, dtype=xb.uint64)
            domain = f.geometric_rows(sv[0:1], sv[1:2], N, xb)[0]
            boundary = f.batch_inverse(f.sub(domain, one, xb), xb)
            per_height = []
            for j, h in enumerate(heights):
                if h == 0:
                    per_height.append(None)
                    continue
                o_inv = sv[2 + 3 * j]
                terminal = f.batch_inverse(f.sub(domain, o_inv, xb), xb)
                p = periods[h]
                xs = f.geometric_rows(
                    sv[3 + 3 * j : 4 + 3 * j], sv[4 + 3 * j : 5 + 3 * j],
                    p, xb,
                )[0]
                small = f.batch_inverse(f.sub(xs, one, xb), xb)
                per_height.append((terminal, small, o_inv))
            return boundary, tuple(per_height)

        if xp is np:
            boundary, per_height = build(seeds_np, np)
        else:
            boundary, per_height = self._jitted(
                "zinv_stream", lambda sv: build(sv, xp)
            )(xp.asarray(seeds_np))
        out = {
            "boundary": boundary,
            "heights": {
                h: (
                    None
                    if t is None
                    else {"terminal": t[0], "small": t[1], "o_inv": t[2]}
                )
                for h, t in zip(heights, per_height)
            },
        }
        self._zs_cache = (key, out)
        return out

    def _stream_zinv_block(
        self, heights, b_arr, x_start, ratio, boundary, terminals, smalls,
        oinvs, splan, xp,
    ):
        """Per-block zerofier inverses: strided-class gathers from the
        stored boundary/terminal arrays plus the recomposed transition
        (x - o^-1)/(x^H - 1) from the periodic small table. All stored
        arrays arrive as runtime ARGUMENTS (closure-captured device arrays
        would be embedded as HLO constants)."""
        N, B, S = splan["N"], splan["B"], splan["S"]
        x_blk = f.geometric_rows(x_start, ratio, S, xp)[0]

        def cls(arr):
            return arr.reshape(S, B)[:, b_arr]

        per_height = []
        for j, h in enumerate(heights):
            if h == 0:
                per_height.append((
                    xp.zeros((S,), dtype=xp.uint64),
                    xp.zeros((S,), dtype=xp.uint64),
                ))
                continue
            p = N // h  # the unit distance; B | p by _stream_plan
            small_cls = smalls[j].reshape(p // B, B)[:, b_arr]  # (p/B,)
            tiled = xp.tile(small_cls, S // (p // B))
            transition = f.mul(tiled, f.sub(x_blk, oinvs[j], xp), xp)
            per_height.append((transition, cls(terminals[j])))
        # tuple-structured (export-serializable); callers rebuild the
        # height-keyed view
        return cls(boundary), tuple(per_height)

    def _stream_combination(
        self, staged, base_groups, ext_groups, challenges_arr, terminals_arr,
        weights_h, shifts_np, offset_pows_np, splan, xp,
        table_quot_counts,
    ):
        """Quotients + nonlinear combination evaluated per strided class;
        returns the assembled (N, 3) combination codeword. Per-block data
        (ω^b, per-term starts, class index) enter as runtime arguments so
        each stage compiles ONCE for all B blocks."""
        from .stream import block_values

        N, B, S = splan["N"], splan["B"], splan["S"]
        omega = splan["omega"]
        offset = self.fri.domain.offset
        zs = self._zinv_stream(xp)
        zheights = []
        for t in self.tables:
            if t.height not in zheights:
                zheights.append(t.height)
        zero_s = None
        zterms, zsmalls, zoinvs = [], [], []
        for h in zheights:
            d = zs["heights"][h]
            if d is None:
                if zero_s is None:
                    zero_s = xp.zeros((1,), dtype=xp.uint64)
                zterms.append(zero_s)
                zsmalls.append(zero_s)
                zoinvs.append(zero_s[0])
            else:
                zterms.append(d["terminal"])
                zsmalls.append(d["small"])
                zoinvs.append(d["o_inv"])
        ratio_B = xp.asarray(np.asarray([f.h_pow(omega, B)], dtype=U64))
        scale_len_b = max(int(g.shape[1]) for g in base_groups)
        scale_len_e = max(int(g.shape[1]) for g in ext_groups)

        # per-term ratios (ω^B)^s are block-independent
        ratios_np = np.asarray(
            [f.h_pow(omega, (B * int(sh)) % N) for sh in shifts_np],
            dtype=U64,
        )
        ratios_dev = xp.asarray(ratios_np)
        w0 = xp.asarray(np.asarray(weights_h[0], dtype=U64))
        w_pairs_np = np.asarray(weights_h[1:], dtype=U64).reshape(-1, 2, 3)
        w_pairs_dev = xp.asarray(w_pairs_np)

        num_base = sum(t.base_width for t in self.tables)
        num_ext = sum(t.num_ext_columns for t in self.tables)

        # ext values leave the stage already in (num_ext, S, 3) stack form:
        # a separate reshape dispatch would hold a second 100s-of-MB copy
        # of the block's extension values live (HBM peak at 2^26 domains)
        vals_stage = staged(
            "sc_vals",
            lambda bg, eg, wb, pk: (
                block_values(bg, wb, scale_len_b, pk, S, xp),
                xp.moveaxis(
                    block_values(eg, wb, scale_len_e, pk, S, xp).reshape(
                        num_ext, 3, S
                    ),
                    1,
                    -1,
                ),
            ),
        )

        def acc_stage(name, count):
            return staged(
                f"sc_acc_{name}{count}",
                lambda a, st, wp, rt, op: self._acc_group(
                    a, st, wp, rt, op, xp, length=S
                ),
            )

        comb_blocks = []
        for b in range(B):
            wb = xp.asarray(np.asarray([f.h_pow(omega, b)], dtype=U64))
            b_arr = xp.asarray(np.int32(b))
            x_start = xp.asarray(
                np.asarray([f.h_mul(offset, f.h_pow(omega, b))], dtype=U64)
            )
            # per-term x^s starts on this block: (offset·ω^b)^s
            starts_np = np.asarray(
                [
                    f.h_mul(
                        int(offset_pows_np[j]),
                        f.h_pow(omega, (b * int(sh)) % N),
                    )
                    for j, sh in enumerate(shifts_np)
                ],
                dtype=U64,
            )
            starts_dev = xp.asarray(starts_np)

            # debug bisection: surface WHICH dispatch of a block chain
            # raises a deferred device error (async errors otherwise all
            # land on the end-of-block sync)
            if os.environ.get("STARK_STREAM_SYNC_ALL") and xp is not np:
                import jax as _jax

                def _dbg(tag, val):
                    leaf = [
                        x.ravel()[:1]
                        for x in _jax.tree_util.tree_leaves(val)
                        if hasattr(x, "ravel")
                    ][:1]
                    _jax.device_get(leaf)
                    print(f"[sc dbg] b={b} {tag} ok", flush=True)
            else:
                def _dbg(tag, val):
                    return None

            base_vals, ext_vals = vals_stage(
                tuple(base_groups), tuple(ext_groups), wb, splan["pack_S"]
            )
            _dbg("sc_vals", base_vals)
            zb_boundary, zb_per_height = staged(
                "sc_zinv",
                lambda ba, xs, rt, bd, tm, sm, oi: self._stream_zinv_block(
                    tuple(zheights), ba, xs, rt, bd, tm, sm, oi, splan, xp
                ),
            )(
                b_arr, x_start, ratio_B, zs["boundary"],
                tuple(zterms), tuple(zsmalls), tuple(zoinvs),
            )
            _dbg("sc_zinv", zb_boundary)
            zinv_b = {
                "boundary": zb_boundary,
                "heights": {
                    h: {"transition": t[0], "terminal": t[1]}
                    for h, t in zip(zheights, zb_per_height)
                },
            }

            rand_cw_b = xp.moveaxis(base_vals[:3], 0, -1)  # (S, 3)
            acc = staged(
                "sc_rand",
                lambda rcw, w: xf.mul(
                    xp.broadcast_to(w[None, :], (S, 3)), rcw, xp
                ),
            )(rand_cw_b, w0)

            pos = 0
            acc = acc_stage("base", num_base)(
                acc, base_vals[3:], w_pairs_dev[pos : pos + num_base],
                ratios_dev[pos : pos + num_base],
                starts_dev[pos : pos + num_base],
            )
            _dbg("sc_acc_base", acc)
            pos += num_base
            ext_stack = ext_vals  # (num_ext, S, 3) straight from sc_vals
            acc = acc_stage("ext", num_ext)(
                acc, ext_stack, w_pairs_dev[pos : pos + num_ext],
                ratios_dev[pos : pos + num_ext],
                starts_dev[pos : pos + num_ext],
            )
            _dbg("sc_acc_ext", acc)
            pos += num_ext

            # per-table fused quotients+accumulation on the block (no
            # stacked (T, S, 3) stage outputs — see _acc_quotients)
            row0 = 3
            ext0 = 0
            ext_cws_b = []
            for ti, t in enumerate(self.tables):
                base_cw_b = base_vals[row0 : row0 + t.base_width]
                ext_cw_b = ext_stack[ext0 : ext0 + t.num_ext_columns]
                ext_cws_b.append(ext_cw_b)
                row0 += t.base_width
                ext0 += t.num_ext_columns
                h = t.height
                zb = zinv_b["heights"][h]
                zinv3 = (zinv_b["boundary"], zb["transition"], zb["terminal"])
                ud_b = t.unit_distance(N) // B if h > 0 else 0
                count = table_quot_counts[ti]
                acc = staged(
                    f"sc_quotacc{ti}",
                    lambda a, bc, ec, ch, tm, z3, wp, rt, st,
                    _ti=ti, _ud=ud_b: self._acc_quotients(
                        _ti, a, bc, ec, ch, tm, z3, wp, rt, st, xp, _ud, S
                    ),
                )(
                    acc, base_cw_b, ext_cw_b, challenges_arr, terminals_arr,
                    zinv3, w_pairs_dev[pos : pos + count],
                    ratios_dev[pos : pos + count],
                    starts_dev[pos : pos + count],
                )
                _dbg(f"sc_quotacc{ti}", acc)
                pos += count

            acc = staged(
                "sc_paacc",
                lambda a, e0, e1, e2, bz, wp, rt, st: self._acc_terms(
                    a,
                    [
                        xf.mul_base(xf.sub(e0[0], e1[0], xp), bz, xp),
                        xf.mul_base(xf.sub(e0[1], e2[0], xp), bz, xp),
                    ],
                    wp, rt, st, xp, S,
                ),
            )(
                acc, ext_cws_b[0], ext_cws_b[1], ext_cws_b[2],
                zinv_b["boundary"], w_pairs_dev[pos : pos + 2],
                ratios_dev[pos : pos + 2], starts_dev[pos : pos + 2],
            )
            _dbg("sc_paacc", acc)
            pos += 2
            assert pos == shifts_np.shape[0]
            comb_blocks.append(acc)
            # hard sync (1-element fetch — block_until_ready is unreliable
            # through the remote-tunnel backend): the host otherwise runs
            # all B block chains ahead of the device and several blocks'
            # multi-GB evaluation/quotient intermediates stay in flight at
            # once on top of the prover's persistent state — a RUNTIME HBM
            # exhaustion at the 2^26 FRI domain. Period scales inversely
            # with the block size so small streamed runs pay ~nothing.
            if xp is not np and (b + 1) % max(1, (1 << 21) // S) == 0:
                import jax

                jax.device_get(acc.ravel()[:1])

        # leaf i = q·B + b  ->  comb[i] = blocks[b][q]
        comb = xp.stack(comb_blocks, axis=1).reshape(N, 3)
        return comb

    def _combination_pipeline(
        self, staged, rand_cw, base_cws, ext_cws, challenges_arr,
        terminals_arr, weights_h, shifts_np, offset_pows_np, zinv_flat, xp,
        tree_cut=None,
    ):
        """Host-orchestrated combination: jitted pieces with explicit
        boundaries (see the note above _acc_group).

        With `tree_cut` set (device path), the FINAL accumulation stage
        also builds the combination codeword's Merkle digest levels in the
        SAME dispatch (fold+tree fusion, as the FRI rounds already do —
        fri.py _fold_device) and the return is (acc, levels) instead of
        acc: one executable instead of two, no acc hand-off between the
        last combination dispatch and a separate tree build."""
        N = self.fri.domain.length
        ratios_np = np.asarray(
            [f.h_pow(self.fri.domain.omega, int(s)) for s in shifts_np],
            dtype=U64,
        )
        w0 = xp.asarray(np.asarray(weights_h[0], dtype=U64))
        w_pairs_np = np.asarray(weights_h[1:], dtype=U64).reshape(-1, 2, 3)

        def group_args(start, count):
            return (
                xp.asarray(w_pairs_np[start : start + count]),
                xp.asarray(ratios_np[start : start + count]),
                xp.asarray(offset_pows_np[start : start + count]),
            )

        acc = staged(
            "comb_rand",
            lambda rcw, w: xf.mul(
                xp.broadcast_to(w[None, :], (N, 3)), rcw, xp
            ),
        )(rand_cw, w0)

        pos = 0
        num_base = sum(t.base_width for t in self.tables)
        base_stack = xp.concatenate(list(base_cws), axis=0)
        acc = staged(
            f"comb_acc_base{num_base}",
            lambda a, s, wp, rt, op: self._acc_group(
                a, s, wp, rt, op, xp
            ),
        )(acc, base_stack, *group_args(pos, num_base))
        pos += num_base

        num_ext = sum(t.num_ext_columns for t in self.tables)
        ext_stack = xp.concatenate(list(ext_cws), axis=0)
        acc = staged(
            f"comb_acc_ext{num_ext}",
            lambda a, s, wp, rt, op: self._acc_group(
                a, s, wp, rt, op, xp
            ),
        )(acc, ext_stack, *group_args(pos, num_ext))
        pos += num_ext

        for ti, t in enumerate(self.tables):
            zinv3 = (
                zinv_flat[3 * ti], zinv_flat[3 * ti + 1], zinv_flat[3 * ti + 2]
            )
            stack = staged(
                f"comb_quot{ti}",
                lambda bc, ec, ch, tm, z3, _ti=ti: self._table_quotient_stack(
                    _ti, bc, ec, ch, tm, z3, xp
                ),
            )(base_cws[ti], ext_cws[ti], challenges_arr, terminals_arr, zinv3)
            count = stack.shape[0]
            acc = staged(
                f"comb_acc_q{count}",
                lambda a, s, wp, rt, op: self._acc_group(
                    a, s, wp, rt, op, xp
                ),
            )(acc, stack, *group_args(pos, count))
            pos += count

        # permutation-argument difference quotients
        pa_stack = staged(
            "comb_pa",
            lambda e0, e1, e2, bz: xp.stack(
                [
                    xf.mul_base(xf.sub(e0[0], e1[0], xp), bz, xp),
                    xf.mul_base(xf.sub(e0[1], e2[0], xp), bz, xp),
                ],
                axis=0,
            ),
        )(ext_cws[0], ext_cws[1], ext_cws[2], zinv_flat[0])
        if tree_cut is None:
            acc = staged(
                "comb_acc_q2",
                lambda a, s, wp, rt, op: self._acc_group(
                    a, s, wp, rt, op, xp
                ),
            )(acc, pa_stack, *group_args(pos, 2))
            out = acc
        else:
            from .device_merkle import build_levels

            def final_with_tree(a, s, wp, rt, op):
                acc2 = self._acc_group(a, s, wp, rt, op, xp)
                return acc2, build_levels(acc2, None, xp, tree_cut)

            out = staged(f"comb_acc_q2_tree.c{tree_cut}", final_with_tree)(
                acc, pa_stack, *group_args(pos, 2)
            )
        pos += 2
        assert pos == shifts_np.shape[0], "term/shift bookkeeping mismatch"
        return out

    # ------------------------------------------------------------------
    # prover
    # ------------------------------------------------------------------

    def prove(self, *args, **kwargs) -> bytes:
        """Prove; set STARK_JAX_PROFILE=<dir> to capture a jax.profiler
        trace of the run (viewable with tensorboard / xprof)."""
        import os

        profile_dir = os.environ.get("STARK_JAX_PROFILE")
        if not profile_dir:
            return self._prove(*args, **kwargs)
        import jax

        with jax.profiler.trace(profile_dir):
            return self._prove(*args, **kwargs)

    def _prove(
        self,
        processor_matrix: np.ndarray,
        memory_matrix: np.ndarray,
        instruction_matrix: np.ndarray,
        input_matrix: np.ndarray,
        output_matrix: np.ndarray,
        proof_stream: Optional[ProofStream] = None,
        xp=None,
    ) -> bytes:
        if xp is None:
            import jax.numpy as xp
        use_jit = xp is not np
        cfg = self.config
        rng = Rng(cfg.seed)
        fri = self.fri
        N = fri.domain.length

        # sharded proving: build the mesh once per instance; every stage
        # carries codeword-axis sharding constraints (self._shard), XLA
        # inserts the collectives. Proof bytes are mesh-invariant
        # (tests/test_parallel.py).
        if use_jit and cfg.mesh_shape and getattr(self, "_mesh", None) is None:
            from ..parallel.mesh import make_mesh

            n_dev = 1
            for _, size in cfg.mesh_shape:
                n_dev *= size
            self._mesh = make_mesh(n_dev)
        self.fri.mesh = getattr(self, "_mesh", None)

        from ..utils.metrics import StageTimer

        self.last_commit_resumes: List[str] = []
        timer = StageTimer()
        _mark = timer.mark

        def staged(name, fn):
            return self._jitted(name, fn) if use_jit else fn

        # 1. populate and pad (ref brainfuck_stark.py:139-150)
        assert len(processor_matrix) + len(self.program) == len(instruction_matrix)
        matrices = [
            processor_matrix, instruction_matrix, memory_matrix,
            input_matrix, output_matrix,
        ]
        for t, m in zip(self.tables, matrices):
            t.matrix = np.asarray(m, dtype=U64).reshape(-1, t.base_width)
            if len(t.matrix) > 0:
                t.pad()

        if proof_stream is None:
            proof_stream = self.codec.make_stream()
        native_codec = self.codec.name == "native"

        mats = tuple(xp.asarray(t.matrix) for t in self.tables)

        # 2-3. randomizer polynomial + base LDE (ref :164-176), one fused
        # device stage. The degree-max_degree randomizer is drawn by the
        # BLAKE2b counter PRF where it is consumed (device PRF for jax,
        # host for numpy — bit-identical), so only 16 key bytes cross the
        # host boundary instead of a (max_degree+1, 3) u64 bulk draw
        # (~400 MB of host generation + upload at 2^20-cycle scale).
        from .device_merkle import prf_digest_words, prf_field_words

        rand_count = (self.max_degree + 1) * 3
        rp_lo, rp_hi = salt_key_limbs(rng.bytes(16))
        # the Pallas BLAKE2b graph costs ~5 KB of XLA temps per digest, so
        # one whole-draw dispatch needs 32 GB at 2^20-cycle scale (HBM is
        # 16): draw in fixed-size counter chunks, ONE compiled executable
        # with the counter offset as a runtime argument
        # ... and the draw stays FLAT until inside the consumer stage: a
        # standalone (max_degree+1, 3) u64 array tiles to (8, 128) lanes on
        # TPU — 42.7x layout padding, 16 GB for the array alone at a 2^26
        # FRI domain (the second round-5 OOM). The coeff stages reshape
        # where XLA fuses the transpose into a compact strided read.
        PRF_D = 1 << 18
        n_digests = (rand_count + 7) // 8
        if use_jit and n_digests > PRF_D:
            chunk_fn = staged(
                f"randpoly.D{PRF_D}",
                lambda kl, kh, off: prf_digest_words(kl, kh, PRF_D, off, xp),
            )
            kl_d, kh_d = xp.asarray(rp_lo), xp.asarray(rp_hi)
            parts = [
                chunk_fn(kl_d, kh_d, xp.asarray(c * PRF_D, dtype=np.uint32))
                for c in range(-(-n_digests // PRF_D))
            ]
            randomizer_coeffs = xp.concatenate(parts)[:rand_count]
        elif use_jit:
            randomizer_coeffs = staged(
                "randpoly",
                lambda kl, kh: prf_field_words(kl, kh, rand_count, xp),
            )(xp.asarray(rp_lo), xp.asarray(rp_hi))
        else:
            randomizer_coeffs = prf_field_words(rp_lo, rp_hi, rand_count, np)
        base_rands = tuple(
            xp.asarray(rng.base_elements((t.base_width, t.num_randomizers)))
            if t.num_randomizers > 0 and t.height > 0
            else None
            for t in self.tables
        )
        packs = self._lde_packs(xp)
        # streamed (strided-block) mode: full codewords never materialize
        # (see protocol/stream.py); transcript-identical to the paths below
        use_stream = native_codec and N >= cfg.stream_min
        device_like = native_codec and use_jit and N >= cfg.device_commit_min
        use_device_commit = device_like and not use_stream
        if use_stream:
            splan = self._stream_plan(xp)
            stage_a = staged(
                "base_coeffs",
                lambda m_, rc, br, pk: self._stage_base_coeffs(
                    m_, rc, br, pk, xp
                ),
            )
            base_groups = stage_a(mats, randomizer_coeffs, base_rands, packs)
            randomizer_codeword = base_codewords_per_table = None
            _mark("stage_a (base coeffs)", sync=base_groups)
        else:
            stage_a = staged(
                "base_lde",
                lambda m_, rc, br, pk: self._stage_base_lde(m_, rc, br, pk, xp),
            )
            randomizer_codeword, base_codewords_per_table = stage_a(
                mats, randomizer_coeffs, base_rands, packs
            )
            _mark("stage_a (base LDE)",
                  sync=(randomizer_codeword, base_codewords_per_table))

        # 4. salted commitment to zipped base codewords (ref :178-180).
        # Device path: zip + salt-PRF + BLAKE2b tree all on device — only
        # the root (and later the opened rows/paths) cross to the host.
        base_salt_key = rng.bytes(16)
        num_base_cols = sum(t.base_width for t in self.tables)
        base_widths = [3] + [1] * num_base_cols
        if use_stream:
            base_tree = self._streamed_commit_cached(
                base_groups, base_salt_key, splan, xp, "base"
            )
            base_row = base_tree.row_at
            _mark("base merkle (streamed)", sync=base_tree.levels)
        elif use_device_commit:
            # ONE fused dispatch: zip + salt PRF + whole BLAKE2b tree.
            # (Eager per-op dispatch here measured ~45 ms/op through the
            # remote-tunnel backend — the salt PRF alone was ~30 ops.)
            tree_cut = dm_default_cut(N)

            def _commit_base(r, cws, kl, kh):
                zipped = self._shard(
                    xp.concatenate([r] + [cw.T for cw in cws], axis=1), 0
                )
                salts = self._shard(salt_words_device(kl, kh, N, xp), 0)
                return zipped, salts, dm_build_levels(
                    zipped, salts, xp, tree_cut
                )

            klo, khi = salt_key_limbs(base_salt_key)
            zipped_base_dev, base_salts_dev, base_levels = staged(
                "commit_base", _commit_base
            )(randomizer_codeword, base_codewords_per_table,
              xp.asarray(klo), xp.asarray(khi))
            base_tree = DeviceSaltedMerkle(
                zipped_base_dev, base_salts_dev, xp, levels=base_levels,
                cut=tree_cut,
            )
            base_row = base_tree.row_at
            _mark("base merkle (device)", sync=base_tree.levels)
        else:
            base_host = [np.asarray(cw) for cw in base_codewords_per_table]
            rand_host = np.asarray(randomizer_codeword)
            zipped_base = np.concatenate(
                [rand_host] + [cw.T for cw in base_host], axis=1
            )  # (N, 3 + num_base_columns) u64
            _mark("base host transfer+zip")
            base_salts = SaltBuffer(
                salt_words_to_buffer(dm_salt_words(base_salt_key, N, np))
            )
            if native_codec:
                buf, plen = _salted_payload_buffer(zipped_base, base_salts.buf)
                base_tree = SaltedMerkle.from_buffer(buf, plen, N, base_salts)
            else:
                base_payloads = [
                    self.codec.salted_payload(
                        _row_to_leaf_object(zipped_base[i], base_widths),
                        base_salts[i],
                    )
                    for i in range(N)
                ]
                base_tree = SaltedMerkle(base_payloads, base_salts)
            base_row = lambda idx: zipped_base[idx]  # noqa: E731
            _mark("base merkle")
        base_leaf_cache: Dict[int, tuple] = {}

        def base_leaf_obj(idx):
            if idx not in base_leaf_cache:
                base_leaf_cache[idx] = _row_to_leaf_object(
                    base_row(idx), base_widths
                )
            return base_leaf_cache[idx]

        proof_stream.push(base_tree.root())

        # 5. challenges (ref :183-184)
        challenges_h = sample_weights(11, proof_stream.prover_fiat_shamir())

        # 6. secret initials for the two permutation arguments (ref :186-187)
        initials_h = [rng.x_element(chunk=8) for _ in range(2)]

        # 7. extend tables via the host batched scan (ref :189-190)
        ext_rands = tuple(
            xp.asarray(rng.x_elements((t.num_ext_columns, t.num_randomizers)))
            if t.num_randomizers > 0 and t.height > 0
            else None
            for t in self.tables
        )
        challenges_arr = xp.asarray(np.asarray(challenges_h, dtype=U64))
        if use_jit:
            # device path: one jitted scan stage; only the terminals (a few
            # dozen words) cross to the host
            initials_arr = xp.asarray(np.asarray(initials_h, dtype=U64))
            stage_x = staged(
                "extend",
                lambda m_, ch, ini: self._device_extend(m_, ch, ini, xp),
            )
            xcols_dev, terms_dev = stage_x(mats, challenges_arr, initials_arr)
            from ..parallel.multihost import to_host

            terms_host = to_host(terms_dev)
            for t, cols_dev, terms in zip(self.tables, xcols_dev, terms_host):
                terms = np.asarray(terms, dtype=U64)
                # keep the device array: Table.xtest / debug paths call
                # np.asarray(xcolumns), which materializes a host copy
                t.xcolumns = cols_dev
                t.terminals = {
                    n: tuple(int(v) for v in terms[j])
                    for j, n in enumerate(t.terminal_names)
                }
            _mark("extend (device scan)", sync=xcols_dev)
        else:
            xcols_np, _ = self._host_extend(challenges_h, initials_h)
            _mark("host extend (batched scans)")
            xcols_dev = tuple(xp.asarray(c) for c in xcols_np)
        terminals_h = self._terminals_list()

        # 8. extension LDE on device (ref :194-199)
        if use_stream:
            stage_b = staged(
                "ext_coeffs",
                lambda xc, er, pk: self._stage_ext_coeffs(xc, er, pk, xp),
            )
            ext_groups = stage_b(xcols_dev, ext_rands, packs)
            ext_codewords_per_table = None
            if not cfg.debug_degree_checks:
                # the extension columns' only remaining consumer is the
                # debug xtest path; dropping the references lets the
                # runtime free ~400 MB once stage_b consumes them
                # (streamed proves run at the edge of HBM)
                for t in self.tables:
                    t.xcolumns = None
                xcols_dev = None
                # the device trace matrices were consumed by stage_a and
                # the extend scan; only the coefficient groups persist
                mats = None
            _mark("stage_b (ext coeffs)", sync=ext_groups)
        else:
            stage_b = staged(
                "ext_lde",
                lambda xc, er, pk: self._stage_ext_lde(xc, er, pk, xp),
            )
            ext_codewords_per_table = stage_b(xcols_dev, ext_rands, packs)
            _mark("stage_b (ext LDE)", sync=ext_codewords_per_table)

        ext_salt_key = rng.bytes(16)
        num_ext_cols = sum(t.num_ext_columns for t in self.tables)
        ext_widths = [3] * num_ext_cols
        if use_stream:
            ext_tree = self._streamed_commit_cached(
                ext_groups, ext_salt_key, splan, xp, "ext"
            )
            ext_row = ext_tree.row_at
            _mark("ext merkle (streamed)", sync=ext_tree.levels)
        elif use_device_commit:
            tree_cut = dm_default_cut(N)

            def _commit_ext(cws, kl, kh):
                zipped = self._shard(
                    xp.concatenate(
                        [xp.moveaxis(cw, 0, 1).reshape(N, -1) for cw in cws],
                        axis=1,
                    ),
                    0,
                )
                salts = self._shard(salt_words_device(kl, kh, N, xp), 0)
                return zipped, salts, dm_build_levels(
                    zipped, salts, xp, tree_cut
                )

            eklo, ekhi = salt_key_limbs(ext_salt_key)
            zipped_ext_dev, ext_salts_dev, ext_levels = staged(
                "commit_ext", _commit_ext
            )(ext_codewords_per_table, xp.asarray(eklo), xp.asarray(ekhi))
            ext_tree = DeviceSaltedMerkle(
                zipped_ext_dev, ext_salts_dev, xp, levels=ext_levels,
                cut=tree_cut,
            )
            ext_row = ext_tree.row_at
            _mark("ext merkle (device)", sync=ext_tree.levels)
        else:
            ext_host = [np.asarray(cw) for cw in ext_codewords_per_table]
            zipped_ext = np.concatenate(
                [cw.transpose(1, 0, 2).reshape(N, -1) for cw in ext_host],
                axis=1,
            )  # (N, 9*3)
            _mark("ext host transfer+zip")
            ext_salts = SaltBuffer(
                salt_words_to_buffer(dm_salt_words(ext_salt_key, N, np))
            )
            if native_codec:
                buf, plen = _salted_payload_buffer(zipped_ext, ext_salts.buf)
                ext_tree = SaltedMerkle.from_buffer(buf, plen, N, ext_salts)
            else:
                ext_payloads = [
                    self.codec.salted_payload(
                        _row_to_leaf_object(zipped_ext[i], ext_widths),
                        ext_salts[i],
                    )
                    for i in range(N)
                ]
                ext_tree = SaltedMerkle(ext_payloads, ext_salts)
            ext_row = lambda idx: zipped_ext[idx]  # noqa: E731
            _mark("ext merkle")
        ext_leaf_cache: Dict[int, tuple] = {}

        def ext_leaf_obj(idx):
            if idx not in ext_leaf_cache:
                ext_leaf_cache[idx] = _row_to_leaf_object(
                    ext_row(idx), ext_widths
                )
            return ext_leaf_cache[idx]

        proof_stream.push(ext_tree.root())

        if cfg.debug_degree_checks and not use_stream:
            # (streamed mode never materializes the full codewords the
            # degree check interpolates; run DEBUG at resident sizes)
            self.debug_check_degrees(
                [np.asarray(cw) for cw in base_codewords_per_table],
                [np.asarray(cw) for cw in ext_codewords_per_table],
                challenges_h, terminals_h,
            )

        # 9. quotient degree bounds (host, symbolic; ref :210-218)
        quotient_degree_bounds = []
        for t in self.tables:
            quotient_degree_bounds += t.all_quotient_degree_bounds(
                challenges_h, terminals_h
            )
        for pa in self.permutation_arguments:
            quotient_degree_bounds.append(pa.quotient_degree_bound())

        # 10. terminals into the transcript (ref :220-221)
        for t_ in terminals_h:
            proof_stream.push(t_)

        # 11. weights (ref :226-238)
        num_base = sum(t.base_width for t in self.tables)
        num_ext = sum(t.num_ext_columns for t in self.tables)
        num_quot = len(quotient_degree_bounds)
        weights_h = sample_weights(
            1 + 2 * (num_base + num_ext + num_quot),
            proof_stream.prover_fiat_shamir(),
        )

        # 12. quotients + nonlinear combination, one fused device stage
        # (ref :204-218, :240-298; quotient codewords never leave the device)
        base_bounds = self._base_degree_bounds()
        ext_bounds = self._ext_degree_bounds()
        all_shift_bounds = base_bounds + ext_bounds + quotient_degree_bounds
        shifts_np = np.asarray(
            [self.max_degree - b for b in all_shift_bounds], dtype=np.int64
        )
        offset_pows_np = np.asarray(
            [
                f.h_pow(fri.domain.offset, self.max_degree - b)
                for b in all_shift_bounds
            ],
            dtype=U64,
        )
        terminals_arr = xp.asarray(np.asarray(terminals_h, dtype=U64))
        if use_stream:
            zinv_flat = None  # _stream_combination holds its own lean store
        else:
            zinv = self._zerofier_inverses(xp)
            zinv_flat = tuple(
                zinv[t.height][k]
                for t in self.tables
                for k in ("boundary", "transition", "terminal")
            )
        comb_cut = None
        if use_stream:
            acc = self._stream_combination(
                staged, base_groups, ext_groups, challenges_arr,
                terminals_arr, weights_h, shifts_np, offset_pows_np,
                splan, xp,
                [
                    len(t.all_quotient_degree_bounds(
                        challenges_h, terminals_h
                    ))
                    for t in self.tables
                ],
            )
        else:
            from .device_merkle import _HOST_CUT as _hc
            from .device_merkle import default_cut as _dc

            comb_cut = (
                _dc(N) if (device_like and N > _hc) else None
            )
            acc = self._combination_pipeline(
                staged,
                randomizer_codeword,
                base_codewords_per_table,
                ext_codewords_per_table,
                challenges_arr,
                terminals_arr,
                weights_h,
                shifts_np,
                offset_pows_np,
                zinv_flat,
                xp,
                tree_cut=comb_cut,
            )
        # 13. commit to the combination codeword (ref :301-302)
        comb_leaf_cache: Dict[int, tuple] = {}
        if device_like:
            if not use_stream and comb_cut is not None:
                # tree digest levels came fused out of the final
                # combination dispatch
                acc, comb_levels = acc
                combination = acc
                _mark("stage_c (quotients+combination)", sync=acc)
                combination_tree = DeviceMerkle(
                    acc, xp, levels=comb_levels, cut=comb_cut
                )
            else:
                combination = acc
                _mark("stage_c (quotients+combination)", sync=acc)
                combination_tree = DeviceMerkle(acc, xp)
            comb_row = combination_tree.row_at
            _mark("combination merkle (device)", sync=combination_tree.levels)
        else:
            combination = np.asarray(acc)  # (N, 3) host
            _mark("stage_c (quotients+combination)")
            if native_codec:
                combination_tree = Merkle.from_buffer(
                    np.ascontiguousarray(combination.astype("<u8")).tobytes(),
                    24, N,
                )
            else:
                comb_payloads = [
                    self.codec.leaf_payload(
                        tuple(int(v) for v in combination[i])
                    )
                    for i in range(N)
                ]
                combination_tree = Merkle(comb_payloads)
            comb_row = lambda idx: combination[idx]  # noqa: E731
            _mark("combination merkle")

        def comb_leaf_obj(idx):
            if idx not in comb_leaf_cache:
                comb_leaf_cache[idx] = tuple(int(v) for v in comb_row(idx))
            return comb_leaf_cache[idx]

        proof_stream.push(combination_tree.root())

        # 14. query indices (ref :305-307)
        indices = sample_indices_stark(
            cfg.security_level, proof_stream.prover_fiat_shamir(), N
        )

        unit_distances = [t.unit_distance(N) for t in self.tables]
        unit_distances = list(set(unit_distances))

        # 15. open zipped base/ext leaves (ref :313-326); device trees
        # gather all rows/salts/path siblings in one transfer per tree
        if use_device_commit or use_stream:
            open_idx = sorted(
                {
                    (index + d) % N
                    for index in indices
                    for d in [0] + unit_distances
                }
            )
            if use_stream:
                # second streaming pass: re-evaluate the classes, gathering
                # the opened positions (protocol/stream.py reopen_rows)
                from .stream import reopen_rows

                base_tree.resolve(
                    open_idx, reopen_rows(base_groups, splan, xp)
                )
                ext_tree.resolve(
                    open_idx, reopen_rows(ext_groups, splan, xp)
                )
                # the coefficient groups' and the zerofier-inverse store's
                # last consumers are the passes above — free ~2.6 GB of
                # device memory before FRI runs (2^26 domains ride the
                # HBM ceiling)
                base_groups = ext_groups = None
                self._zs_cache = None
                _mark("reopen (streamed 2nd pass)")
            batch = [(base_tree, open_idx), (ext_tree, open_idx)]
            if device_like:
                batch.append((combination_tree, indices))
            prefetch_trees(batch)
        for index in indices:
            for distance in [0] + unit_distances:
                idx = (index + distance) % N
                salt, path = base_tree.open(idx)
                proof_stream.push(base_leaf_obj(idx))
                proof_stream.push((salt, path))

                proof_stream.push(ext_leaf_obj(idx))
                proof_stream.push(ext_tree.open(idx))

        # 16. open combination codeword (ref :329-333)
        for index in indices:
            proof_stream.push(comb_leaf_obj(index))
            proof_stream.push(combination_tree.open(index))

        # 17. FRI (ref :336)
        comb_leaf_objs0 = None
        if not native_codec:
            comb_leaf_objs0 = [comb_leaf_obj(i) for i in range(N)]
        self.fri.prove(
            combination, proof_stream, leaf_objs0=comb_leaf_objs0,
            xp=xp if device_like else np,
            tree0=combination_tree if native_codec else None,
        )
        _mark("fri.prove")

        proof = proof_stream.serialize()
        _mark("serialize")
        T = self.tables[0].height
        st = timer.stages

        def stage_sum(*substrings):
            return sum(
                v for k, v in st.items()
                if any(s in k for s in substrings)
            )

        # NTT butterflies: every coefficient row through the two shared
        # forward N-NTTs plus the per-table height-H INTTs
        logN = N.bit_length() - 1
        fwd_rows = 3 + num_base_cols + 3 * num_ext_cols
        butterflies = fwd_rows * (N // 2) * logN
        for t in self.tables:
            if t.height > 1:
                h = t.height
                butterflies += (
                    (t.base_width + 3 * t.num_ext_columns)
                    * (h // 2) * (h.bit_length() - 1)
                )
        lde_s = stage_sum("stage_a", "stage_b")
        # BLAKE2b leaves: base + ext + combination trees at N, plus every
        # FRI fold round's tree (round 0 reuses the combination tree)
        hash_leaves = 3 * N + sum(
            N >> r for r in range(1, self.fri.num_rounds())
        )
        hash_s = stage_sum("merkle", "fri.prove")
        extend_s = stage_sum("extend")
        extend_rows = sum(t.height for t in self.tables)
        self.last_metrics = timer.report(
            fri_domain=N,
            trace_height=T,
            cycles_per_s=round(T / timer.total(), 2),
            proof_bytes=len(proof),
            ntt_butterflies=butterflies,
            ntt_butterflies_per_s=(
                round(butterflies / lde_s) if lde_s > 0 else None
            ),
            hash_leaves=hash_leaves,
            hash_leaves_per_s=(
                round(hash_leaves / hash_s) if hash_s > 0 else None
            ),
            extend_rows_per_s=(
                round(extend_rows / extend_s) if extend_s > 0 else None
            ),
            fri_round_s=getattr(self.fri, "last_round_s", None),
            ntt_path=getattr(self, "_resolved_ntt_path", None),
            hash_path=(
                "numpy" if not device_like
                else "pallas-fused" if _mxu_available()
                else "u64-jnp"
            ),
        )
        return proof

    # ------------------------------------------------------------------
    # verifier
    # ------------------------------------------------------------------

    def verify(self, proof: bytes, proof_stream: Optional[ProofStream] = None) -> bool:
        self.last_rejection = None
        cfg = self.config
        fri = self.fri
        N = fri.domain.length
        proof_stream = self.codec.load_stream(proof)

        base_root = proof_stream.pull()
        challenges_h = sample_weights(11, proof_stream.verifier_fiat_shamir())
        ext_root = proof_stream.pull()

        terminals_h = [tuple(proof_stream.pull()) for _ in range(5)]

        base_degree_bounds = self._base_degree_bounds()
        ext_degree_bounds = self._ext_degree_bounds()

        num_base = sum(t.base_width for t in self.tables)
        num_ext = sum(t.num_ext_columns for t in self.tables)
        num_quot = sum(
            t.num_quotients(challenges_h, terminals_h) for t in self.tables
        )
        num_diff = len(self.permutation_arguments)

        weights_h = sample_weights(
            1 + 2 * num_base + 2 * num_ext + 2 * num_quot + 2 * num_diff,
            proof_stream.verifier_fiat_shamir(),
        )

        combination_root = proof_stream.pull()

        indices = sample_indices_stark(
            cfg.security_level, proof_stream.verifier_fiat_shamir(), N
        )

        unit_distances = [t.unit_distance(N) for t in self.tables]
        unit_distances = list(set(unit_distances))

        # -- pull & check salted openings (ref :421-440) --------------------
        tuples: Dict[int, list] = {}
        for index in indices:
            for distance in [0] + unit_distances:
                idx = (index + distance) % N
                element = proof_stream.pull()
                salt, path = proof_stream.pull()
                if not SaltedMerkle.verify(
                    base_root, idx, path,
                    self.codec.salted_payload(element, salt),
                ):
                    return reject(
                        self,
                        f"base codeword opening at index {idx} fails its "
                        f"salted-Merkle path",
                    )
                row = [tuple(element[0])] + [int(e) for e in element[1:]]
                tuples[idx] = row

                element = proof_stream.pull()
                salt, path = proof_stream.pull()
                if not SaltedMerkle.verify(
                    ext_root, idx, path,
                    self.codec.salted_payload(element, salt),
                ):
                    return reject(
                        self,
                        f"extension codeword opening at index {idx} fails "
                        f"its salted-Merkle path",
                    )
                tuples[idx] = tuples[idx] + [tuple(e) for e in element]

        # -- recompute the combination, vectorized over all indices ---------
        # (ref :445-569 does this per index with symbolic evaluation; here
        # one lane per query index runs through the same array-interpreted
        # constraint builders — O(constraints) vectorized ops total, flat in
        # the security level)
        K = len(indices)
        alg = ArrayAlgebra(np)
        ch_vals = [alg.x(np.asarray(c, dtype=U64)) for c in challenges_h]
        tm_vals = [alg.x(np.asarray(t_, dtype=U64)) for t_ in terminals_h]
        xs = np.asarray([fri.domain(i) for i in indices], dtype=U64)  # (K,)
        one = np.asarray(1, dtype=U64)

        rand_arr = np.asarray([tuples[i][0] for i in indices], dtype=U64)
        ext_offset = 1 + num_base

        def col_base(col, idx_list):
            return np.asarray([tuples[i][1 + col] for i in idx_list], dtype=U64)

        def col_ext(col, idx_list):
            return np.asarray(
                [tuples[i][ext_offset + col] for i in idx_list], dtype=U64
            )

        widx = 0
        inner = np.zeros((K, 3), dtype=U64)

        def add_term(arr):
            """arr: (K,) base or (K, 3) extension."""
            nonlocal widx, inner
            w = np.asarray(weights_h[widx], dtype=U64)
            widx += 1
            wb = np.broadcast_to(w[None, :], (K, 3))
            if arr.ndim == 1:
                inner = xf.add(inner, xf.mul_base(wb, arr, np), np)
            else:
                inner = xf.add(inner, xf.mul(wb, arr, np), np)

        def shifted(arr, bound):
            ps = f.pow_const(xs, self.max_degree - bound, np)
            if arr.ndim == 1:
                return f.mul(arr, ps, np)
            return xf.mul_base(arr, ps, np)

        add_term(rand_arr)
        for i in range(num_base):
            v = col_base(i, indices)
            add_term(v)
            add_term(shifted(v, base_degree_bounds[i]))
        for i in range(num_ext):
            v = col_ext(i, indices)
            add_term(v)
            add_term(shifted(v, ext_degree_bounds[i]))

        inv_xm1 = f.inverse(f.sub(xs, one, np), np)
        acc_base = 0
        acc_ext = 0
        points = []
        for t in self.tables:
            ud = t.unit_distance(N)
            nidx = [(i + ud) % N for i in indices]
            point = [alg.base(col_base(acc_base + j, indices)) for j in range(t.base_width)]
            point += [alg.x(col_ext(acc_ext + j, indices)) for j in range(t.num_ext_columns)]
            point_next = [alg.base(col_base(acc_base + j, nidx)) for j in range(t.base_width)]
            point_next += [alg.x(col_ext(acc_ext + j, nidx)) for j in range(t.num_ext_columns)]
            points.append(point)
            acc_base += t.base_width
            acc_ext += t.num_ext_columns

            o_inv = f.h_inverse(t.omicron) if t.height > 0 else 1
            x_minus_oinv = f.sub(xs, np.asarray(o_inv, dtype=U64), np)
            if t.height > 0:
                transition_zinv = f.mul(
                    x_minus_oinv,
                    f.inverse(f.sub(f.pow_const(xs, t.height, np), one, np), np),
                    np,
                )
            else:
                transition_zinv = np.zeros((K,), dtype=U64)
            zinv = {
                "boundary": inv_xm1,
                "transition": transition_zinv,
                "terminal": f.inverse(x_minus_oinv, np),
            }
            quotients = t.quotients(
                alg, point, point_next, ch_vals, tm_vals, zinv
            )
            bounds = t.all_quotient_degree_bounds(challenges_h, terminals_h)
            for q, bound in zip(quotients, bounds):
                add_term(q)
                add_term(shifted(q, bound))

        # permutation-argument difference quotients (ref :540-547)
        col_in_point = {(0, 7): 7, (0, 8): 8, (1, 3): 3, (2, 4): 4}
        for pa in self.permutation_arguments:
            lhs = points[pa.lhs[0]][col_in_point[pa.lhs]].arr
            rhs = points[pa.rhs[0]][col_in_point[pa.rhs]].arr
            q = xf.mul_base(xf.sub(lhs, rhs, np), inv_xm1, np)
            add_term(q)
            add_term(shifted(q, pa.quotient_degree_bound()))

        assert widx == len(weights_h), (
            f"term count {widx} != weight count {len(weights_h)}"
        )

        for k, index in enumerate(indices):
            combination_leaf = proof_stream.pull()
            combination_path = proof_stream.pull()
            if not Merkle.verify(
                combination_root, index, combination_path,
                self.codec.leaf_payload(combination_leaf),
            ):
                return reject(
                    self,
                    f"combination codeword opening at index {index} fails "
                    f"its Merkle path",
                )
            if tuple(combination_leaf) != tuple(int(v) for v in inner[k]):
                return reject(
                    self,
                    f"combination leaf at index {index} does not equal the "
                    f"recomputed weighted sum of trace/quotient terms",
                )

        # -- FRI (ref :572) --------------------------------------------------
        if not self.fri.verify(proof_stream, combination_root):
            return reject(
                self, f"FRI low-degree test failed: {self.fri.last_rejection}"
            )

        # -- evaluation arguments against public data (ref :575-577) --------
        if terminals_h[2] != evaluation_terminal(
            [ord(c) for c in self.input_symbols], challenges_h[8]
        ):
            return reject(
                self,
                "input evaluation terminal does not match the public input",
            )
        if terminals_h[3] != evaluation_terminal(
            [ord(c) for c in self.output_symbols], challenges_h[9]
        ):
            return reject(
                self,
                "output evaluation terminal does not match the public output",
            )
        if terminals_h[4] != program_evaluation_terminal(
            self.program,
            challenges_h[0], challenges_h[1], challenges_h[2], challenges_h[10],
        ):
            return reject(
                self,
                "program evaluation terminal does not match the public "
                "program",
            )

        return True


# ---------------------------------------------------------------------------


def _salted_payload_buffer(rows: np.ndarray, salt_buf: bytes):
    """(N, k) u64 rows + packed salts -> one contiguous payload buffer of
    per-leaf (8k + 24)-byte payloads (native-codec salted leaves)."""
    n, k = rows.shape
    row_u8 = np.ascontiguousarray(rows.astype("<u8")).view(np.uint8).reshape(
        n, 8 * k
    )
    salts_u8 = np.frombuffer(salt_buf, dtype=np.uint8).reshape(n, 24)
    return (
        np.concatenate([row_u8, salts_u8], axis=1).tobytes(),
        8 * k + 24,
    )


def _rows_to_leaf_bytes(rows: np.ndarray) -> List[bytes]:
    """(N, k) u64 -> N little-endian byte strings of length 8k."""
    data = np.ascontiguousarray(rows.astype("<u8"))
    raw = data.tobytes()
    k = rows.shape[1] * 8
    return [raw[i * k : (i + 1) * k] for i in range(rows.shape[0])]


def _row_to_leaf_object(row: np.ndarray, widths: List[int]):
    """Rebuild the tuple-structured leaf object ((c0,c1,c2) or int per
    column) from a flat u64 row."""
    out = []
    pos = 0
    for w in widths:
        if w == 1:
            out.append(int(row[pos]))
        else:
            out.append(tuple(int(v) for v in row[pos : pos + w]))
        pos += w
    return tuple(out)
