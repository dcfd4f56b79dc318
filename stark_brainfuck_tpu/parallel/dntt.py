"""Distributed four-step NTT over a device mesh (shard_map + all_to_all).

The only prover kernel with nontrivial communication structure (SURVEY §5):
a size-N NTT factored as N = R·C —

  1. local DFT_R along the replicated row axis (root ω^C),
  2. twiddle multiply by ω^{c·k1} (column-sharded table),
  3. all_to_all transpose (butterfly-stage group exchange),
  4. local DFT_C (root ω^R),
  5. transpose + all_to_all back to natural-order contiguous shards.

Index math: with input x[j], j = r·C + c laid out as an (R, C) matrix with
columns sharded across the mesh, the output satisfies
    X[k1 + R·k2] = Σ_c ω^{c·k1} (ω^R)^{c·k2} · [DFT_R(x[:, c])](k1),
so after step 4 the natural-order output is the (C, R) row-major flatten,
row-sharded — each device ends with one contiguous block of the codeword.

Everything is u64 field arithmetic from ops/field; the local DFTs reuse the
single-device butterfly network (ops/ntt.ntt_with).
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..ops import field as f
from ..ops import ntt as nt

U64 = np.uint64


def _factor(n: int):
    """Split n = R·C with R, C as close as possible (both powers of two)."""
    logn = n.bit_length() - 1
    log_r = logn // 2
    return 1 << log_r, 1 << (logn - log_r)


def make_dntt_tables(n: int, root: int, xp):
    """Host-precomputed tables: row/column NTT packs + the (R, C) twiddle
    matrix T[k1, c] = root^(c·k1). The factors R, C are NOT returned as
    ints — the tuple is passed through jit as a runtime-arg pytree, where
    int leaves would become traced scalars and break the shape/bool logic
    downstream; callers read them from T.shape (static under trace)."""
    R, C = _factor(n)
    root_r = f.h_pow(root, C)  # primitive R-th root
    root_c = f.h_pow(root, R)  # primitive C-th root
    pack_r = nt.make_pack(R, root_r, False, xp)
    pack_c = nt.make_pack(C, root_c, False, xp)
    # T[k1, c] = root^(c·k1): row k1 is the stride-k1 subsampling of powers
    pw = f.powers(root, n, np)  # length N table of root^i
    k1 = np.arange(R, dtype=np.int64)[:, None]
    c = np.arange(C, dtype=np.int64)[None, :]
    T = pw[(k1 * c) % n]
    return pack_r, pack_c, xp.asarray(T)


def distributed_ntt_with(values, tables, mesh, axis: str = "shard"):
    """NTT of u64 rows (B, N) across `mesh` (1-D) with PREBUILT tables
    (pass them as runtime args through any enclosing jit — building them
    at trace time embeds N-sized constants). Returns (B, N) natural order.
    C and R must each be divisible by the device count."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    B, N = values.shape
    D = mesh.devices.size
    pack_r, pack_c, T = tables
    R, C = int(T.shape[0]), int(T.shape[1])
    assert C % D == 0 and R % D == 0, (
        f"mesh size {D} must divide both NTT factors {R}x{C}"
    )

    def kernel(x_local, t_local):
        # x_local: (B, R, C/D) — global columns sharded
        # 1. DFT over rows (replicated axis): move R last
        y = jnp.swapaxes(x_local, 1, 2)  # (B, Cl, R)
        y = nt.ntt_with(y, pack_r, jnp)
        # 2. twiddle: t_local (R, Cl) -> (Cl, R)
        y = f.mul(y, jnp.swapaxes(t_local, 0, 1)[None], jnp)
        # 3. global transpose: (B, Cl, R) -> (B, C, R/D)
        y = jax.lax.all_to_all(y, axis, split_axis=2, concat_axis=1, tiled=True)
        # 4. DFT over columns: move C last
        y = jnp.swapaxes(y, 1, 2)  # (B, Rl, C)
        y = nt.ntt_with(y, pack_c, jnp)
        # 5. back to natural order: (B, Rl, C) -> (B, Cl, R), flatten
        y = jnp.swapaxes(y, 1, 2)  # (B, C, Rl)
        y = jax.lax.all_to_all(y, axis, split_axis=1, concat_axis=2, tiled=True)
        return y.reshape(B, (C // D) * R)

    x = values.reshape(B, R, C)
    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis)),
        out_specs=P(None, axis),
    )
    out = fn(x, T)
    return out.reshape(B, N)


def distributed_ntt(values, root: int, mesh, axis: str = "shard"):
    """Convenience wrapper building the tables inline (tests / eager use)."""
    import jax.numpy as jnp

    tables = make_dntt_tables(values.shape[1], root, jnp)
    return distributed_ntt_with(values, tables, mesh, axis)


def distributed_coset_evaluate(coeffs, offset: int, root: int, length: int,
                               mesh, axis: str = "shard"):
    """Sharded coset LDE evaluate: scale by offset powers, zero-pad, dNTT."""
    import jax.numpy as jnp

    B, d = coeffs.shape
    scale = nt.scale_table(offset, d, jnp)
    scaled = f.mul(coeffs, scale, jnp)
    if d < length:
        pad = jnp.zeros((B, length - d), dtype=jnp.uint64)
        scaled = jnp.concatenate([scaled, pad], axis=-1)
    return distributed_ntt(scaled, root, mesh, axis)
