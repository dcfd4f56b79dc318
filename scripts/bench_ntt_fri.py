"""BASELINE config 3: standalone 2^18-point NTT+FRI benchmark on device.

Measures, on the real TPU:
  - a batched extension-field coset LDE (3 limb rows, degree 2^16 -> 2^18
    domain, expansion 4) through the production NTT path (u64 butterfly /
    int8 MXU, whichever `ntt_backend` resolves to),
  - a full FRI prove (device folds + per-round device Merkle trees) and
    host verify over the resulting codeword.

Writes NTTFRI_r03.json and prints one JSON line. Usage:
  python scripts/bench_ntt_fri.py [log2_domain=18]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sync(out):
    import jax

    leaves = [
        l.ravel()[:1] for l in jax.tree_util.tree_leaves(out)
        if hasattr(l, "ravel")
    ]
    jax.device_get(leaves)


def main():
    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from stark_brainfuck_tpu.ops import field as f
    from stark_brainfuck_tpu.ops import ntt as nt
    from stark_brainfuck_tpu.protocol.channel import NativeCodec
    from stark_brainfuck_tpu.protocol.fri import Fri

    N = 1 << log2_n
    expansion = 4
    d = N // expansion  # polynomial degree bound
    omega = f.primitive_nth_root(N)
    offset = f.GENERATOR

    rng = np.random.default_rng(0)
    # 48 limb rows ~ the prover's committed-row batch (3 randomizer limbs
    # + 19 base columns + 27 extension limb rows) — one RTT amortized over
    # a production-shaped NTT batch
    rows = int(os.environ.get("NTTFRI_ROWS", "48"))
    coeffs = rng.integers(0, f.P, (rows, d), dtype=np.uint64)
    coeffs_dev = jax.device_put(coeffs)
    sync(coeffs_dev)

    # --- LDE: scale + zero-pad + forward N-point NTT (production path;
    # NTTFRI_MXU=1 routes through the int8-limb MXU Pallas kernel) ---
    use_mxu = bool(os.environ.get("NTTFRI_MXU"))
    scale = nt.scale_table(offset, d, jnp)
    if use_mxu:
        from stark_brainfuck_tpu.ops.pallas_ntt import (
            make_pallas_plan, ntt_pallas, plan_leaves, plan_rebind,
        )

        template = make_pallas_plan(N, omega, False, jnp)
        leaves = plan_leaves(template)

        def lde(c, lv):
            scaled = f.mul(c, scale, jnp)
            padded = jnp.concatenate(
                [scaled, jnp.zeros((rows, N - d), dtype=jnp.uint64)],
                axis=-1,
            )
            return ntt_pallas(padded, plan_rebind(template, lv))
    else:
        pack = nt.make_pack(N, omega, False, jnp)
        leaves = None

        def lde(c, lv):
            scaled = f.mul(c, scale, jnp)
            padded = jnp.concatenate(
                [scaled, jnp.zeros((rows, N - d), dtype=jnp.uint64)],
                axis=-1,
            )
            return nt.ntt_with(padded, pack, jnp)

    lde_j = jax.jit(lde)
    t0 = time.perf_counter()
    cw = lde_j(coeffs_dev, leaves)
    sync(cw)
    warm_lde = time.perf_counter() - t0
    reps = 5
    best_lde = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        cw = lde_j(coeffs_dev, leaves)
        sync(cw)
        best_lde = min(best_lde, time.perf_counter() - t0)
    butterflies = rows * (N // 2) * log2_n

    # --- FRI prove/verify over the codeword (3 of the limb rows) ---
    codeword = jnp.moveaxis(cw[:3], 0, -1)  # (N, 3)
    fri = Fri(offset, omega, N, expansion, 1, codec=NativeCodec())

    from stark_brainfuck_tpu.protocol.device_merkle import DeviceMerkle

    def fri_once():
        stream = fri.codec.make_stream()
        t0 = time.perf_counter()
        # the caller (the STARK) owns the round-0 commitment; mirror that
        tree0 = DeviceMerkle(codeword, jnp)
        stream.push(tree0.root())
        fri.prove(codeword, stream, xp=jnp, tree0=tree0)
        dt = time.perf_counter() - t0
        return dt, stream.serialize()

    warm_fri, proof = fri_once()
    # verify (host)
    t0 = time.perf_counter()
    stream = fri.codec.load_stream(proof)
    root = stream.pull()
    ok = fri.verify(stream, root)
    verify_s = time.perf_counter() - t0
    assert ok, f"FRI proof rejected: {fri.last_rejection}"

    best_fri = 1e9
    for _ in range(2):
        dt, _ = fri_once()
        best_fri = min(best_fri, dt)

    # fold throughput: sum over rounds of codeword length (elements folded)
    folded = sum(N >> r for r in range(fri.num_rounds()))
    out = {
        "metric": f"ntt_fri_standalone_2e{log2_n}"
        + ("_mxu" if use_mxu else ""),
        "value": round(butterflies / best_lde / 1e6, 1),
        "unit": "M butterflies/s",
        "detail": {
            "domain": N,
            "degree_bound": d,
            "lde_rows": rows,
            "lde_s": round(best_lde, 4),
            "lde_warm_s": round(warm_lde, 2),
            "butterflies": butterflies,
            "butterflies_per_s": round(butterflies / best_lde),
            "fri_prove_s": round(best_fri, 4),
            "fri_warm_s": round(warm_fri, 2),
            "fri_rounds": fri.num_rounds(),
            "fold_elements_per_s": round(folded / best_fri),
            "fri_verify_s": round(verify_s, 4),
            "proof_bytes": len(proof),
            "platform": jax.default_backend(),
        },
    }
    with open(os.path.join(REPO, "NTTFRI_r03.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
