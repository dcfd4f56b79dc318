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
    coeffs = rng.integers(0, f.P, (3, d), dtype=np.uint64)
    coeffs_dev = jax.device_put(coeffs)
    sync(coeffs_dev)

    # --- LDE: scale + zero-pad + forward N-point NTT (production path) ---
    pack = nt.make_pack(N, omega, False, jnp)
    scale = nt.scale_table(offset, d, jnp)

    def lde(c):
        scaled = f.mul(c, scale, jnp)
        padded = jnp.concatenate(
            [scaled, jnp.zeros((3, N - d), dtype=jnp.uint64)], axis=-1
        )
        return nt.ntt_with(padded, pack, jnp)

    lde_j = jax.jit(lde)
    t0 = time.perf_counter()
    cw = lde_j(coeffs_dev)
    sync(cw)
    warm_lde = time.perf_counter() - t0
    reps = 5
    best_lde = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        cw = lde_j(coeffs_dev)
        sync(cw)
        best_lde = min(best_lde, time.perf_counter() - t0)
    butterflies = 3 * (N // 2) * log2_n

    # --- FRI prove/verify over the codeword ---
    codeword = jnp.moveaxis(cw, 0, -1)  # (N, 3)
    fri = Fri(offset, omega, N, expansion, 1, codec=NativeCodec())

    def fri_once():
        stream = fri.codec.make_stream()
        t0 = time.perf_counter()
        fri.prove(codeword, stream, xp=jnp)
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
        "metric": f"ntt_fri_standalone_2e{log2_n}",
        "value": round(butterflies / best_lde / 1e6, 1),
        "unit": "M butterflies/s",
        "detail": {
            "domain": N,
            "degree_bound": d,
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
