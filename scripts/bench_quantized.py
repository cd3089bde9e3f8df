"""Quantized-serving sweep: int8 (dynamic + static-calibrated) vs bf16/fp32.

The int8 path (models/quantized.py) accelerates the 1x1 MXU matmuls
(bottleneck, per-block proj/res, mask head). At U16/512 those are ~60% of
FLOPs; this script measures where the balance flips as `in_channels`/
`enc_num_basis` grow and the matmuls dominate, and compares the dynamic
per-matmul absmax pass against static calibrated activation scales
(`calibrate_improved_scales`, round-3 VERDICT item 5).

Usage:
    python scripts/bench_quantized.py [--config u16_512|u36_2048|u36_wide]
        [--bs 4 8] [--families proj res ...] [--attribute]

--families: quantize only those matmul families (mixed int8/bf16 configs
for wide models where one family dominates the int8 error; VERDICT item
10). --attribute: additionally print one fidelity row per single-family
quantization, locating which family costs the dB.

Prints one JSON line per (config, bs, path) row with ms/batch, au-s/s and
fidelity vs the fp32 fma output.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = {
    "u16_512": dict(out_channels=256, in_channels=512, num_blocks=16,
                    upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
                    num_sources=2),
    # the zoo's published-shape U36/2048 (23.1M params, BENCHMARKS.md)
    "u36_2048": dict(out_channels=512, in_channels=512, num_blocks=36,
                     upsampling_depth=5, enc_kernel_size=21,
                     enc_num_basis=2048, num_sources=2),
    # 4x-wider blocks (69M params): the matmul-dominated regime
    "u36_wide": dict(out_channels=512, in_channels=2048, num_blocks=36,
                     upsampling_depth=5, enc_kernel_size=21,
                     enc_num_basis=2048, num_sources=2),
}
SECONDS, SR = 4.0, 8000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="u36_2048", choices=sorted(CONFIGS))
    ap.add_argument("--bs", type=int, nargs="+", default=[4])
    ap.add_argument("--n_hi", type=int, default=21)
    ap.add_argument("--families", nargs="+", default=None,
                    help="matmul families to quantize (default: all)")
    ap.add_argument("--attribute", action="store_true",
                    help="per-family fidelity attribution rows (no timing)")
    args = ap.parse_args()

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.models.fast_inference import improved_forward_fast
    from sudo_rm_rf_tpu.models.quantized import (
        ALL_FAMILIES, calibrate_improved_scales, fidelity_db,
        improved_forward_int8, quantize_improved_params,
    )
    from sudo_rm_rf_tpu.utils.benchmark import timed_loop

    hp = CONFIGS[args.config]
    t = int(SECONDS * SR)
    families = tuple(args.families) if args.families else ALL_FAMILIES
    model = models.SuDORMRFImproved(**hp)
    x1 = jax.random.normal(jax.random.key(1), (1, 1, t), jnp.float32)
    params = model.init(jax.random.key(0), x1)["params"]
    pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    qp = quantize_improved_params(params, families=families)
    fwd_kw = dict(num_blocks=hp["num_blocks"], upsampling_depth=5,
                  enc_kernel_size=21, num_sources=2)

    ref1 = np.asarray(improved_forward_fast(params, x1, impl="fma", **fwd_kw))
    fid_bf = fidelity_db(ref1, np.asarray(
        model.apply({"params": pbf}, x1.astype(jnp.bfloat16))))
    fid_q = fidelity_db(ref1, np.asarray(improved_forward_int8(qp, x1)))
    # calibrate on a DIFFERENT batch than the fidelity probe (held-out
    # scales are the honest configuration users would run)
    calib = jax.random.normal(jax.random.key(7), (4, 1, t), jnp.float32)
    scales = calibrate_improved_scales(qp, calib)
    fid_qs = fidelity_db(
        ref1, np.asarray(improved_forward_int8(qp, x1, scales=scales)))

    if args.attribute:
        for fam in ALL_FAMILIES:
            qf = quantize_improved_params(params, families=(fam,))
            fid = fidelity_db(ref1, np.asarray(improved_forward_int8(qf, x1)))
            print(json.dumps({
                "config": args.config, "attribute_family": fam,
                "fidelity_db_vs_fp32": round(fid, 1),
            }), flush=True)

    for bs in args.bs:
        x = jax.random.normal(jax.random.key(2), (bs, 1, t), jnp.float32)
        xb = x.astype(jnp.bfloat16)
        rows = {
            "fp32_fma": (lambda p, c: improved_forward_fast(
                p, c, impl="fma", **fwd_kw), params, x, None),
            "bf16_conv": (lambda p, c: model.apply({"params": p}, c).astype(
                jnp.bfloat16), pbf, xb, fid_bf),
            "int8": (lambda p, c: improved_forward_int8(p, c), qp, x, fid_q),
            "int8_static": (lambda p, c: improved_forward_int8(
                p, c, scales=scales), qp, x, fid_qs),
        }
        for name, (fwd, p0, inp, fid) in rows.items():
            # params ride in the loop carry (passed as device buffers); a
            # closure would inline the 23M U36 params as HLO constants and
            # blow the relay's compile-request size limit (HTTP 413)
            def step(carry, fwd=fwd):
                p, c = carry
                y = fwd(p, c)
                return p, (jnp.sum(y, axis=1, keepdims=True) * 0.1).astype(
                    c.dtype) + c * 0.9

            secs = timed_loop(step, (p0, inp), n_hi=args.n_hi)
            row = {
                "config": args.config, "bs": bs, "path": name,
                "ms_per_batch": round(secs * 1e3, 2),
                "au_s_per_s": round(bs * SECONDS / secs, 1),
            }
            if families != ALL_FAMILIES:
                row["families"] = list(families)
            if fid is not None:
                row["fidelity_db_vs_fp32"] = round(fid, 1)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
