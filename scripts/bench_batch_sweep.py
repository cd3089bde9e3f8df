"""Serving batch-size sweep: find the throughput-optimal batch per path.

The v5e conv tiling sweet spot at U16/512 is sharp (bs6 18.5 ms / bs8
5.4 ms / bs12 18.9 ms, BENCHMARKS.md). This sweeps LARGER batches for the
bf16-conv apply path, the fma fast path, and static-int8 to check whether
any bigger batch amortizes better than bs8 (serving pipelines can batch
as deep as latency budgets allow).

Usage:
    python scripts/bench_batch_sweep.py [--bs 8 16 24 32 48 64]
        [--paths bf16_conv fma_bf16 int8_static] [--n_hi 21]

The default sweep covers the three gated serving candidates (bf16 conv
apply, fma with compute_dtype='bfloat16', static int8); pass
``--paths fma_fp32 ...`` to also sweep the fp32-exact fma path.
Prints one JSON line per (path, bs) row.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

SECONDS, SR = 4.0, 8000
HP = dict(out_channels=256, in_channels=512, num_blocks=16,
          upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
          num_sources=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+",
                    default=[8, 16, 24, 32, 48, 64])
    ap.add_argument("--paths", nargs="+",
                    default=["bf16_conv", "fma_bf16", "int8_static"])
    ap.add_argument("--n_hi", type=int, default=21)
    args = ap.parse_args()

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.models.fast_inference import improved_forward_fast
    from sudo_rm_rf_tpu.models.quantized import (
        calibrate_improved_scales, improved_forward_int8,
        quantize_improved_params,
    )
    from sudo_rm_rf_tpu.utils.benchmark import timed_loop

    t = int(SECONDS * SR)
    model = models.SuDORMRFImproved(**HP)
    x4 = jax.random.normal(jax.random.key(1), (4, 1, t), jnp.float32)
    params = model.init(jax.random.key(0), x4)["params"]
    pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    qp = scales = None
    if "int8_static" in args.paths:
        qp = quantize_improved_params(params)
        scales = calibrate_improved_scales(qp, x4)

    for bs in args.bs:
        for path in args.paths:
            if path == "bf16_conv":
                x = jax.random.normal(jax.random.key(2), (bs, 1, t),
                                      jnp.bfloat16)

                def step(c):
                    y = model.apply({"params": pbf}, c)
                    return (jnp.sum(y, axis=1, keepdims=True)
                            .astype(c.dtype) * 0.1 + c * 0.9)
            elif path in ("fma_fp32", "fma_bf16"):
                # fma_bf16 uses the fidelity-gated serving recipe exactly
                # as documented in BENCHMARKS.md: compute_dtype='bfloat16'
                # (fp32 norm statistics), NOT an all-bf16 param cast.
                cdt = None if path == "fma_fp32" else "bfloat16"
                x = jax.random.normal(jax.random.key(2), (bs, 1, t),
                                      jnp.float32)

                def step(c, cdt=cdt):
                    y = improved_forward_fast(
                        params, c, impl="fma", compute_dtype=cdt
                    )
                    return (jnp.sum(y, axis=1, keepdims=True)
                            .astype(c.dtype) * 0.1 + c * 0.9)
            elif path == "int8_static":
                x = jax.random.normal(jax.random.key(2), (bs, 1, t),
                                      jnp.float32)

                def step(c):
                    y = improved_forward_int8(qp, c, scales=scales)
                    return jnp.sum(y, axis=1, keepdims=True) * 0.1 + c * 0.9
            else:
                raise ValueError(path)

            secs = timed_loop(step, x, n_hi=args.n_hi)
            au = bs * SECONDS / secs
            print(json.dumps({
                "path": path, "bs": bs,
                "ms_batch": round(secs * 1e3, 2),
                "au_s_per_s": round(au, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
