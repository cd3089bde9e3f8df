"""Written roofline bounds for the serving rows (round-4 VERDICT weak #5).

Two floors per serving row, from XLA cost analysis (compile-only, no
timing — pass measured ms from BENCH_r*.json):

* compute floor  = flops / MXU peak — the HARD lower bound; recoverable_x
  = measured / compute floor is the most ANY rewrite at the same numerics
  could reclaim.
* logical-bytes "roofline" = bytes_accessed / HBM BW (v5e ~819 GB/s).
  Measured on this model it comes out LARGER than the measured time —
  bytes_accessed counts every op's logical operands pre-fusion, and XLA's
  fusion keeps most of that traffic in VMEM/registers. So it is NOT a
  valid floor; its ratio to measured time (`fused_traffic_max_x`) instead
  upper-bounds the post-fusion HBM traffic as a fraction of logical bytes,
  quantifying how much fusion XLA already performs.

Usage: python scripts/roofline_bound.py --measured_fp32_ms 7.5 \
           --measured_bf16_ms 5.34
"""

import argparse
import json

import jax
import jax.numpy as jnp

V5E_HBM_GBPS = 819.0  # published v5e HBM bandwidth

HP = dict(out_channels=256, in_channels=512, num_blocks=16,
          upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
          num_sources=2)
SECONDS, SR = 4.0, 8000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured_fp32_ms", type=float, default=7.5)
    ap.add_argument("--measured_bf16_ms", type=float, default=5.34)
    args = ap.parse_args()

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.models.fast_inference import improved_forward_fast
    from sudo_rm_rf_tpu.utils.benchmark import bytes_accessed_of, flops_of

    t = int(SECONDS * SR)
    model = models.SuDORMRFImproved(**HP)
    x4 = jax.random.normal(jax.random.key(1), (4, 1, t), jnp.float32)
    params = model.init(jax.random.key(0), x4)["params"]
    pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x8 = jax.random.normal(jax.random.key(2), (8, 1, t), jnp.bfloat16)

    peak = 197e12  # v5e bf16 MXU peak (fp32 multi-pass cost shows up as a
    # lower achievable fraction of this same peak, utils/benchmark.py note)
    rows = {}
    for name, fn, x, measured in (
        ("bs4_fp32_fma", lambda c: improved_forward_fast(params, c, impl="fma"),
         x4, args.measured_fp32_ms),
        ("bs8_bf16_conv", lambda c: model.apply({"params": pbf}, c),
         x8, args.measured_bf16_ms),
    ):
        by = bytes_accessed_of(fn, x)
        fl = flops_of(fn, x)
        if by is None or fl is None:
            raise SystemExit(
                f"{name}: XLA cost analysis unavailable on this backend "
                "(bytes/flops returned None) — run on a backend whose "
                "compiled executable exposes cost_analysis()"
            )
        logical_ms = by / (V5E_HBM_GBPS * 1e9) * 1e3
        compute_ms = fl / peak * 1e3
        rows[name] = {
            "flops_g": round(fl / 1e9, 1),
            "compute_floor_ms": round(compute_ms, 2),
            "measured_ms": measured,
            "recoverable_x_max": round(measured / compute_ms, 2),
            "logical_bytes_gb": round(by / 1e9, 3),
            "logical_roofline_ms": round(logical_ms, 2),
            "fused_traffic_max_x": round(measured / logical_ms, 2),
        }
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
