"""GroupComm serving sweep: every GC forward path on one chip window.

Covers the round-3 VERDICT weak #4 / next #6-7 rows in one run:
  * fp32-exact paths — flax apply, fma_merged, and the group-batched
    block-diagonal 'fma_bd' (every shared per-group 1x1 as ONE
    full-contraction MXU dot; target >= 2x the round-3 7.33 ms bs4)
  * bf16 variants of the same (fp32 norm statistics), fidelity-reported
  * int8 — dynamic and static-calibrated scales
    (`models/quantized.py::groupcomm_forward_int8`), fidelity-gated

Config: the published GroupComm U16/512 0.51M operating point
(`/root/reference/README.md:122`). Prints one JSON line per (path, bs) row
with ms/batch, au-s/s and fidelity vs the fp32 flax apply.

Usage: python scripts/bench_gc_serving.py [--bs 4 8] [--n_hi 21]
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
          num_sources=2, group_size=16)
FWD_KW = dict(num_blocks=16, upsampling_depth=5, enc_kernel_size=21,
              num_sources=2, group_size=16)


def fidelity_db(want: np.ndarray, got: np.ndarray) -> float:
    err = ((want - got) ** 2).sum()
    if err == 0.0:  # self-comparison (the reference path itself)
        return 999.0
    return float(10 * np.log10((want**2).sum() / err))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+", default=[4, 8])
    ap.add_argument("--n_hi", type=int, default=21)
    args = ap.parse_args()

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.models.fast_inference import groupcomm_forward_fast
    from sudo_rm_rf_tpu.models.quantized import (
        calibrate_gc_scales, groupcomm_forward_int8, quantize_gc_params,
    )
    from sudo_rm_rf_tpu.utils.benchmark import timed_loop

    t = int(SECONDS * SR)
    model = models.GroupCommSuDORMRF(**HP)
    x0 = jax.random.normal(jax.random.key(1), (4, 1, t), jnp.float32)
    params = model.init(jax.random.key(0), x0)["params"]
    qp = quantize_gc_params(params)
    scales = calibrate_gc_scales(qp, x0, **FWD_KW)

    for bs in args.bs:
        x = jax.random.normal(jax.random.key(2), (bs, 1, t), jnp.float32)
        want = np.asarray(model.apply({"params": params}, x))

        paths = {
            "flax_apply_fp32": lambda c: model.apply({"params": params}, c),
            "fma_merged_fp32": lambda c: groupcomm_forward_fast(
                params, c, impl="fma_merged", **FWD_KW),
            "fma_bd_fp32": lambda c: groupcomm_forward_fast(
                params, c, impl="fma_bd", **FWD_KW),
            "fma_merged_bf16": lambda c: groupcomm_forward_fast(
                params, c, impl="fma_merged", compute_dtype="bfloat16",
                **FWD_KW),
            "fma_bd_bf16": lambda c: groupcomm_forward_fast(
                params, c, impl="fma_bd", compute_dtype="bfloat16", **FWD_KW),
            "int8_dynamic": lambda c: groupcomm_forward_int8(
                qp, c, **FWD_KW),
            "int8_static": lambda c: groupcomm_forward_int8(
                qp, c, scales=scales, **FWD_KW),
        }
        for name, fwd in paths.items():
            def step(c, fwd=fwd):
                y = fwd(c)
                return (jnp.sum(y, axis=1, keepdims=True).astype(c.dtype)
                        * 0.1 + c * 0.9)

            got = np.asarray(fwd(x)).astype(np.float32)
            try:
                secs = timed_loop(step, x, n_hi=args.n_hi)
            except Exception as e:
                print(json.dumps({"path": name, "bs": bs,
                                  "error": repr(e)[:160]}), flush=True)
                continue
            print(json.dumps({
                "path": name, "bs": bs,
                "ms_batch": round(secs * 1e3, 2),
                "au_s_per_s": round(bs * SECONDS / secs, 1),
                "fidelity_db": round(fidelity_db(want, got), 1),
            }), flush=True)


if __name__ == "__main__":
    main()
