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


def families_sweep(args):
    """Per-family int8 attribution for the GC R16/512 path (round-4 VERDICT
    next #3): GC int8 with ALL matmul families quantized measures 22-24 dB
    (below the 25 dB gate — error compounds over the 16 residual blocks), so
    find which family carries the damage, exactly like the u36_wide
    res-stays-bf16 attribution for the improved model (BENCHMARKS.md wide-
    config section). Prints (a) an 'only-F' and 'all-but-F' fidelity table
    over GC_ALL_FAMILIES, (b) a greedy gate search dropping the most
    damaging family until fidelity >= 25 dB, (c) timed rows for the gated
    recipe at each --bs."""
    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.models.quantized import (
        GC_ALL_FAMILIES, calibrate_gc_scales, groupcomm_forward_int8,
        quantize_gc_params,
    )
    from sudo_rm_rf_tpu.utils.benchmark import timed_loop

    t = int(SECONDS * SR)
    model = models.GroupCommSuDORMRF(**HP)
    x0 = jax.random.normal(jax.random.key(1), (4, 1, t), jnp.float32)
    params = model.init(jax.random.key(0), x0)["params"]
    x = jax.random.normal(jax.random.key(2), (4, 1, t), jnp.float32)
    want = np.asarray(model.apply({"params": params}, x))

    def fid_of(families):
        if not families:  # all-bf16 control
            from sudo_rm_rf_tpu.models.fast_inference import (
                groupcomm_forward_fast,
            )

            got = np.asarray(groupcomm_forward_fast(
                params, x, impl="fma_merged", compute_dtype="bfloat16",
                **FWD_KW)).astype(np.float32)
            return fidelity_db(want, got)
        qp = quantize_gc_params(params, families=tuple(families))
        sc = calibrate_gc_scales(qp, x0, **FWD_KW)
        got = np.asarray(
            groupcomm_forward_int8(qp, x, scales=sc, **FWD_KW)
        ).astype(np.float32)
        return fidelity_db(want, got)

    rows = {"bf16_control": round(fid_of(()), 1),
            "all_int8": round(fid_of(GC_ALL_FAMILIES), 1)}
    only, all_but = {}, {}
    for f in GC_ALL_FAMILIES:
        only[f] = round(fid_of((f,)), 1)
        all_but[f] = round(
            fid_of(tuple(g for g in GC_ALL_FAMILIES if g != f)), 1
        )
    print(json.dumps({"attribution_only_F_int8": only}), flush=True)
    print(json.dumps({"attribution_all_but_F_int8": all_but}), flush=True)

    # greedy gate search: repeatedly return the most damaging family
    # (lowest only-F fidelity) to bf16 until the 25 dB gate passes
    gate = 25.0
    active = sorted(GC_ALL_FAMILIES, key=lambda f: only[f])
    recipe = list(GC_ALL_FAMILIES)
    fid = rows["all_int8"]
    dropped = []
    while fid < gate and active:
        worst = active.pop(0)
        recipe.remove(worst)
        dropped.append(worst)
        fid = round(fid_of(tuple(recipe)), 1)
        print(json.dumps({"greedy_drop": worst, "recipe": recipe,
                          "fidelity_db": fid}), flush=True)
    result = {
        "bf16_control_db": rows["bf16_control"],
        "all_int8_db": rows["all_int8"],
        "gated_recipe": recipe if fid >= gate else None,
        "kept_bf16": dropped,
        "gated_fidelity_db": fid if fid >= gate else None,
        "gate_db": gate,
    }
    print(json.dumps(result), flush=True)

    if fid >= gate and recipe:
        qp = quantize_gc_params(params, families=tuple(recipe))
        sc = calibrate_gc_scales(qp, x0, **FWD_KW)
        for bs in args.bs:
            xb = jax.random.normal(jax.random.key(3), (bs, 1, t), jnp.float32)

            def step(c):
                y = groupcomm_forward_int8(qp, c, scales=sc, **FWD_KW)
                return (jnp.sum(y, axis=1, keepdims=True).astype(c.dtype)
                        * 0.1 + c * 0.9)

            secs = timed_loop(step, xb, n_hi=args.n_hi)
            print(json.dumps({
                "path": "int8_mixed_gated", "bs": bs,
                "families": recipe,
                "ms_batch": round(secs * 1e3, 2),
                "au_s_per_s": round(bs * SECONDS / secs, 1),
                "fidelity_db": fid,
            }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+", default=[4, 8])
    ap.add_argument("--n_hi", type=int, default=21)
    ap.add_argument("--families_sweep", action="store_true",
                    help="per-family int8 attribution + greedy 25 dB gate "
                         "search (round-4 VERDICT next #3)")
    args = ap.parse_args()
    if args.families_sweep:
        families_sweep(args)
        return

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
