"""Headline benchmark: real-time separation factor on one TPU chip.

Improved SuDoRM-RF U16/Bases512 on 4 s @ 8 kHz mixtures (the BASELINE.md
headline row: 53.3 ex/s fwd GPU bs4 on a 2080 Ti == 213.2 audio-sec/sec).

Three rows are measured (VERDICT round-1 item 3 + roadmap quantized item):
  * conservative: bs4, fp32, FMA serving path (models/fast_inference.py) —
    numerics match the flax model to ~1e-6 (parity-tested);
  * max-throughput: the fastest measured (batch, dtype, impl) config —
    bs8 full-bf16 plain-conv apply, a sharp v5e tiling sweet spot — gated
    on bf16-vs-fp32 output fidelity >= FIDELITY_GATE_DB. If the gate fails
    the conservative row becomes the headline.
  * int8: bs8 quantized serving (models/quantized.py — int8 MXU matmuls,
    bf16 elsewhere), gated on its own fidelity >= INT8_GATE_DB; becomes
    the headline only if gated AND faster than the bf16 row.

Prints ONE JSON line; `value` is the gated max-throughput figure.

Timing methodology: the axon relay makes block_until_ready unreliable
(returns before execution) and bulk device_get extremely slow, so we run
n data-dependent forwards inside ONE jitted fori_loop (runtime n, single
compile) ending in a scalar readback, and difference two n values to
cancel the fixed dispatch/readback overhead (utils/benchmark.timed_loop).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_AU_S = 213.2  # 2080 Ti fwd bs4 (BASELINE.md derived)
FIDELITY_GATE_DB = 35.0
INT8_GATE_DB = 25.0  # int8 weight+activation physics; ~2x the SI-SDR range
SECONDS = 4.0
SR = 8000


def main():
    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.models.fast_inference import improved_forward_fast
    from sudo_rm_rf_tpu.utils.benchmark import timed_loop

    t = int(SECONDS * SR)
    hp = dict(out_channels=256, in_channels=512, num_blocks=16,
              upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
              num_sources=2)
    model = models.SuDORMRFImproved(**hp)
    x4 = jax.random.normal(jax.random.key(1), (4, 1, t), jnp.float32)
    params = model.init(jax.random.key(0), x4)["params"]

    # fidelity of the bf16 serving output vs the fp32 FMA path (same input)
    ref = np.asarray(improved_forward_fast(params, x4, impl="fma"))
    pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    bf = np.asarray(
        model.apply({"params": pbf}, x4.astype(jnp.bfloat16))
    ).astype(np.float32)
    fidelity_db = float(10 * np.log10((ref**2).sum() / ((ref - bf) ** 2).sum()))

    # conservative row: bs4 fp32 FMA
    def step_cons(c):
        y = improved_forward_fast(params, c, impl="fma")
        return jnp.sum(y, axis=1, keepdims=True) * 0.1 + x4 * 0.9

    cons_secs = timed_loop(step_cons, x4, n_hi=51)
    cons_au = 4 * SECONDS / cons_secs

    # max-throughput row: bs8 full-bf16 plain-conv apply
    x8 = jax.random.normal(jax.random.key(2), (8, 1, t), jnp.bfloat16)

    def step_max(c):
        y = model.apply({"params": pbf}, c)
        return jnp.sum(y, axis=1, keepdims=True).astype(c.dtype) * 0.1 + c * 0.9

    max_secs = timed_loop(step_max, x8, n_hi=51)
    max_au = 8 * SECONDS / max_secs

    # int8 row: quantized MXU matmuls with STATIC calibrated activation
    # scales (models/quantized.py) — measured faster than both dynamic int8
    # and bf16 at bs8 (BENCHMARKS.md batch sweep); calibration runs on a
    # held-out batch, fidelity is probed on the x4 batch, own gate.
    from sudo_rm_rf_tpu.models.quantized import (
        calibrate_improved_scales, improved_forward_int8,
        quantize_improved_params,
    )

    qp = quantize_improved_params(params)
    calib = jax.random.normal(jax.random.key(7), (4, 1, t), jnp.float32)
    scales = calibrate_improved_scales(qp, calib)
    q4 = np.asarray(
        improved_forward_int8(qp, x4, scales=scales)
    ).astype(np.float32)
    int8_fid = float(10 * np.log10((ref**2).sum() / ((ref - q4) ** 2).sum()))
    x8f = jax.random.normal(jax.random.key(3), (8, 1, t), jnp.float32)

    def step_int8(c):
        y = improved_forward_int8(qp, c, scales=scales)
        return jnp.sum(y, axis=1, keepdims=True) * 0.1 + c * 0.9

    int8_secs = timed_loop(step_int8, x8f, n_hi=51)
    int8_au = 8 * SECONDS / int8_secs

    # Training row (VERDICT r4 weak #1/#2): auto-tuned (block_impl, batch)
    # at bf16 through the REAL Trainer step (augment + PIT loss + grads +
    # clip + Adam) so a training regression can't hide behind a good
    # serving number. The tuner must find a row at least as good as the
    # known bs8/bf16/conv sweet spot because that row is in its sweep.
    from sudo_rm_rf_tpu.train import Trainer, TrainerConfig
    from sudo_rm_rf_tpu.train.autotune import autotune_train_config

    tuned = autotune_train_config(
        hp, batch_sizes=(4, 8, 16), compute_dtype="bfloat16",
        model_type="relu",
    )
    tuned_row = next(
        r for r in tuned.rows
        if r.impl == tuned.impl and r.batch_size == tuned.batch_size
    )
    train_secs = tuned_row.ms_per_step / 1e3
    train_au = tuned_row.audio_sec_per_sec

    # train-step FLOPs (fwd+bwd+opt) for training MFU
    tr_model = models.SuDORMRFImproved(**hp, block_impl=tuned.impl)
    tr = Trainer(
        tr_model,
        TrainerConfig(learning_rate=1e-3, compute_dtype="bfloat16"),
    )
    tr_batch = jax.random.normal(
        jax.random.key(11), (tuned.batch_size, 2, t), jnp.float32
    )
    tr_state = tr.init_state(
        jax.random.key(10), jnp.zeros((tuned.batch_size, 1, t))
    )

    # MFU accounting (VERDICT r3 item 3): XLA cost-analysis FLOPs of each
    # candidate's forward over measured time over the chip's peak
    from sudo_rm_rf_tpu.utils.benchmark import flops_of, mfu_pct

    fl_train = flops_of(
        lambda s, b, k: tr._train_step_impl(s, b, k),
        tr_state, tr_batch, jax.random.key(12),
    )
    train_mfu = mfu_pct(fl_train, train_secs, "bfloat16")

    fl_cons = flops_of(lambda c: improved_forward_fast(params, c, impl="fma"), x4)
    fl_max = flops_of(lambda c: model.apply({"params": pbf}, c), x8)
    fl_int8 = flops_of(
        lambda c: improved_forward_int8(qp, c, scales=scales), x8f
    )
    mfu = {
        "bs4_fp32_fma": mfu_pct(fl_cons, cons_secs, "float32"),
        "bs8_bf16_conv": mfu_pct(fl_max, max_secs, "bfloat16"),
        "bs8_int8": mfu_pct(fl_int8, int8_secs, "int8"),
    }

    gated = fidelity_db >= FIDELITY_GATE_DB and max_au > cons_au
    value = max_au if gated else cons_au
    # fidelity of the SELECTED config vs fp32-exact (the conservative row IS
    # the exact path); inf encoded as None for JSON consumers
    headline_fid = fidelity_db if gated else None
    config = "bs8_bf16_conv" if gated else "bs4_fp32_fma"
    if int8_fid >= INT8_GATE_DB and int8_au > value:
        value, config, headline_fid = int8_au, "bs8_int8", int8_fid
    print(
        json.dumps(
            {
                "metric": "fwd_realtime_factor_u16_bases512_max",
                "value": round(value, 2),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(value / BASELINE_AU_S, 3),
                "config": config,
                # fidelity (dB vs fp32-exact) of the config 'value' came
                # from; null == exact fp32 numerics
                "headline_fidelity_db": (
                    round(headline_fid, 1) if headline_fid is not None else None
                ),
                "bf16_fidelity_db": round(fidelity_db, 1),
                "fidelity_gate_db": FIDELITY_GATE_DB,
                "conservative_bs4_fp32": round(cons_au, 2),
                "int8_bs8": round(int8_au, 2),
                "int8_fidelity_db": round(int8_fid, 1),
                "int8_gate_db": INT8_GATE_DB,
                "int8_scales": "static_calibrated",
                # model-FLOPs utilization vs chip peak (headline config +
                # the fp32-exact conservative row); null off-TPU
                "mfu_pct": (
                    round(mfu[config], 1) if mfu.get(config) else None
                ),
                "mfu_pct_conservative": (
                    round(mfu["bs4_fp32_fma"], 1)
                    if mfu.get("bs4_fp32_fma") else None
                ),
                # auto-tuned TRAINING step (full Trainer step at bf16);
                # baseline: reference 11.8 ex/s bwd bs4 on the 2080 Ti ==
                # 47.2 audio-sec/sec (README.md:123)
                "train_config": (
                    f"bs{tuned.batch_size}_bf16_{tuned.impl}_auto"
                ),
                "train_ms_per_step": round(train_secs * 1e3, 2),
                "train_au_s_per_s": round(train_au, 1),
                "train_vs_baseline": round(train_au / 47.2, 3),
                "train_mfu_pct": (
                    round(train_mfu, 1) if train_mfu else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
