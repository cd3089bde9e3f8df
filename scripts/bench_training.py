"""Training-step throughput sweep + attribution (round-3 VERDICT item 3).

Sweeps the flagship U16/512 training step over batch {4, 8, 16} x dtype
{fp32, bf16} x remat {off, on}, plus the GroupComm R16 training step with
both block implementations ('xla' reference blocks vs the round-3 trainable
'fma' blocks), all through the REAL Trainer step (augment + forward + PIT
loss + grads + clip + Adam, donated). Also times the step's ablations
(no-augment, forward-only, fwd+bwd without optimizer) at the best config to
attribute where the time goes.

Timing: chained on-device fori_loop with scalar readback (the repo-wide
discipline, utils/benchmark.timed_loop).

Usage: python scripts/bench_training.py [--quick]
"""

import argparse
import json

import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import models
from sudo_rm_rf_tpu.train import Trainer, TrainerConfig
from sudo_rm_rf_tpu.utils.benchmark import timed_loop

SR, SECS = 8000, 4.0
T = int(SR * SECS)


def time_train_step(model, bs, compute_dtype=None, n_hi=21, trainer_kw=None,
                    loss_clamp=30.0, augment=True, optimizer=True):
    cfg = TrainerConfig(
        learning_rate=1e-3,
        compute_dtype=compute_dtype,
        loss_clamp=loss_clamp,
        **(trainer_kw or {}),
    )
    prepare = None
    if not augment:
        prepare = lambda key, b: (b.sum(1, keepdims=True), b)
    trainer = Trainer(model, cfg, prepare_batch=prepare)
    batch = jax.random.normal(jax.random.key(1), (bs, 2, T), jnp.float32)
    state = trainer.init_state(jax.random.key(0), jnp.zeros((bs, 1, T)))

    if not optimizer:
        # fwd+bwd only: value_and_grad of the trainer's exact loss
        def step(carry):
            st, b, key = carry
            key, sub = jax.random.split(key)
            mixture, targets = trainer.prepare_batch(sub, b)

            def loss_of(p):
                if compute_dtype:
                    cdt = jnp.dtype(compute_dtype)
                    pp = jax.tree.map(lambda a: a.astype(cdt), p)
                    m = mixture.astype(cdt)
                else:
                    pp, m = p, mixture
                est = trainer._forward(pp, m).astype(jnp.float32)
                return trainer.loss_fn(est, targets)

            loss, grads = jax.value_and_grad(loss_of)(st.params)
            new_params = jax.tree.map(
                lambda a, g: a - 0.0 * g, st.params, grads
            )
            return (st.replace(params=new_params), b, key)

        secs = timed_loop(step, (state, batch, jax.random.key(2)), n_hi=n_hi)
        return secs

    def step(carry):
        st, b, key = carry
        key, sub = jax.random.split(key)
        st, _ = trainer._train_step_impl(st, b, sub)
        return (st, b, key)

    secs = timed_loop(step, (state, batch, jax.random.key(2)), n_hi=n_hi)
    return secs


def row(name, secs, bs):
    return {
        "config": name,
        "ms_per_step": round(secs * 1e3, 2),
        "examples_per_sec": round(bs / secs, 1),
        "audio_sec_per_sec": round(bs * SECS / secs, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="flagship bf16 rows + GC rows only")
    ap.add_argument("--n_hi", type=int, default=21)
    ap.add_argument("--attention_only", action="store_true",
                    help="only the attention-family rows (attentive zoo + "
                         "SepFormer); skips the U16/GC sweeps")
    args = ap.parse_args()

    u16 = dict(out_channels=256, in_channels=512, num_blocks=16,
               upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
               num_sources=2)
    rows = []

    sweep = []
    if args.attention_only:
        sweep = []
    else:
        for bs in (4, 8, 16):
            for dt in (None, "bfloat16"):
                if args.quick and (dt is None and bs != 8):
                    continue
                sweep.append((bs, dt, False))
        if not args.quick:
            sweep.append((8, "bfloat16", True))  # remat leg

    for bs, dt, remat in sweep:
        model = models.SuDORMRFImproved(**u16, block_impl="fma",
                                        remat_blocks=remat)
        name = (f"u16_fma_bs{bs}_{dt or 'fp32'}"
                + ("_remat" if remat else ""))
        try:
            secs = time_train_step(model, bs, dt, n_hi=args.n_hi)
        except Exception as e:  # OOM and relay-limit rows are data too
            rows.append({"config": name, "error": repr(e)[:200]})
            continue
        rows.append(row(name, secs, bs))
        print(json.dumps(rows[-1]))

    if not args.attention_only:
        # attribution at the winning flagship config
        best = min((r for r in rows if "ms_per_step" in r),
                   key=lambda r: r["ms_per_step"] / r["examples_per_sec"])
        bs = int(best["config"].split("_bs")[1].split("_")[0])
        dt = "bfloat16" if "bfloat16" in best["config"] else None
        model = models.SuDORMRFImproved(**u16, block_impl="fma")
        for tag, kw in (
            ("noaugment", dict(augment=False)),
            ("noclamp", dict(loss_clamp=0.0)),
            ("fwdbwd_only", dict(optimizer=False)),
        ):
            try:
                secs = time_train_step(model, bs, dt, n_hi=args.n_hi, **kw)
                rows.append(row(f"attrib_{tag}_bs{bs}_{dt or 'fp32'}", secs,
                                bs))
                print(json.dumps(rows[-1]))
            except Exception as e:
                rows.append({"config": f"attrib_{tag}",
                             "error": repr(e)[:200]})

        # plain-conv ('xla') blocks at the serving sweet spot: bs8 bf16 is
        # where the conv path beat fma for SERVING (BENCHMARKS.md headline)
        # and where GC's xla path beat fma for training — same for U16
        for bs, dt in ((4, "bfloat16"), (8, "bfloat16"), (8, None)):
            model = models.SuDORMRFImproved(**u16, block_impl="xla")
            name = f"u16_xla_bs{bs}_{dt or 'fp32'}"
            try:
                secs = time_train_step(model, bs, dt, n_hi=args.n_hi)
            except Exception as e:
                rows.append({"config": name, "error": repr(e)[:200]})
                continue
            rows.append(row(name, secs, bs))
            print(json.dumps(rows[-1]))

        # GroupComm training step: reference blocks vs trainable fma blocks
        gc = dict(out_channels=256, in_channels=512, num_blocks=16,
                  upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
                  num_sources=2, group_size=16)
        for impl in ("xla", "fma"):
            for bs, dt in ((8, None), (8, "bfloat16")):
                model = models.GroupCommSuDORMRF(**gc, block_impl=impl)
                name = f"gc_{impl}_bs{bs}_{dt or 'fp32'}"
                try:
                    secs = time_train_step(model, bs, dt, n_hi=args.n_hi)
                except Exception as e:
                    rows.append({"config": name, "error": repr(e)[:200]})
                    continue
                rows.append(row(name, secs, bs))
                print(json.dumps(rows[-1]))

    # Attention families (round-3 VERDICT missing #3: the reference trains
    # the attentive zoo and SepFormer, `run_attentive_sudormrf.py:88-150`,
    # but the repo had no training-step timing for them). Attentive models
    # at the reference parser defaults (out_channels=128, U16/512,
    # att_dims=256/4 heads, `improved_cmd_args_parser_v2.py:154-190`) with
    # scan_blocks (one traced block) + remat; SepFormer at its published
    # config, bs1 like the reference's README training rows, scan_layers.
    att = dict(out_channels=128, in_channels=512, num_blocks=16,
               upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
               num_sources=2, n_heads=4, att_dims=256, att_dropout=0.0)
    for mtype in ("attention", "attention_v2", "attention_v3"):
        for bs, dt in ((4, "bfloat16"), (4, None)):
            model = models.get_model(mtype, **att, scan_blocks=True)
            name = f"{mtype}_bs{bs}_{dt or 'fp32'}"
            try:
                secs = time_train_step(model, bs, dt, n_hi=args.n_hi)
            except Exception as e:
                rows.append({"config": name, "error": repr(e)[:200]})
                continue
            rows.append(row(name, secs, bs))
            print(json.dumps(rows[-1]))

    for bs, dt in ((1, "bfloat16"), (1, None), (2, "bfloat16")):
        model = models.get_model("sepformer", scan_layers=True)
        name = f"sepformer_bs{bs}_{dt or 'fp32'}"
        try:
            # loss_clamp=0: random-init SepFormer starts saturated at the
            # reference's +-30 clamp (see tests/test_trainer.py)
            secs = time_train_step(model, bs, dt, n_hi=args.n_hi,
                                   loss_clamp=0.0)
        except Exception as e:
            rows.append({"config": name, "error": repr(e)[:200]})
            continue
        rows.append(row(name, secs, bs))
        print(json.dumps(rows[-1]))

    print(json.dumps({"rows": rows}, indent=1))


if __name__ == "__main__":
    main()
