#!/usr/bin/env python
"""Quickstart: train a tiny separator on synthetic data, then separate a
long recording with the overlap-add runtime. Runs on CPU or TPU.

    python examples/quickstart.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import losses, models
from sudo_rm_rf_tpu.inference import OverlapAddSeparator
from sudo_rm_rf_tpu.train import Trainer, TrainerConfig

SR, T = 8000, 1024


def band_sources(rng, b):
    t = np.arange(T) / SR
    src = np.zeros((b, 2, T), np.float32)
    for i in range(b):
        src[i, 0] = np.sin(2 * np.pi * rng.uniform(80, 200) * t)
        src[i, 1] = np.sin(2 * np.pi * rng.uniform(1500, 3000) * t)
    return src


def main():
    model = models.SuDORMRFImproved(
        out_channels=24, in_channels=48, num_blocks=2, upsampling_depth=3,
        enc_kernel_size=21, enc_num_basis=32, num_sources=2, block_impl="fma",
    )
    trainer = Trainer(
        model, TrainerConfig(learning_rate=2e-3),
        prepare_batch=lambda key, b: (b.sum(1, keepdims=True), b),
    )
    rng = np.random.default_rng(0)
    state = trainer.init_state(jax.random.key(0), jnp.zeros((8, 1, T)))
    for step in range(200):
        state, m = trainer.train_step(
            state, jnp.asarray(band_sources(rng, 8)), jax.random.key(step)
        )
        if step % 50 == 0:
            print(f"step {step}: loss {float(m['loss']):.2f}")

    # separate a 10x-longer mixture
    t = np.arange(T * 10) / SR
    mixture = np.sin(2 * np.pi * 150 * t) + np.sin(2 * np.pi * 2200 * t)
    sep = OverlapAddSeparator(model, state.params, chunk_samples=T, num_sources=2)
    est = sep.separate(mixture.astype(np.float32))

    metric = losses.PermInvariantSISDR(n_sources=2, zero_mean=True,
                                       backward_loss=False)
    truth = np.stack([np.sin(2 * np.pi * 150 * t), np.sin(2 * np.pi * 2200 * t)])
    score = float(metric(jnp.asarray(est[None]), jnp.asarray(truth[None], jnp.float32)))
    print(f"long-mixture SI-SDR: {score:.1f} dB")


if __name__ == "__main__":
    main()
