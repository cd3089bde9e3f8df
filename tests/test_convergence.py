"""End-to-end learning check: a tiny Improved SuDoRM-RF trained with the
PIT SI-SDR recipe on synthetic band-separated sources must reach a clearly
positive SI-SDRi within a few hundred steps. This exercises model forward +
loss + grads + Adam + mesh sharding as one learning system (the closest
offline analog of the reference's headline training runs)."""

import numpy as np

import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import losses, models
from sudo_rm_rf_tpu.train import Trainer, TrainerConfig

SR = 8000
T = 1024


def _band_sources(rng, b):
    """Source 1: slow sinusoid mixture (lowpass); source 2: fast (highpass)."""
    t = np.arange(T) / SR
    src = np.zeros((b, 2, T), np.float32)
    for i in range(b):
        f1 = rng.uniform(80, 200)
        f2 = rng.uniform(1500, 3000)
        src[i, 0] = np.sin(2 * np.pi * f1 * t + rng.uniform(0, 6.28)) * rng.uniform(0.5, 1.2)
        src[i, 1] = np.sin(2 * np.pi * f2 * t + rng.uniform(0, 6.28)) * rng.uniform(0.5, 1.2)
    return src


def test_training_learns_to_separate():
    model = models.SuDORMRFImproved(
        out_channels=24, in_channels=48, num_blocks=2, upsampling_depth=3,
        enc_kernel_size=21, enc_num_basis=32, num_sources=2,
    )
    trainer = Trainer(
        model,
        TrainerConfig(learning_rate=2e-3, loss_clamp=30.0),
        prepare_batch=lambda key, b: (b.sum(1, keepdims=True), b),
    )
    rng = np.random.default_rng(0)
    state = trainer.init_state(jax.random.key(0), jnp.zeros((8, 1, T)))

    metric = losses.PermInvariantSISDR(
        n_sources=2, zero_mean=True, backward_loss=False, improvement=True,
    )
    val = _band_sources(rng, 8)
    val_mix = val.sum(1, keepdims=True)

    def sisdri(params):
        est = trainer._jit_forward(params, jnp.asarray(val_mix))
        return float(
            metric(est, jnp.asarray(val), initial_mixtures=jnp.asarray(val_mix))
        )

    before = sisdri(state.params)
    for step in range(150):
        batch = _band_sources(rng, 8)
        state, m = trainer.train_step(state, jnp.asarray(batch), jax.random.key(step))
        assert np.isfinite(float(m["loss"]))
    after = sisdri(state.params)

    # fresh init separates ~0 dB better than the mixture; trained must gain
    assert after > before + 3.0, (before, after)
    assert after > 3.0, after


def test_trained_model_separates_through_overlap_add():
    """Full serving loop: train briefly, then separate a LONG mixture via
    the overlap-add runtime (chunking + inter-chunk PIT alignment + COLA)
    and score SI-SDR against the true sources — the end-to-end quality path
    a user of the reference would actually run."""
    from sudo_rm_rf_tpu.inference import OverlapAddSeparator

    model = models.SuDORMRFImproved(
        out_channels=24, in_channels=48, num_blocks=2, upsampling_depth=3,
        enc_kernel_size=21, enc_num_basis=32, num_sources=2,
    )
    trainer = Trainer(
        model,
        TrainerConfig(learning_rate=2e-3, loss_clamp=30.0),
        prepare_batch=lambda key, b: (b.sum(1, keepdims=True), b),
    )
    rng = np.random.default_rng(1)
    state = trainer.init_state(jax.random.key(0), jnp.zeros((8, 1, T)))
    for step in range(150):
        state, _ = trainer.train_step(
            state, jnp.asarray(_band_sources(rng, 8)), jax.random.key(step)
        )

    # a 6x-chunk-long mixture of the same source families
    long_t = T * 6 + 321
    t = np.arange(long_t) / SR
    s1 = np.sin(2 * np.pi * 150 * t).astype(np.float32)
    s2 = np.sin(2 * np.pi * 2200 * t).astype(np.float32)
    mixture = s1 + s2

    sep = OverlapAddSeparator(
        model, state.params, chunk_samples=T, num_sources=2, batch_chunks=4
    )
    est = sep.separate(mixture)
    assert est.shape == (2, long_t)

    metric = losses.PermInvariantSISDR(n_sources=2, zero_mean=True,
                                       backward_loss=False)
    score = float(
        metric(jnp.asarray(est[None]), jnp.asarray(np.stack([s1, s2])[None]))
    )
    assert score > 5.0, score  # clearly separated, no chunk-boundary collapse
