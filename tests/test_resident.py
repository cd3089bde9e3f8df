"""Device-resident training data (train/resident.py).

Pins the VERDICT round-3 item-1 contract: on-device draws must equal the
host loader's draws for a fixed seed — the host dataset's pre-generated
uniform draw tensor (`fixed_seed` mode, mirroring
`augmented_mix_dataloader.py:148-160`) is fed verbatim to the on-device
mixer and the produced (mixture, sources) must match to float32 tolerance.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sudo_rm_rf_tpu.data.hierarchical import AugmentedOnlineMixingDataset
from sudo_rm_rf_tpu.prep.hierarchical import _dump_sample
from sudo_rm_rf_tpu.train import resident as resident_lib

SR = 800
T_SEL = 640  # 0.8 s @ 800 Hz


def _mk_corpus(root, n_classes, n_utts, lengths, seed=0):
    rng = np.random.default_rng(seed)
    for c in range(n_classes):
        for u in range(n_utts):
            n = lengths[(c * n_utts + u) % len(lengths)]
            wav = rng.standard_normal(n).astype(np.float32)
            _dump_sample(os.path.join(root, f"cls{c:02d}", f"utt{u:02d}"), wav)
    return root


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    # two dataset roots with different class/sample counts and utterance
    # lengths (exercises priors, per-class sample tables, and delay draws)
    root_a = _mk_corpus(
        str(tmp_path_factory.mktemp("hier_a")), 3, 2,
        [T_SEL, T_SEL + 100, T_SEL + 257], seed=1,
    )
    root_b = _mk_corpus(
        str(tmp_path_factory.mktemp("hier_b")), 2, 3,
        [T_SEL + 33, T_SEL], seed=2,
    )
    return [root_a, root_b]


def _make_ds(corpus, n_samples=24, fixed_seed=7):
    return AugmentedOnlineMixingDataset(
        input_dataset_p=corpus,
        datasets_priors=[0.6, 0.4],
        n_sources=2,
        n_samples=n_samples,
        max_abs_snr=2.5,
        sample_rate=SR,
        selected_timelength=T_SEL / SR,
        fixed_seed=fixed_seed,
    )


def test_on_device_draws_match_host_loader(corpus):
    """The VERDICT item-1 pin: identical uniform draws -> identical batches
    on the host loader and the on-device mixer."""
    ds = _make_ds(corpus)
    pool = resident_lib.hierarchical_pool_from_dataset(ds)
    draws = jnp.asarray(ds.random_draws, jnp.float32)  # (N, S, 5)
    dev_mix, dev_src = resident_lib.mix_from_draws(
        pool.arrays, draws, pool.t_sel, pool.max_abs_snr
    )
    dev_mix, dev_src = np.asarray(dev_mix), np.asarray(dev_src)
    for i in range(len(ds)):
        host_mix, host_src = ds[i]
        np.testing.assert_allclose(
            dev_mix[i], host_mix, rtol=1e-4, atol=2e-5,
            err_msg=f"mixture mismatch at idx {i}",
        )
        np.testing.assert_allclose(
            dev_src[i], host_src, rtol=1e-4, atol=2e-5,
            err_msg=f"sources mismatch at idx {i}",
        )


def test_mix_from_draws_class_collision(corpus):
    """Draws forcing both sources onto the same (dataset, class) must pick
    class (h+1) % n for source 1 (`augmented_mix_dataloader.py:302-309`)."""
    ds = _make_ds(corpus)
    pool = resident_lib.hierarchical_pool_from_dataset(ds)
    # dataset draw 0.0 -> dataset 0 (3 classes); class draw 0.5 -> class 1
    draws = np.zeros((1, 2, 5), np.float32)
    draws[:, :, 0] = 0.0
    draws[:, :, 1] = 0.5
    draws[:, :, 4] = 0.5  # 0 dB
    _, src = resident_lib.mix_from_draws(
        pool.arrays, jnp.asarray(draws), pool.t_sel, pool.max_abs_snr
    )
    # host oracle on the same draws
    ds_fixed = _make_ds(corpus, n_samples=1, fixed_seed=3)
    ds_fixed.random_draws = draws.astype(np.float64)
    _, host_src = ds_fixed[0]
    np.testing.assert_allclose(np.asarray(src[0]), host_src, rtol=1e-4,
                               atol=2e-5)
    # and the two sources are genuinely different utterances
    assert not np.allclose(np.asarray(src[0, 0]), np.asarray(src[0, 1]))


def test_resident_epoch_runs_and_is_deterministic(corpus):
    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.train.trainer import Trainer, TrainerConfig

    ds = _make_ds(corpus, n_samples=16, fixed_seed=0)
    model = models.SuDORMRFImproved(
        out_channels=16, in_channels=32, num_blocks=1, upsampling_depth=2,
        enc_kernel_size=9, enc_num_basis=16, num_sources=2,
    )
    trainer = Trainer(model, TrainerConfig(learning_rate=1e-3))
    pool = resident_lib.hierarchical_pool_from_dataset(ds)
    sample = resident_lib.make_hier_sampler(pool, batch_size=8)
    epoch_fn = resident_lib.make_resident_epoch(trainer, sample, steps=3)

    state = trainer.init_state(
        jax.random.key(0), jnp.zeros((8, 1, T_SEL), jnp.float32)
    )
    key = jax.random.key(5)
    s1, m1, k1 = epoch_fn(state, key, pool.arrays)
    assert m1["loss"].shape == (3,)
    assert np.all(np.isfinite(np.asarray(m1["loss"])))
    assert int(s1.step) == 3
    # bit-determinism: same starting state/key -> same metrics
    state2 = trainer.init_state(
        jax.random.key(0), jnp.zeros((8, 1, T_SEL), jnp.float32)
    )
    s2, m2, _ = epoch_fn(state2, key, pool.arrays)
    np.testing.assert_array_equal(np.asarray(m1["loss"]), np.asarray(m2["loss"]))


def test_examples_pool_and_sampler_pairs():
    """WHAMR-style (sources, targets) pair bank: one index gathers both."""

    class PairDS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            src = np.full((2, 32), float(i), np.float32)
            return src, src * 0.5

    pool = resident_lib.examples_pool_from_dataset(PairDS())
    assert isinstance(pool, tuple) and pool[0].shape == (6, 2, 32)
    sample = resident_lib.make_examples_sampler(6, batch_size=4)
    srcs, tgts = sample(pool, jax.random.key(0))
    assert srcs.shape == (4, 2, 32)
    np.testing.assert_allclose(np.asarray(tgts), np.asarray(srcs) * 0.5)


def test_run_experiment_device_data(corpus, tmp_path):
    """End-to-end: --device_data through run_experiment on an AUGMENTED
    corpus — resident epochs, val, checkpointing all work together."""
    from sudo_rm_rf_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from sudo_rm_rf_tpu.train.experiment import run_experiment
    from sudo_rm_rf_tpu.utils import ExperimentLogger

    cfg = ExperimentConfig(
        model=ModelConfig(
            model_type="relu", out_channels=16, in_channels=32, num_blocks=1,
            upsampling_depth=2, enc_kernel_size=9, enc_num_basis=16,
            num_sources=2,
        ),
        data=DataConfig(
            train=("AUGMENTED_WSJMIX",), val=("AUGMENTED_WSJMIX",),
            train_dataset_paths=tuple(corpus), val_dataset_paths=tuple(corpus),
            n_train=16, n_val=8, fs=SR, audio_timelength=T_SEL / SR,
            batch_size=8, n_jobs=1,
        ),
        train=TrainConfig(
            n_epochs=2, learning_rate=1e-3, device_data=True,
            save_checkpoint_every=1, checkpoints_path=str(tmp_path / "ck"),
        ),
        experiment_name="tiny_resident",
    )
    logger = ExperimentLogger(str(tmp_path), "tiny_resident")
    state, history = run_experiment(cfg, logger=logger)
    assert len(history) == 2
    assert np.isfinite(history[-1]["tr_loss"])
    assert "val_SISDRi" in history[-1]
    assert int(state.step) == 4  # 2 epochs x (16 // 8) steps
