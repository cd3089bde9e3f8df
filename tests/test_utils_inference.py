"""Tests: checkpoint manager, experiment logger, overlap-add inference."""

import json
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sudo_rm_rf_tpu import models
from sudo_rm_rf_tpu.inference import OverlapAddSeparator
from sudo_rm_rf_tpu.train import Trainer, TrainerConfig
from sudo_rm_rf_tpu.utils import (
    AudioLogger,
    CheckpointManager,
    ExperimentLogger,
    report_losses_mean_and_std,
)

TINY = dict(
    out_channels=16, in_channels=32, num_blocks=1, upsampling_depth=2,
    enc_kernel_size=9, enc_num_basis=16, num_sources=2,
)


def test_checkpoint_roundtrip_with_optimizer_state(tmp_path):
    model = models.SuDORMRFImproved(**TINY)
    trainer = Trainer(
        model, TrainerConfig(),
        prepare_batch=lambda key, b: (b.sum(1, keepdims=True), b),
    )
    src = np.random.default_rng(0).standard_normal((8, 2, 1024)).astype(np.float32)
    state = trainer.init_state(jax.random.key(0), jnp.zeros((8, 1, 1024)))
    state, _ = trainer.train_step(state, jnp.array(src), jax.random.key(0))

    mgr = CheckpointManager(str(tmp_path), "improved")
    mgr.save(state, "improved_epoch_1", {"epoch": 1})

    fresh = trainer.init_state(jax.random.key(1), jnp.zeros((8, 1, 1024)))
    restored = mgr.restore(fresh, "improved_epoch_1")
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state resumed too (the reference never did this)
    for a, b in zip(
        jax.tree.leaves(restored.opt_state), jax.tree.leaves(state.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues identically
    s1, m1 = trainer.train_step(restored, jnp.array(src), jax.random.key(1))
    s2, m2 = trainer.train_step(state, jnp.array(src), jax.random.key(1))
    assert float(m1["loss"]) == float(m2["loss"])


def test_checkpoint_best_policy(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "m")
    state = {"w": np.ones(3)}
    assert mgr.save_if_best(state, "SISDRi", 10.0, epoch=1)
    assert not mgr.save_if_best(state, "SISDRi", 9.0, epoch=2)
    assert mgr.save_if_best(state, "SISDRi", 11.5, epoch=3)
    best_files = [f for f in os.listdir(tmp_path) if f.startswith("best_") and not f.endswith(".json")]
    curr_files = [f for f in os.listdir(tmp_path) if f.startswith("current_") and not f.endswith(".json")]
    assert len(best_files) == 1 and "11.5" in best_files[0]
    assert len(curr_files) == 1 and "9.0" not in curr_files[0]
    restored = mgr.load_best({"w": np.zeros(3)})
    np.testing.assert_array_equal(restored["w"], np.ones(3))


def test_experiment_logger(tmp_path):
    logger = ExperimentLogger(str(tmp_path), "exp1", tags=["WHAM", "relu"])
    logger.log_parameters({"lr": 1e-3, "model": "relu"})
    logger.log_metrics({"tr_loss": -12.0}, context="train", step=1)
    logger.log_metrics({"val_SISDRi": 15.5}, context="validate", step=1)
    logger.log_metric_array("val_SISDRi", np.arange(5.0), epoch=1)
    logger.close()

    d = os.path.join(tmp_path, "exp1")
    hparams = json.load(open(os.path.join(d, "hparams.json")))
    assert hparams["model"] == "relu"
    lines = [json.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
    assert lines[0]["tr_loss"] == -12.0 and lines[1]["context"] == "validate"
    arr = np.load(os.path.join(d, "val_SISDRi", "epoch_1.npy"))
    np.testing.assert_array_equal(arr, np.arange(5.0))


class _FakeComet:
    """Records the upload surface the reference exercises
    (`cometml_log_audio.py:50-70` audio, `dprnn.py:497-516` model assets)."""

    def __init__(self):
        self.audio, self.assets, self.metrics = [], [], []

    def log_audio(self, path, sample_rate=8000, step=0):
        self.audio.append((path, sample_rate, step))

    def log_asset(self, path, overwrite=True):
        self.assets.append(path)

    def log_metrics(self, metrics, step=0):
        self.metrics.append((dict(metrics), step))

    def train(self):
        import contextlib

        return contextlib.nullcontext()

    validate = train

    def end(self):
        pass


def test_experiment_logger_comet_uploads(tmp_path):
    """log_audio / log_asset pass through to an attached comet backend and
    are no-ops without one."""
    logger = ExperimentLogger(str(tmp_path), "exp_up")
    logger.log_audio("x.wav", 8000, 1)  # no backend: must not raise
    logger.log_asset("m.ckpt")

    fake = _FakeComet()
    logger._comet = fake
    logger.log_audio("x.wav", 16000, 2)
    logger.log_asset("m.ckpt")
    assert fake.audio == [("x.wav", 16000, 2)] and fake.assets == ["m.ckpt"]

    # AudioLogger uploads every dumped wav through the logger
    alog = AudioLogger(str(tmp_path / "audio"), fs=8000, n_sources=2)
    pr = np.zeros((1, 2, 160), np.float32)
    alog.log_batch(pr, pr, pr.sum(1), experiment=logger, step=1, tag="val")
    assert len(fake.audio) == 1 + 5  # mixture + 2 true + 2 est
    logger.close()


def test_report_losses_mean_and_std():
    res = {"tr_loss": {"acc": [1.0, 2.0, 3.0]}, "val_SISDRi": {"acc": [10.0, 12.0]}}
    out = report_losses_mean_and_std(res)
    assert out["tr_loss"]["mean"] == 2.0
    assert out["val_SISDRi"]["mean"] == 11.0


def test_audio_logger_writes_wavs(tmp_path):
    logger = AudioLogger(str(tmp_path), fs=8000, n_sources=2)
    pr = np.random.default_rng(0).standard_normal((2, 2, 800)).astype(np.float32)
    logger.log_batch(pr, pr, pr.sum(1), step=3, tag="val")
    files = os.listdir(os.path.join(tmp_path, "val_step_3"))
    assert "b0_mixture.wav" in files and "b1_est_s2.wav" in files


class _EchoSeparator(nn.Module):
    """Returns [x, -x]: source 0 reconstructs the input exactly."""

    @nn.compact
    def __call__(self, x):  # (B, 1, T)
        dummy = self.param("w", nn.initializers.ones, (1,))
        return jnp.concatenate([x * dummy, -x * dummy], axis=1)


def test_overlap_add_mesh_sharded_matches_single_device():
    """DP serving: chunk batches sharded over the 8-device data axis must
    reproduce the unsharded separator exactly."""
    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.parallel import make_mesh

    model = models.get_model(
        "relu", out_channels=16, in_channels=32, num_blocks=1,
        upsampling_depth=3, enc_kernel_size=17, enc_num_basis=16,
        num_sources=2,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 800)))["params"]
    mixture = np.random.default_rng(3).standard_normal(11 * 400 + 57).astype(
        np.float32
    )

    base = OverlapAddSeparator(model, params, chunk_samples=800,
                               num_sources=2, batch_chunks=8)
    sharded = OverlapAddSeparator(model, params, chunk_samples=800,
                                  num_sources=2, batch_chunks=5,  # rounds to 8
                                  mesh=make_mesh())
    assert sharded.batch_chunks == 8
    np.testing.assert_allclose(
        sharded.separate(mixture), base.separate(mixture), rtol=1e-5, atol=1e-6
    )


def test_overlap_add_reconstructs_exactly():
    model = _EchoSeparator()
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, 8)))["params"]
    rng = np.random.default_rng(1)
    mixture = rng.standard_normal(7 * 800 + 123).astype(np.float32)  # odd length

    sep = OverlapAddSeparator(
        model, params, chunk_samples=800, num_sources=2, batch_chunks=4
    )
    est = sep.separate(mixture)
    assert est.shape == (2, mixture.shape[0])
    np.testing.assert_allclose(est[0], mixture, rtol=1e-4, atol=1e-4)


def test_overlap_add_short_input():
    model = _EchoSeparator()
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, 8)))["params"]
    mixture = np.random.default_rng(2).standard_normal(300).astype(np.float32)
    sep = OverlapAddSeparator(model, params, chunk_samples=800, num_sources=2)
    est = sep.separate(mixture)
    assert est.shape == (2, 300)
    np.testing.assert_allclose(est[0], mixture, rtol=1e-4, atol=1e-4)


def test_overlap_add_alignment_fixes_swaps():
    model = _EchoSeparator()
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, 8)))["params"]
    sep = OverlapAddSeparator(model, params, chunk_samples=8, num_sources=2)
    prev_tail = np.stack([np.ones(4, np.float32), -np.ones(4, np.float32)])
    swapped = np.stack(
        [-np.ones((8,), np.float32), np.ones((8,), np.float32)]
    )  # sources in the wrong order
    aligned = sep._align(prev_tail, swapped)
    np.testing.assert_array_equal(aligned[0], np.ones(8))


def test_overlap_add_with_real_model_compiles_once():
    model = models.SuDORMRFImproved(**TINY)
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, 640)))["params"]
    sep = OverlapAddSeparator(
        model, params, chunk_samples=640, num_sources=2, batch_chunks=2
    )
    mixture = np.random.default_rng(3).standard_normal(3000).astype(np.float32)
    est = sep.separate(mixture)
    assert est.shape == (2, 3000)
    assert np.isfinite(est).all()


def test_visualization_heatmaps(tmp_path):
    from sudo_rm_rf_tpu.utils.visualization import log_masks_and_bases

    masks = np.random.default_rng(0).random((2, 16, 50)).astype(np.float32)
    enc = np.random.default_rng(1).random((16, 1, 21)).astype(np.float32)
    paths = log_masks_and_bases(str(tmp_path), masks=masks, encoder_basis=enc, step=1)
    # matplotlib is present in this image; expect 3 pngs
    assert len(paths) == 3
    assert all(os.path.exists(p) for p in paths)


def test_progress_wrapper_equivalence():
    from sudo_rm_rf_tpu.utils.progress import progress_bar_wrapper

    out = progress_bar_wrapper(lambda x: x * 2, [1, 2, 3], "doubling")
    assert out == [2, 4, 6]
