"""End-to-end experiment runner tests on tiny synthetic corpora."""

import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

from sudo_rm_rf_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig

SR = 8000


def _mk_wham(root):
    rng = np.random.default_rng(0)
    for split in ("tr", "cv"):
        base = os.path.join(root, "wav8k", "min", split)
        for i in range(4):
            s1 = rng.standard_normal(SR * 2)
            s2 = rng.standard_normal(SR * 2)
            for d, wav in (("s1", s1), ("s2", s2), ("mix_clean", s1 + s2)):
                os.makedirs(os.path.join(base, d), exist_ok=True)
                wavfile.write(
                    os.path.join(base, d, f"u{i}.wav"), SR,
                    (wav * 8000).astype(np.int16),
                )


@pytest.fixture(scope="module")
def tiny_config(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wham"))
    _mk_wham(root)
    os.environ["SUDO_TPU_WHAM_ROOT"] = root
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    cfg = ExperimentConfig(
        model=ModelConfig(
            model_type="relu", out_channels=16, in_channels=32, num_blocks=1,
            upsampling_depth=2, enc_kernel_size=21, enc_num_basis=16,
            num_sources=2,
        ),
        data=DataConfig(
            train=("WHAM",), val=("WHAM",), separation_task="sep_clean",
            fs=SR, audio_timelength=1.0, batch_size=4, n_jobs=1,
        ),
        train=TrainConfig(
            n_epochs=2, learning_rate=1e-3, save_checkpoint_every=1,
            checkpoints_path=ckpt_dir,
        ),
        experiment_name="tiny_exp",
    )
    return cfg


def test_run_experiment_bf16_tp_mesh(tiny_config, tmp_path):
    """--compute_dtype bfloat16 and --n_model 2 reach the trainer through
    the experiment config: mixed-precision training over a (data, model)
    mesh with compute TP on the fma blocks."""
    import dataclasses

    cfg = dataclasses.replace(
        tiny_config,
        model=dataclasses.replace(tiny_config.model, block_impl="fma"),
        train=dataclasses.replace(
            tiny_config.train, n_epochs=1, compute_dtype="bfloat16",
            n_model=2, checkpoints_path=str(tmp_path / "ck"),
        ),
        experiment_name="tiny_bf16_tp",
    )
    from sudo_rm_rf_tpu.train.experiment import run_experiment
    from sudo_rm_rf_tpu.utils import ExperimentLogger

    logger = ExperimentLogger(str(tmp_path), "tiny_bf16_tp")
    state, history = run_experiment(cfg, logger=logger)
    assert np.isfinite(history[-1]["tr_loss"])
    # fp32 master params preserved under bf16 compute
    import jax

    assert all(p.dtype == np.float32 for p in jax.tree.leaves(state.params))


def test_run_experiment_end_to_end(tiny_config, tmp_path):
    from sudo_rm_rf_tpu.train.experiment import run_experiment
    from sudo_rm_rf_tpu.utils import ExperimentLogger

    logger = ExperimentLogger(str(tmp_path), "tiny_exp")
    state, history = run_experiment(tiny_config, logger=logger)
    assert len(history) == 2
    assert np.isfinite(history[-1]["tr_loss"])
    assert "val_SISDRi" in history[-1]

    # artifacts: metrics jsonl, per-epoch metric arrays, audio, checkpoints
    d = os.path.join(tmp_path, "tiny_exp")
    lines = [json.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
    assert any("val_SISDRi" in l for l in lines)
    assert os.path.exists(os.path.join(d, "val_SISDRi", "epoch_1.npy"))
    assert any(f.startswith("val_step") for f in os.listdir(os.path.join(d, "audio")))
    ckpt_dir = os.path.join(tiny_config.train.checkpoints_path, "tiny_exp")
    assert any(f.startswith("relu_epoch_") for f in os.listdir(ckpt_dir))
    assert any(f.startswith("best_val_SISDRi") for f in os.listdir(ckpt_dir))


def test_run_experiment_resume(tiny_config, tmp_path):
    from sudo_rm_rf_tpu.train.experiment import run_experiment
    from sudo_rm_rf_tpu.utils import ExperimentLogger

    logger = ExperimentLogger(str(tmp_path), "tiny_exp_resume")
    state, history = run_experiment(tiny_config, logger=logger, resume=True)
    # previous test saved epoch 2; resume trains 0 more epochs but restores
    assert int(state.step) >= 2


def test_cli_train_smoke(tiny_config, tmp_path, monkeypatch):
    from sudo_rm_rf_tpu.cli.train import main

    wham = os.environ["SUDO_TPU_WHAM_ROOT"]
    rc = main([
        "--train", "WHAM", "--val", "WHAM", "--separation_task", "sep_clean",
        "--model_type", "relu", "--out_channels", "16", "--in_channels", "32",
        "--num_blocks", "1", "--upsampling_depth", "2", "--enc_num_basis", "16",
        "--n_epochs", "1", "-bs", "4", "--audio_timelength", "1.0",
        "--zero_pad_audio", "--n_jobs", "1",
        "--experiment_name", "cli_smoke",
        "-elp", str(tmp_path / "logs"), "-clp", str(tmp_path / "ckpt"),
        "--wham_root", wham, "--save_checkpoint_every", "1",
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "logs" / "cli_smoke" / "metrics.jsonl")


def test_fuss_recipe_loss_path(tmp_path):
    """FUSS recipe: zero-ref SNR loss over augmented variable-count sources."""
    from sudo_rm_rf_tpu.train.experiment import _make_recipe
    import jax

    cfg = ExperimentConfig(
        model=ModelConfig(model_type="relu", num_sources=4),
        data=DataConfig(train=("FUSS",)),
    )
    prepare, loss_fn = _make_recipe(cfg)
    src = np.zeros((4, 4, 800), np.float32)
    src[:, :2] = np.random.default_rng(0).standard_normal((4, 2, 800))
    mix, targets = prepare(jax.random.key(0), np.asarray(src))
    assert mix.shape == (4, 1, 800) and targets.shape == (4, 4, 800)
    est = np.random.default_rng(1).standard_normal((4, 4, 800)).astype(np.float32)
    val = float(loss_fn(est, targets))
    assert np.isfinite(val)


def test_bench_harness_cpu():
    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.utils.benchmark import benchmark_model, count_params

    model = models.SuDORMRFImproved(
        out_channels=16, in_channels=32, num_blocks=1, upsampling_depth=2,
        enc_kernel_size=21, enc_num_basis=16, num_sources=2,
    )
    def timed_row(measure, n_hi):
        # timed_loop differences two loop lengths; on a loaded CPU box the
        # difference can go non-positive at tiny n_hi — retry with a longer
        # loop rather than flaking (the harness itself is deterministic)
        for attempt_n in (n_hi, 4 * n_hi, 16 * n_hi):
            row = benchmark_model(model, batch_size=2, timelength=0.5,
                                  measure=measure, n_hi=attempt_n)
            if row["secs_per_batch"] > 0:
                return row
        return row

    row = timed_row("forward", 6)
    assert row["secs_per_batch"] > 0
    assert row["n_params_m"] > 0
    row_b = timed_row("backward", 4)
    assert row_b["secs_per_batch"] > 0


def test_param_count_matches_reference_u16_512():
    """Improved U16/512 must have ~5.02M params (README.md:123)."""
    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.utils.benchmark import count_params
    import jax
    import jax.numpy as jnp

    # NOTE: the published "U16/512" checkpoint uses out_channels=256 —
    # that is what reproduces the README's 5.02M parameter count.
    model = models.SuDORMRFImproved(
        out_channels=256, in_channels=512, num_blocks=16, upsampling_depth=5,
        enc_kernel_size=21, enc_num_basis=512, num_sources=2,
    )
    params = jax.eval_shape(model.init, jax.random.key(0), jnp.zeros((1, 1, 32000)))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params["params"]))
    assert abs(n / 1e6 - 5.02) < 0.02, n


def test_run_experiment_whamr_recipe(tmp_path):
    """WHAMR branch: pair-consistent remix of reverberant sources vs
    anechoic targets, end to end."""
    from scipy.io import wavfile as wf

    from sudo_rm_rf_tpu.train.experiment import run_experiment
    from sudo_rm_rf_tpu.utils import ExperimentLogger

    rng = np.random.default_rng(3)
    for split in ("tr", "cv"):
        base = tmp_path / "wav8k" / "min" / split
        for i in range(4):
            for d in ("mix_both_reverb", "s1_reverb", "s2_reverb", "noise",
                      "s1_anechoic", "s2_anechoic"):
                os.makedirs(base / d, exist_ok=True)
                wf.write(str(base / d / f"u{i}.wav"), SR,
                         (rng.standard_normal(SR * 2) * 8000).astype(np.int16))
    os.environ["SUDO_TPU_WHAMR_ROOT"] = str(tmp_path)

    cfg = ExperimentConfig(
        model=ModelConfig(model_type="relu", out_channels=16, in_channels=32,
                          num_blocks=1, upsampling_depth=2, enc_kernel_size=21,
                          enc_num_basis=16, num_sources=2),
        data=DataConfig(train=("WHAMR",), val=(), separation_task="noisy_reverberant",
                        fs=SR, audio_timelength=1.0, batch_size=4, n_jobs=1),
        train=TrainConfig(n_epochs=1, save_checkpoint_every=0,
                          checkpoints_path=str(tmp_path / "ckpt"),
                          loss_clamp=50.0),
        experiment_name="whamr_exp",
    )
    logger = ExperimentLogger(str(tmp_path / "logs"), "whamr_exp")
    state, history = run_experiment(cfg, logger=logger)
    assert np.isfinite(history[-1]["tr_loss"])


def test_run_experiment_fuss_recipe(tmp_path):
    """FUSS branch: variable-source-count corpus, zero-ref SNR loss."""
    from scipy.io import wavfile as wf

    from sudo_rm_rf_tpu.train.experiment import run_experiment
    from sudo_rm_rf_tpu.utils import ExperimentLogger

    rng = np.random.default_rng(4)
    lines = []
    for i in range(8):
        n_src = 1 + i % 3
        names = []
        os.makedirs(tmp_path / f"ex{i}", exist_ok=True)
        mix_name = f"ex{i}/mixture.wav"
        wf.write(str(tmp_path / mix_name), 16000,
                 (rng.standard_normal(16000 * 2) * 8000).astype(np.int16))
        for s in range(n_src):
            name = f"ex{i}/src{s}.wav"
            wf.write(str(tmp_path / name), 16000,
                     (rng.standard_normal(16000 * 2) * 8000).astype(np.int16))
            names.append(name)
        lines.append("\t".join([mix_name] + names))
    (tmp_path / "train_example_list.txt").write_text("\n".join(lines))
    (tmp_path / "validation_example_list.txt").write_text("\n".join(lines[:4]))
    os.makedirs(tmp_path / "train", exist_ok=True)
    os.makedirs(tmp_path / "validation", exist_ok=True)
    os.environ["SUDO_TPU_FUSS_ROOT"] = str(tmp_path)

    cfg = ExperimentConfig(
        model=ModelConfig(model_type="relu", out_channels=16, in_channels=32,
                          num_blocks=1, upsampling_depth=2, enc_kernel_size=21,
                          enc_num_basis=16, num_sources=3),
        data=DataConfig(train=("FUSS",), val=("FUSS",), fs=16000,
                        audio_timelength=1.0, batch_size=4, n_jobs=1,
                        min_num_sources=1, max_num_sources=3),
        train=TrainConfig(n_epochs=1, save_checkpoint_every=0,
                          checkpoints_path=str(tmp_path / "ckpt"),
                          mixture_consistency="uniform"),
        experiment_name="fuss_exp",
    )
    logger = ExperimentLogger(str(tmp_path / "logs"), "fuss_exp")
    state, history = run_experiment(cfg, logger=logger)
    assert np.isfinite(history[-1]["tr_loss"])
    # per-source-count validation sets (`run_fuss_separation.py:61-75`):
    # SISDR (no improvement) for 1 source, stabilized SISDRi otherwise
    assert "val_1_srcs_SISDR" in history[-1]
    assert "val_2_srcs_SISDRi" in history[-1]
    assert "val_3_srcs_SISDRi" in history[-1]
    assert "val_SISDRi" not in history[-1]
    for k in ("val_1_srcs_SISDR", "val_2_srcs_SISDRi", "val_3_srcs_SISDRi"):
        assert np.isfinite(history[-1][k])


def test_fuss_validation_matches_torch_pipeline(tmp_path):
    """The FUSS val path (standardized sum mixture -> model -> mixture
    consistency -> stabilized per-count SI-SDR) must reproduce the torch
    reference pipeline (`run_fuss_separation.py:279-310`) on a converted
    model, including batches whose source count is below the model's
    estimate count."""
    import glob as _glob
    import sys

    sys.modules.setdefault("glob2", _glob)
    sys.path.insert(0, "/root/reference")
    import jax
    import jax.numpy as jnp
    import torch

    from sudo_rm_rf.dnn.losses import sisdr as torch_sisdr
    from sudo_rm_rf.dnn.experiments.utils import mixture_consistency as torch_mc
    from sudo_rm_rf.dnn.models import improved_sudormrf as torch_improved

    from sudo_rm_rf_tpu import losses as losses_lib, models
    from sudo_rm_rf_tpu.convert import state_dict_to_params
    from sudo_rm_rf_tpu.train.experiment import fuss_val_batch

    hp = dict(out_channels=16, in_channels=32, num_blocks=1,
              upsampling_depth=2, enc_kernel_size=21, enc_num_basis=16,
              num_sources=3)
    tm = torch_improved.SuDORMRF(**hp)
    tm.eval()
    model = models.get_model("relu", **hp)
    x0 = jnp.zeros((2, 1, 8000))
    shapes = jax.eval_shape(model.init, jax.random.key(0), x0)["params"]
    params = state_dict_to_params(tm.state_dict(), shapes)

    rng = np.random.default_rng(11)
    for n_actual in (1, 2, 3):
        targets = rng.standard_normal((2, n_actual, 8000)).astype(np.float32)

        # torch reference pipeline
        t_targets = torch.from_numpy(targets)
        t_mix = torch.sum(t_targets, -2, keepdim=True)
        t_mix = (t_mix - t_mix.mean(-1, keepdim=True)) / (
            t_mix.std(-1, keepdim=True) + 1e-9
        )
        with torch.no_grad():
            rec = tm(t_mix)
            rec = torch_mc.apply(rec, t_mix)
        metric = torch_sisdr.StabilizedPermInvSISDRMetric(
            zero_mean=True, single_source=False,
            n_estimated_sources=hp["num_sources"] if n_actual > 1 else 1,
            n_actual_sources=n_actual, backward_loss=False,
            improvement=n_actual > 1, return_individual_results=True,
        )
        with torch.no_grad():
            want = metric(
                rec[:, :1] if n_actual == 1 else rec, t_targets
            ).numpy()

        # our pipeline (fuss_val_batch mirrors run_experiment's FUSS branch)
        def forward(m):
            est = model.apply({"params": params}, m)
            return losses_lib.mixture_consistency(est, m, "uniform")

        vals, _, _ = fuss_val_batch(
            forward, targets, n_actual, hp["num_sources"]
        )
        np.testing.assert_allclose(
            np.asarray(vals), want, rtol=1e-3, atol=1e-3,
            err_msg=f"n_actual={n_actual}",
        )


def test_musdb_recipe_fixed_assignment(tmp_path):
    """MUSDB recipe: the 4 stems are identity-bearing output slots
    (`musdb_dataset.py:86`), so the loss must be FIXED-assignment SI-SDR —
    swapping two estimate slots has to change it (PIT would not)."""
    import jax

    from sudo_rm_rf_tpu.train.experiment import _make_recipe

    cfg = ExperimentConfig(
        model=ModelConfig(model_type="relu", num_sources=4),
        data=DataConfig(train=("MUSDB",)),
    )
    prepare, loss_fn = _make_recipe(cfg)
    rng = np.random.default_rng(0)
    stems = rng.standard_normal((2, 1, 4, 800)).astype(np.float32)
    mix, targets = prepare(jax.random.key(0), np.asarray(stems))
    # mixture is the linear stem sum of the mono-collapsed stack
    assert mix.shape == (2, 1, 800) and targets.shape == (2, 4, 800)
    np.testing.assert_allclose(
        np.asarray(mix[:, 0]), stems[:, 0].sum(1), rtol=1e-6
    )
    est = np.asarray(targets) + 0.1 * rng.standard_normal(
        targets.shape
    ).astype(np.float32)
    aligned = float(loss_fn(est, targets))
    swapped = float(loss_fn(est[:, [1, 0, 2, 3]], targets))
    assert np.isfinite(aligned) and swapped > aligned + 1.0


def test_run_experiment_musdb_recipe(tmp_path):
    """MUSDB branch end to end: dir-of-stems corpus -> fixed-assignment
    training loss + fixed-order val SI-SDRi over the predefined per-track
    segments (`musdb_dataset.py:88-112`)."""
    from scipy.io import wavfile as wf

    from sudo_rm_rf_tpu.train.experiment import run_experiment
    from sudo_rm_rf_tpu.utils import ExperimentLogger

    rng = np.random.default_rng(5)
    for split, n_tracks in (("train", 3), ("test", 2)):
        for i in range(n_tracks):
            d = tmp_path / "corpus" / split / f"track{i:03d}"
            os.makedirs(d, exist_ok=True)
            stems = rng.standard_normal((4, SR * 2)).astype(np.float32)
            for name, wav in zip(
                ("drums", "bass", "other", "vocals"), stems
            ):
                wf.write(str(d / f"{name}.wav"), SR,
                         (wav * 8000).astype(np.int16))
            wf.write(str(d / "mixture.wav"), SR,
                     (stems.sum(0) * 8000).astype(np.int16))
    os.environ["SUDO_TPU_MUSDB8K_ROOT"] = str(tmp_path / "corpus")

    cfg = ExperimentConfig(
        model=ModelConfig(model_type="relu", out_channels=16, in_channels=32,
                          num_blocks=1, upsampling_depth=2, enc_kernel_size=21,
                          enc_num_basis=16, num_sources=4),
        data=DataConfig(train=("MUSDB",), val=("MUSDB",), fs=SR,
                        audio_timelength=1.0, batch_size=2, n_jobs=1,
                        n_train=4, n_val=2),
        train=TrainConfig(n_epochs=1, save_checkpoint_every=0,
                          checkpoints_path=str(tmp_path / "ckpt")),
        experiment_name="musdb_exp",
    )
    logger = ExperimentLogger(str(tmp_path / "logs"), "musdb_exp")
    state, history = run_experiment(cfg, logger=logger)
    assert np.isfinite(history[-1]["tr_loss"])
    assert np.isfinite(history[-1]["val_SISDRi"])


def test_early_stop_on_plateau(tiny_config, tmp_path):
    """--early_stop_patience: lr=0 training never improves val, so a 5-epoch
    budget must stop after (1 + patience) epochs."""
    import dataclasses

    from sudo_rm_rf_tpu.train.experiment import run_experiment
    from sudo_rm_rf_tpu.utils import ExperimentLogger

    cfg = dataclasses.replace(
        tiny_config,
        train=dataclasses.replace(
            tiny_config.train, n_epochs=5, learning_rate=0.0,
            early_stop_patience=1, checkpoints_path=str(tmp_path / "ck"),
        ),
        experiment_name="tiny_earlystop",
    )
    logger = ExperimentLogger(str(tmp_path), "tiny_earlystop")
    _, history = run_experiment(cfg, logger=logger)
    assert len(history) == 2  # epoch 1 sets best, epoch 2 trips patience
