"""Tests: data prep builders and the evaluation CLI."""

import glob
import json
import os

import joblib
import numpy as np
import pytest
from scipy.io import wavfile

SR = 8000


def test_resample_poly_halves_rate():
    from sudo_rm_rf_tpu.prep import resample_poly

    t = np.arange(16000) / 16000
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample_poly(wav, 16000, 8000)
    assert out.shape[0] == 8000
    # 440 Hz tone survives: correlation with the expected tone is high
    want = np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)
    corr = np.dot(out, want) / (np.linalg.norm(out) * np.linalg.norm(want))
    assert corr > 0.95


def test_esc50_hierarchical_and_partition(tmp_path):
    from sudo_rm_rf_tpu.prep import convert_esc50_to_hierarchical, partition_esc50

    audio = tmp_path / "esc" / "audio"
    os.makedirs(audio)
    rng = np.random.default_rng(0)
    # {fold}-{src}-{take}-{class}.wav
    for fold in (1, 2, 5):
        for cls in (0, 7):
            name = f"{fold}-1001{fold}{cls}-A-{cls}.wav"
            wavfile.write(
                str(audio / name), 16000,
                (rng.standard_normal(16000) * 3000).astype(np.int16),
            )

    out = tmp_path / "hier"
    convert_esc50_to_hierarchical(str(tmp_path / "esc"), str(out), 4.0, SR)
    classes = sorted(os.path.basename(p) for p in glob.glob(str(out / "*")))
    assert classes == ["0", "7"]
    sample_dirs = glob.glob(str(out / "0" / "*"))
    wav = joblib.load(os.path.join(sample_dirs[0], "wav"))
    assert wav.shape == (1, SR * 4)
    np.testing.assert_allclose(np.sqrt((wav**2).sum()), 1.0, rtol=1e-3)

    parts = tmp_path / "parts"
    partition_esc50(str(out), str(parts))
    assert glob.glob(str(parts / "train" / "0" / "*"))
    # fold-5 samples land in val/test
    v_t = glob.glob(str(parts / "val" / "0" / "*")) + glob.glob(
        str(parts / "test" / "0" / "*")
    )
    assert len(v_t) == 1


def test_wsj0mix_universal_and_speaker_hierarchy(tmp_path):
    from sudo_rm_rf_tpu.prep import convert_wsj0mix_to_universal

    rng = np.random.default_rng(1)
    for subset in ("tr", "cv"):
        for d in ("mix", "s1", "s2"):
            os.makedirs(tmp_path / "in" / subset / d)
        for i in range(2):
            name = f"01{i}a0101_1.23_20{i}a010b_-1.23.wav"
            for d in ("mix", "s1", "s2"):
                wavfile.write(
                    str(tmp_path / "in" / subset / d / name), SR,
                    (rng.standard_normal(SR * 5) * 3000).astype(np.int16),
                )

    out = convert_wsj0mix_to_universal(
        str(tmp_path / "in"), str(tmp_path / "out"), 4.0, SR, 2, "min"
    )
    assert out.endswith("wsj0_2mix_8k_4s_min_preprocessed")
    folders = glob.glob(os.path.join(out, "tr", "*"))
    assert len(folders) == 2
    mix = joblib.load(os.path.join(folders[0], "mixture_wav"))
    s0 = joblib.load(os.path.join(folders[0], "clean_wav_0"))
    assert mix.shape == s0.shape == (1, SR * 4)

    hier = convert_wsj0mix_to_universal(
        str(tmp_path / "in"), str(tmp_path / "out2"), 4.0, SR, 2, "min",
        hierarchical_by_speaker=True,
    )
    speakers = sorted(os.path.basename(p) for p in glob.glob(os.path.join(hier, "tr", "*")))
    assert speakers == ["010", "011", "200", "201"]
    # usable by the augmented online-mixing dataset
    from sudo_rm_rf_tpu.data import AugmentedOnlineMixingDataset

    ds = AugmentedOnlineMixingDataset(
        input_dataset_p=[os.path.join(hier, "tr")], n_sources=2, n_samples=4,
        sample_rate=SR, selected_timelength=1.0,
    )
    m, s = ds[0]
    assert m.shape == (SR,) and s.shape == (2, SR)


def test_evaluate_cli(tmp_path):
    """The simple_whamr_evaluation flow over a synthetic WHAM test split."""
    from sudo_rm_rf_tpu.cli.evaluate import main

    rng = np.random.default_rng(2)
    base = tmp_path / "wav8k" / "min" / "tt"
    for i in range(4):
        s1 = rng.standard_normal(SR * 2)
        s2 = rng.standard_normal(SR * 2)
        for d, wav in (("s1", s1), ("s2", s2), ("mix_clean", s1 + s2)):
            os.makedirs(base / d, exist_ok=True)
            wavfile.write(str(base / d / f"u{i}.wav"), SR,
                          (wav * 8000).astype(np.int16))

    # save a tiny msgpack checkpoint
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from sudo_rm_rf_tpu import models

    model = models.SuDORMRFImproved(
        out_channels=16, in_channels=32, num_blocks=1, upsampling_depth=2,
        enc_kernel_size=21, enc_num_basis=16, num_sources=2,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, SR)))["params"]
    ckpt = tmp_path / "model.msgpack"
    ckpt.write_bytes(flax.serialization.to_bytes(params))

    out_pickle = tmp_path / "res.pkl"
    rc = main([
        "--checkpoint", str(ckpt), "--model_type", "relu",
        "--dataset", "WHAM", "--split", "test", "-fs", str(SR),
        "--timelength", "1.0", "--batch_size", "2",
        "--out_channels", "16", "--in_channels", "32", "--num_blocks", "1",
        "--upsampling_depth", "2", "--enc_num_basis", "16",
        "--root_dirpath", str(tmp_path), "--out_pickle", str(out_pickle),
    ])
    assert rc == 0
    import pickle

    res = pickle.load(open(out_pickle, "rb"))
    assert len(res["si_sdr"]) == 4 and len(res["si_sdri"]) == 4
    assert all(np.isfinite(res["si_sdri"]))


def test_preprocessed_dataset_loader(tmp_path):
    from sudo_rm_rf_tpu.prep import convert_wsj0mix_to_universal
    from sudo_rm_rf_tpu.data.preprocessed import PreprocessedDataset

    rng = np.random.default_rng(3)
    for d in ("mix", "s1", "s2"):
        os.makedirs(tmp_path / "in" / "tr" / d)
    for i in range(3):
        name = f"01{i}a0101_1.0_20{i}a010b_-1.0.wav"
        for d in ("mix", "s1", "s2"):
            wavfile.write(str(tmp_path / "in" / "tr" / d / name), SR,
                          (rng.standard_normal(SR * 5) * 3000).astype(np.int16))
    out = convert_wsj0mix_to_universal(
        str(tmp_path / "in"), str(tmp_path / "out"), 4.0, SR, 2, "min"
    )
    ds = PreprocessedDataset(root_dirpath=os.path.join(out, "tr"))
    mix, s0, s1 = ds[0]
    assert mix.shape == s0.shape == s1.shape == (SR * 4,)
    batch = next(iter(ds.get_generator(batch_size=2, num_workers=1)))
    assert batch[0].shape == (2, SR * 4)


def test_radam_cosine_optimizer_trains():
    import jax
    import jax.numpy as jnp

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.train import Trainer, TrainerConfig

    model = models.SuDORMRFImproved(
        out_channels=16, in_channels=32, num_blocks=1, upsampling_depth=2,
        enc_kernel_size=9, enc_num_basis=16, num_sources=2,
    )
    trainer = Trainer(
        model,
        TrainerConfig(optimizer="radam_cosine", warmup_steps=2, total_steps=10),
        prepare_batch=lambda key, b: (b.sum(1, keepdims=True), b),
    )
    src = np.random.default_rng(4).standard_normal((8, 2, 1024)).astype(np.float32)
    state = trainer.init_state(jax.random.key(0), jnp.zeros((8, 1, 1024)))
    for i in range(3):
        state, metrics = trainer.train_step(state, jnp.array(src), jax.random.key(i))
        assert np.isfinite(float(metrics["loss"]))


def test_evaluate_cli_full_length(tmp_path):
    """--full_length: whole utterances through the overlap-add runtime."""
    from sudo_rm_rf_tpu.cli.evaluate import main

    rng = np.random.default_rng(5)
    base = tmp_path / "wav8k" / "min" / "tt"
    for i in range(2):
        n = SR * 3 + 777  # odd lengths
        s1 = rng.standard_normal(n)
        s2 = rng.standard_normal(n)
        for d, wav in (("s1", s1), ("s2", s2), ("mix_clean", s1 + s2)):
            os.makedirs(base / d, exist_ok=True)
            wavfile.write(str(base / d / f"u{i}.wav"), SR,
                          (wav * 8000).astype(np.int16))

    import flax.serialization
    import jax
    import jax.numpy as jnp

    from sudo_rm_rf_tpu import models

    model = models.SuDORMRFImproved(
        out_channels=16, in_channels=32, num_blocks=1, upsampling_depth=2,
        enc_kernel_size=21, enc_num_basis=16, num_sources=2,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, SR)))["params"]
    ckpt = tmp_path / "m.msgpack"
    ckpt.write_bytes(flax.serialization.to_bytes(params))

    rc = main([
        "--checkpoint", str(ckpt), "--model_type", "relu",
        "--dataset", "WHAM", "--split", "test", "-fs", str(SR),
        "--timelength", "1.0", "--full_length",
        "--out_channels", "16", "--in_channels", "32", "--num_blocks", "1",
        "--upsampling_depth", "2", "--enc_num_basis", "16",
        "--root_dirpath", str(tmp_path),
    ])
    assert rc == 0

    # the exact time-sharded engine over the same utterances
    rc = main([
        "--checkpoint", str(ckpt), "--model_type", "relu",
        "--dataset", "WHAM", "--split", "test", "-fs", str(SR),
        "--timelength", "1.0", "--full_length",
        "--full_length_mode", "seq_parallel",
        "--out_channels", "16", "--in_channels", "32", "--num_blocks", "1",
        "--upsampling_depth", "2", "--enc_num_basis", "16",
        "--root_dirpath", str(tmp_path),
    ])
    assert rc == 0


def test_export_cli_roundtrip(tmp_path):
    """sudo-tpu-export: msgpack checkpoint -> torch .pt, strict-verified
    against the reference architecture, reproducing the flax forward."""
    import jax
    import jax.numpy as jnp
    import torch

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.cli.export import main as export_main
    from sudo_rm_rf_tpu.utils.checkpoint import CheckpointManager

    hp = dict(out_channels=16, in_channels=32, num_blocks=2,
              upsampling_depth=3, enc_kernel_size=21, enc_num_basis=24,
              num_sources=2)
    model = models.get_model("relu", **hp)
    x = np.random.default_rng(11).standard_normal((1, 1, 661)).astype(np.float32)
    params = model.init(jax.random.key(9), jnp.asarray(x))["params"]
    ckpt = CheckpointManager(str(tmp_path), "m")
    path = ckpt.save(params, "m_params")

    out_pt = str(tmp_path / "exported.pt")
    rc = export_main([
        "--checkpoint", path, "--out", out_pt, "--model_type", "relu",
        "--out_channels", "16", "--in_channels", "32", "--num_blocks", "2",
        "--upsampling_depth", "3", "--enc_num_basis", "24",
        "--reference_root", "/root/reference",
    ])
    assert rc == 0

    from sudo_rm_rf.dnn.models import improved_sudormrf as ref

    tm = ref.SuDORMRF(**hp).eval()
    tm.load_state_dict(torch.load(out_pt, weights_only=True), strict=True)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_evaluate_cli_augmented(tmp_path):
    """AUGMENTED mode: evaluate over a hierarchical online-mixing corpus
    (deterministic fixed-seed mixtures)."""
    import jax
    import jax.numpy as jnp
    import flax.serialization

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.cli.evaluate import main
    from sudo_rm_rf_tpu.prep.hierarchical import _dump_sample

    rng = np.random.default_rng(5)
    for spk in range(3):
        for utt in range(2):
            _dump_sample(
                str(tmp_path / "corpus" / f"c{spk}" / f"u{utt}"),
                rng.standard_normal(SR * 2).astype(np.float32),
            )

    model = models.SuDORMRFImproved(
        out_channels=16, in_channels=32, num_blocks=1, upsampling_depth=2,
        enc_kernel_size=21, enc_num_basis=16, num_sources=2,
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, SR)))["params"]
    ckpt = tmp_path / "model.msgpack"
    ckpt.write_bytes(flax.serialization.to_bytes(params))

    out_pickle = tmp_path / "res.pkl"
    rc = main([
        "--checkpoint", str(ckpt), "--model_type", "relu",
        "--dataset", "AUGMENTED", "--dataset_paths",
        str(tmp_path / "corpus"), "--split", "test", "-fs", str(SR),
        "--timelength", "1.0", "--batch_size", "2", "--n_samples", "4",
        "--out_channels", "16", "--in_channels", "32", "--num_blocks", "1",
        "--upsampling_depth", "2", "--enc_num_basis", "16",
        "--out_pickle", str(out_pickle),
    ])
    assert rc == 0
    import pickle

    res = pickle.load(open(out_pickle, "rb"))
    assert len(res["si_sdri"]) == 4 and all(np.isfinite(res["si_sdri"]))
