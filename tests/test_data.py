"""Dataset pipeline tests over synthetic corpora written to tmp dirs —
the reference's in-file test_generator patterns (`libri2mix.py:210-241`,
`fuss.py:163-196`, `whamr.py:223-252`, randomness tests in
`augmented_mix_dataloader.py:463-527`), with a real test runner."""

import os

import joblib
import numpy as np
import pytest
from scipy.io import wavfile

from sudo_rm_rf_tpu.data import (
    AugmentedOnlineMixingDataset,
    DataLoader,
    FUSSDataset,
    LibriMixDataset,
    MusdbDataset,
    WhamDataset,
    WhamRDataset,
)

SR = 8000


def _write_wav(path, n, seed):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    wav = (rng.standard_normal(n) * 3000).astype(np.int16)
    wavfile.write(path, SR, wav)


@pytest.fixture(scope="module")
def wham_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("wham")
    for split in ("tr", "cv", "tt"):
        base = root / "wav8k" / "min" / split
        for i in range(6):
            n = SR * 3 if i % 2 else SR * 5  # mixed lengths
            for d in ("mix_clean", "s1", "s2", "mix_both", "noise", "mix_single"):
                _write_wav(str(base / d / f"utt{i}.wav"), n, hash((split, d, i)) % 2**31)
    return str(root)


@pytest.fixture(scope="module")
def libri_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("libri")
    for split in ("train-100", "dev", "test"):
        base = root / "wav8k" / "min" / split
        for i in range(5):
            for d in ("mix_clean", "s1", "s2"):
                _write_wav(str(base / d / f"utt{i}.wav"), SR * 5, hash((split, d, i)) % 2**31)
    return str(root)


def test_wham_shapes_and_batching(wham_root):
    ds = WhamDataset(
        root_dirpath=wham_root, task="sep_clean", split="tr", sample_rate=SR,
        timelength=2.0, zero_pad=True, min_or_max="min", augment=True,
        normalize_audio=False, n_samples=0,
    )
    mix, srcs = ds[0]
    assert mix.shape == (SR * 2,) and srcs.shape == (2, SR * 2)
    loader = ds.get_generator(batch_size=2, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    bm, bs = batches[0]
    assert bm.shape == (2, SR * 2) and bs.shape == (2, 2, SR * 2)
    assert bm.dtype == np.float32


def test_wham_augment_reproducible_per_epoch(wham_root):
    ds = WhamDataset(
        root_dirpath=wham_root, task="sep_clean", split="tr", sample_rate=SR,
        timelength=2.0, zero_pad=True, min_or_max="min", augment=True,
        normalize_audio=False, n_samples=0, seed=7,
    )
    a, _ = ds[0]
    b, _ = ds[0]
    np.testing.assert_array_equal(a, b)  # same epoch -> same chunk
    ds.set_epoch(1)
    c, _ = ds[0]
    assert np.abs(a - c).max() > 0  # different epoch -> different chunk


def test_wham_metadata_cache_created(wham_root):
    cache = os.path.join(wham_root, "wav8k", "min", "tr", "metadata")
    assert os.path.exists(cache)


def test_wham_enhancement_task(wham_root):
    ds = WhamDataset(
        root_dirpath=wham_root, task="enh_single", split="cv", sample_rate=SR,
        timelength=1.0, zero_pad=True, min_or_max="min",
        normalize_audio=True, n_samples=0,
    )
    mix, srcs = ds[0]
    assert srcs.shape == (2, SR)


def test_libri2mix_full_length_eval(libri_root):
    ds = LibriMixDataset(
        root_dirpath=libri_root, task="sep_clean", split="test", sample_rate=SR,
        timelength=-1.0, zero_pad=False, min_or_max="min",
        normalize_audio=False, n_samples=0,
    )
    mix, srcs = ds[0]
    assert mix.shape == (SR * 5,)  # whole file


def test_whamr_pair_consistency(tmp_path):
    base = tmp_path / "wav8k" / "min" / "tr"
    for i in range(4):
        for d in ("mix_both_reverb", "s1_reverb", "s2_reverb", "noise",
                  "s1_anechoic", "s2_anechoic"):
            _write_wav(str(base / d / f"u{i}.wav"), SR * 4, hash((d, i)) % 2**31)
    ds = WhamRDataset(
        root_dirpath=str(tmp_path), task="noisy_reverberant", split="tr",
        sample_rate=SR, timelength=2.0, zero_pad=True, min_or_max="min",
        augment=True, n_samples=0,
    )
    sources, targets = ds[1]
    assert sources.shape == targets.shape == (3, SR * 2)
    # the noise column appears in both lists, with the same chunk start:
    np.testing.assert_array_equal(sources[2], targets[2])


def test_fuss_variable_source_counts(tmp_path):
    lines = []
    for i in range(6):
        n_src = 1 + i % 3
        names = []
        mix_name = f"ex{i}/mixture.wav"
        _write_wav(str(tmp_path / mix_name), SR * 3, i)
        for s in range(n_src):
            name = f"ex{i}/src{s}.wav"
            _write_wav(str(tmp_path / name), SR * 3, 100 + i * 10 + s)
            names.append(name)
        lines.append("\t".join([mix_name] + names))
    (tmp_path / "train_example_list.txt").write_text("\n".join(lines))
    os.makedirs(tmp_path / "train", exist_ok=True)

    ds = FUSSDataset(
        root_dirpath=str(tmp_path), split="train", sample_rate=16000,
        timelength=1.0, zero_pad=True, augment=True, min_num_sources=1,
        max_num_sources=3, n_samples=0,
    )
    srcs = ds[0]
    assert srcs.shape == (3, 16000)
    # 2-source filter
    ds2 = FUSSDataset(
        root_dirpath=str(tmp_path), split="train", sample_rate=16000,
        timelength=1.0, zero_pad=True, augment=False, min_num_sources=2,
        max_num_sources=2, n_samples=0,
    )
    assert len(ds2) == 2
    srcs = ds2[0]
    assert srcs.shape == (2, 16000)
    np.testing.assert_array_equal(srcs[1] * 0, 0)  # finite


def test_musdb_mono_stems(tmp_path):
    for split in ("train", "test"):
        for t in range(3):
            for stem in ("mixture", "drums", "bass", "other", "vocals"):
                _write_wav(
                    str(tmp_path / split / f"track{t}" / f"{stem}.wav"),
                    SR * 3, hash((split, t, stem)) % 2**31,
                )
    ds = MusdbDataset(
        root_dirpath=str(tmp_path), split="train", sample_rate=SR,
        timelength=1.0, n_channels=1, augment=True, n_samples=0,
    )
    srcs = ds[0]
    assert srcs.shape == (1, 4, SR)


def test_hierarchical_augmented_mixing(tmp_path):
    # two datasets, each with class folders holding joblib'd sample dicts
    rng = np.random.default_rng(0)
    roots = []
    for d in range(2):
        root = tmp_path / f"ds{d}"
        for c in range(3):
            for s in range(2):
                folder = root / f"class{c}" / f"sample{s}"
                os.makedirs(folder)
                wav = rng.standard_normal((1, SR * 2)).astype(np.float32)
                joblib.dump(wav, folder / "wav")
        roots.append(str(root))

    ds = AugmentedOnlineMixingDataset(
        input_dataset_p=roots, datasets_priors=[0.5, 0.5], n_sources=2,
        n_samples=8, max_abs_snr=2.5, sample_rate=SR, selected_timelength=1.0,
        fixed_seed=0, seed=3,
    )
    mix, srcs = ds[0]
    assert mix.shape == (SR,) and srcs.shape == (2, SR)
    # mixture is standardized
    assert abs(mix.mean()) < 1e-4 and abs(mix.std(ddof=1) - 1.0) < 1e-2

    # truly-random across epochs (`augmented_mix_dataloader.py:463-495`)
    a, _ = ds[0]
    ds.set_epoch(1)
    b, _ = ds[0]
    assert np.abs(a - b).max() > 1e-4

    # fixed_seed makes draws epoch-independent (`:148-160`)
    ds_fixed = AugmentedOnlineMixingDataset(
        input_dataset_p=roots, n_sources=2, n_samples=8, fixed_seed=42,
        sample_rate=SR, selected_timelength=1.0,
    )
    a, _ = ds_fixed[0]
    ds_fixed.set_epoch(5)
    b, _ = ds_fixed[0]
    np.testing.assert_array_equal(a, b)


def test_dataloader_determinism_and_drop_last():
    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.full(3, i, np.float32),)

    dl = DataLoader(Toy(), batch_size=4, shuffle=True, seed=1, num_workers=2)
    e1 = [b[0].ravel().tolist() for b in dl]
    assert len(e1) == 2  # drop_last
    e2 = [b[0].ravel().tolist() for b in dl]
    assert e1 != e2  # different epoch order

    dl2 = DataLoader(Toy(), batch_size=4, shuffle=True, seed=1, num_workers=2)
    f1 = [b[0].ravel().tolist() for b in dl2]
    assert e1 == f1  # same seed, same first epoch


def test_dataset_setup_dispatch(wham_root):
    from sudo_rm_rf_tpu.data import setup as dsetup

    hparams = dict(
        train=["WHAM"], val=["WHAM"], test=None, train_val=None,
        separation_task="sep_clean", fs=SR, audio_timelength=2.0,
        min_or_max="min", zero_pad_audio=True, normalize_audio=False,
        batch_size=2, n_jobs=1, n_train=0, n_val=0,
        wham_root=wham_root,
    )
    gens = dsetup.setup(hparams)
    assert gens["test"] is None
    mix, srcs = next(iter(gens["train"]))
    assert mix.shape == (2, SR * 2) and srcs.shape == (2, 2, SR * 2)


def test_create_augmented_loader_dispatch(tmp_path):
    import joblib as jl

    from sudo_rm_rf_tpu.data.setup import create_augmented_loader

    rng = np.random.default_rng(1)
    root = tmp_path / "hier"
    for c in range(3):
        for s in range(2):
            folder = root / f"class{c}" / f"s{s}"
            os.makedirs(folder)
            jl.dump(rng.standard_normal((1, SR * 2)).astype(np.float32),
                    folder / "wav")
    hp = dict(train_dataset_paths=[str(root)], n_train=6, fs=SR,
              audio_timelength=1.0, n_sources=2)
    ds = create_augmented_loader(hp, "train")
    mix, srcs = ds[0]
    assert mix.shape == (SR,) and srcs.shape == (2, SR)
    # val gets a fixed seed by default -> reproducible across epochs
    hp["val_dataset_paths"] = [str(root)]
    hp["n_val"] = 4
    val = create_augmented_loader(hp, "val")
    a, _ = val[1]
    val.set_epoch(3)
    b, _ = val[1]
    np.testing.assert_array_equal(a, b)


def test_sharded_dataset_roundtrip_and_loader(tmp_path):
    """Shard packing: byte-exact roundtrip, variable shapes, DataLoader
    integration (the many-small-files ingestion path, docs/ROADMAP #6)."""
    import numpy as np

    from sudo_rm_rf_tpu.data import ShardedDataset, write_shards
    from sudo_rm_rf_tpu.data.loader import DataLoader

    rng = np.random.default_rng(7)
    recs = [
        (rng.standard_normal(800).astype(np.float32),
         rng.standard_normal((1 + i % 3, 800)).astype(np.float32))
        for i in range(13)
    ]
    idx = write_shards(
        iter(recs), str(tmp_path), name="mix",
        schema=[("mixture", "float32"), ("sources", "float32")],
        target_shard_bytes=4 * 800 * 4,  # force several shards
    )
    import glob as g
    assert len(g.glob(str(tmp_path / "mix.shard-*.bin"))) > 1

    ds = ShardedDataset(idx)
    assert len(ds) == 13
    for i in (0, 5, 12):
        m, s = ds[i]
        np.testing.assert_array_equal(m, recs[i][0])
        np.testing.assert_array_equal(s, recs[i][1])

    # fixed-shape subset batches through the threaded loader
    fixed = [r for r in recs if r[1].shape[0] == 2]
    idx2 = write_shards(iter(fixed), str(tmp_path), name="fixed",
                        schema=[("mixture", "float32"), ("sources", "float32")])
    loader = ShardedDataset(idx2).get_generator(batch_size=2, shuffle=True,
                                                num_workers=2)
    batches = list(loader)
    assert batches and batches[0][0].shape == (2, 800)
    assert batches[0][1].shape == (2, 2, 800)


def test_pack_dataset_from_loader(tmp_path):
    """pack_dataset shards an existing corpus loader (WHAM-style tuples)."""
    import numpy as np

    from sudo_rm_rf_tpu.data import ShardedDataset, pack_dataset

    class Tiny:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return (rng.standard_normal(400).astype(np.float32),
                    rng.standard_normal((2, 400)).astype(np.float32))

    idx = pack_dataset(Tiny(), str(tmp_path), name="wham")
    ds = ShardedDataset(idx)
    assert len(ds) == 5
    m, s = ds[3]
    want_m, want_s = Tiny()[3]
    np.testing.assert_array_equal(m, want_m)
    np.testing.assert_array_equal(s, want_s)
