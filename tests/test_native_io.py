"""Native C++ wav IO: build, parity with scipy, batch decode, fallbacks."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from sudo_rm_rf_tpu import native

SR = 8000


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths, raws = [], []
    for i in range(6):
        n = SR * (1 + i % 3)
        wav = (rng.standard_normal(n) * 8000).astype(np.int16)
        p = str(d / f"w{i}.wav")
        wavfile.write(p, SR, wav)
        paths.append(p)
        raws.append(wav.astype(np.float32) / 32768.0)
    # one stereo file
    stereo = (rng.standard_normal((SR, 2)) * 8000).astype(np.int16)
    sp = str(d / "stereo.wav")
    wavfile.write(sp, SR, stereo)
    return paths, raws, sp, stereo


def test_native_lib_builds():
    assert native.available(), "g++ is in the image; the native lib must build"


def test_wav_info(wavs):
    paths, raws, _, _ = wavs
    n, sr, ch = native.wav_info(paths[2])
    assert (n, sr, ch) == (len(raws[2]), SR, 1)


def test_read_batch_matches_scipy(wavs):
    paths, raws, _, _ = wavs
    want = SR  # 1 s crop/pad
    out = native.read_batch(paths, want, n_threads=4)
    assert out.shape == (len(paths), want)
    for i, raw in enumerate(raws):
        expect = np.zeros(want, np.float32)
        chunk = raw[:want]
        expect[: len(chunk)] = chunk
        np.testing.assert_allclose(out[i], expect, atol=1e-6)


def test_read_batch_with_starts(wavs):
    paths, raws, _, _ = wavs
    starts = [100 * i for i in range(len(paths))]
    out = native.read_batch(paths, 500, starts=starts)
    for i, raw in enumerate(raws):
        expect = np.zeros(500, np.float32)
        chunk = raw[starts[i] : starts[i] + 500]
        expect[: len(chunk)] = chunk
        np.testing.assert_allclose(out[i], expect, atol=1e-6)


def test_stereo_downmix(wavs):
    _, _, sp, stereo = wavs
    out = native.read_batch([sp], SR)
    expect = stereo.astype(np.float32).mean(axis=1) / 32768.0
    np.testing.assert_allclose(out[0], expect, atol=1e-6)


def test_missing_file_raises(wavs):
    with pytest.raises(IOError):
        native.read_batch(["/nonexistent/x.wav"], 100)


def test_python_fallback_matches(wavs, monkeypatch):
    paths, _, _, _ = wavs
    fast = native.read_batch(paths, SR)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    slow = native.read_batch(paths, SR)
    np.testing.assert_allclose(fast, slow, atol=1e-6)
