"""Dataset plumbing shared by all loaders.

Reference pattern: `sudo_rm_rf/dnn/dataset_loader/abstract_dataset.py:12-60`
(validated kwargs) plus the per-loader conventions — wav-length metadata
pickle cache next to the data (`libri2mix.py:110-129`), fixed-length
zero-pad/crop (`libri2mix.py:153-162`), per-sample standardization
(`wham.py:50-55`).
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import numpy as np


class DatasetConfigError(ValueError):
    pass


def check_arg(
    kwargs: dict,
    name: str,
    known_type: type,
    choices: Optional[Iterable] = None,
    extra_checks: Sequence[Callable] = (),
    default=None,
):
    """Validated-kwarg accessor (the reference's poor-man's config schema,
    `abstract_dataset.py:13-60`)."""
    if name not in kwargs:
        if default is not None:
            return default
        raise DatasetConfigError(f"missing required dataset argument {name!r}")
    value = kwargs[name]
    if not isinstance(value, known_type):
        raise DatasetConfigError(
            f"argument {name!r} must be {known_type.__name__}, got "
            f"{type(value).__name__}"
        )
    if choices is not None and value not in list(choices):
        raise DatasetConfigError(
            f"argument {name!r} must be one of {sorted(map(str, choices))}, "
            f"got {value!r}"
        )
    for check in extra_checks:
        if not check(value):
            raise DatasetConfigError(f"argument {name!r}={value!r} failed validation")
    return value


def read_wav(path: str) -> Tuple[int, np.ndarray]:
    """Read a wav file to float32 (int PCM scaled by dtype max like librosa;
    float wavs passed through)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return sr, data


def read_wav_window(path: str, start: int, want: int) -> np.ndarray:
    """Read `want` mono float32 samples starting at `start` (zero-padded past
    EOF) — through the native decoder when available, decoding only the
    window instead of the whole file."""
    from sudo_rm_rf_tpu import native

    lib = native.get_lib()
    if lib is not None:
        return native.read_batch([path], want, starts=[start])[0]
    _, wav = read_wav(path)
    if wav.ndim > 1:
        wav = wav.mean(axis=-1)
    out = np.zeros(want, np.float32)
    chunk = wav[start : start + want]
    out[: chunk.shape[0]] = chunk
    return out


def wav_frames(path: str) -> int:
    """Number of frames, header-only when the native lib is available."""
    from sudo_rm_rf_tpu import native

    lib = native.get_lib()
    if lib is not None:
        n, _, _ = native.wav_info(path)
        return n
    _, wav = read_wav(path)
    return wav.shape[0]


def normalize_wav(wav: np.ndarray, eps: float = 1e-8, std=None) -> np.ndarray:
    """(x - mean) / (std + eps); std defaults to the wav's own (ddof=1 to
    match torch.std, `wham.py:50-55`)."""
    mean = wav.mean(axis=-1, keepdims=True)
    if std is None:
        std = wav.std(axis=-1, keepdims=True, ddof=1)
    return (wav - mean) / (std + eps)


def safe_pad(wav: np.ndarray, time_samples: int, zero_pad: bool) -> np.ndarray:
    """Crop to time_samples; zero-pad first if shorter and allowed
    (`libri2mix.py:153-162`)."""
    if zero_pad and wav.shape[-1] < time_samples:
        out = np.zeros(wav.shape[:-1] + (time_samples,), np.float32)
        out[..., : wav.shape[-1]] = wav
        return out
    return wav[..., :time_samples]


def length_metadata(
    dirpath: str,
    wav_paths: List[str],
    cache_name: str = "metadata",
    expected_sr: Optional[int] = None,
) -> List[Tuple[str, int]]:
    """(basename, n_samples) for every wav, cached in a pickle next to the
    data (`libri2mix.py:110-129`). Cache is keyed only by existence, like
    the reference."""
    cache_path = os.path.join(dirpath, cache_name)
    if os.path.lexists(cache_path):
        with open(cache_path, "rb") as fh:
            return pickle.load(fh)

    from sudo_rm_rf_tpu import native

    lib = native.get_lib()
    info = []
    for p in sorted(wav_paths):
        if lib is not None:  # header-only probe: no decode
            n, sr, _ = native.wav_info(p)
        else:
            sr, wav = read_wav(p)
            n = wav.shape[-1]
        if expected_sr is not None and sr != expected_sr:
            raise DatasetConfigError(
                f"{p}: sample rate {sr} != expected {expected_sr}"
            )
        info.append((os.path.basename(p), n))
    try:
        with open(cache_path, "wb") as fh:
            pickle.dump(info, fh)
    except OSError:
        pass  # read-only dataset dirs: just skip the cache
    return info
