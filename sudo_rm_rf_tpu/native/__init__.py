"""ctypes bindings for the native wav IO library (wavio.cpp).

Compiled on first use with the system toolchain (g++ is in the image) into
a per-user cache dir; every entry point degrades gracefully to the pure-
Python scipy path when the toolchain or the .so is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "wavio.cpp")


def _build_lib() -> Optional[str]:
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    cache = os.environ.get(
        "SUDO_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sudo_rm_rf_tpu"),
    )
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, f"libwavio_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-pthread", _SRC, "-o",
                 so_path + ".tmp"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(so_path + ".tmp", so_path)
            return so_path
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("SUDO_TPU_DISABLE_NATIVE"):
            return None
        so = _build_lib()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.wav_info.restype = ctypes.c_long
        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_read.restype = ctypes.c_long
        lib.wav_read.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.wav_read_batch.restype = ctypes.c_int
        lib.wav_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def wav_info(path: str) -> Tuple[int, int, int]:
    """(n_frames, sample_rate, channels) from the header only."""
    lib = get_lib()
    if lib is None:
        from sudo_rm_rf_tpu.data.base import read_wav

        sr, wav = read_wav(path)
        return wav.shape[0], sr, (wav.shape[1] if wav.ndim > 1 else 1)
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    n = lib.wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch))
    if n < 0:
        raise IOError(f"wav_info failed for {path} (code {n})")
    return int(n), int(sr.value), int(ch.value)


def read_batch(
    paths: Sequence[str],
    want: int,
    starts: Optional[Sequence[int]] = None,
    n_threads: int = 8,
) -> np.ndarray:
    """Decode n wavs into a (n, want) float32 mono array (crop/zero-pad).

    GIL-free parallel decode through the native library; falls back to a
    Python loop otherwise.
    """
    n = len(paths)
    out = np.empty((n, want), np.float32)
    lib = get_lib()
    if lib is None:
        from sudo_rm_rf_tpu.data.base import read_wav

        for i, p in enumerate(paths):
            _, wav = read_wav(p)
            if wav.ndim > 1:
                wav = wav.mean(axis=-1)
            s = starts[i] if starts is not None else 0
            chunk = wav[s : s + want]
            row = np.zeros(want, np.float32)
            row[: chunk.shape[0]] = chunk
            out[i] = row
        return out

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_starts = None
    if starts is not None:
        c_starts = (ctypes.c_long * n)(*[int(s) for s in starts])
    totals = (ctypes.c_long * n)()
    bad = lib.wav_read_batch(
        c_paths,
        c_starts,
        n,
        want,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        totals,
        n_threads,
    )
    if bad:
        for i in range(n):
            if totals[i] < 0:
                raise IOError(f"native wav decode failed: {paths[i]} "
                              f"(code {totals[i]})")
    return out
