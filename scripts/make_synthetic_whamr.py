"""Generate a synthetic WHAMR!-style corpus (reverberant pairs + noise).

Zero-egress stand-in for WHAMR! with the exact on-disk layout the loader
scans (`data/whamr.py`, mirroring `whamr.py:25-35`):
``{out}/wav8k/min/{tr,cv,tt}/{s1_reverb,s2_reverb,s1_anechoic,s2_anechoic,
noise,mix_both_reverb,mix_both_anechoic}/*.wav``.

Each pair: two synthetic speakers (scripts/make_synthetic_corpus.py
source-filter voices), each convolved with its own synthetic room impulse
response (direct path + sparse early reflections + exponentially decaying
diffuse tail, RT60 0.1-0.5 s), plus band-limited background noise at a
random SNR. Targets are the anechoic sources; inputs the reverberant ones —
the `noisy_reverberant` training task of `run_improved_sudormrf_reverb.py`.

Usage:
    python scripts/make_synthetic_whamr.py --out .artifacts/whamr \
        --n_train 3000 --n_val 600 --n_test 600
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.io import wavfile
from scipy.signal import fftconvolve, lfilter

from make_synthetic_corpus import make_speaker, synth_utterance

FS = 8000
DIRS = [
    "s1_reverb", "s2_reverb", "s1_anechoic", "s2_anechoic", "noise",
    "mix_both_reverb", "mix_both_anechoic",
]


def synth_rir(rng, rt60_s, n_taps=2048):
    """Direct path + sparse early reflections + diffuse exponential tail."""
    rir = np.zeros(n_taps, np.float32)
    rir[0] = 1.0
    for _ in range(rng.integers(3, 8)):  # early reflections < 20 ms
        rir[rng.integers(8, int(0.02 * FS))] += rng.uniform(-0.5, 0.5)
    t = np.arange(n_taps) / FS
    tail = rng.standard_normal(n_taps).astype(np.float32) * np.exp(
        -6.91 * t / rt60_s
    )
    tail[: int(0.004 * FS)] = 0.0
    rir += 0.4 * tail
    return rir / (np.abs(rir).max() + 1e-9)


def synth_noise(rng, n):
    x = rng.standard_normal(n).astype(np.float32)
    # pink-ish tilt: one-pole lowpass mixed with the raw noise
    lp = lfilter([1.0], [1.0, -0.95], x).astype(np.float32)
    x = 0.3 * x + lp / (np.abs(lp).max() + 1e-9)
    return x


def _write(root, split, d, name, x):
    path = os.path.join(root, "wav8k", "min", split, d)
    os.makedirs(path, exist_ok=True)
    peak = np.abs(x).max() + 1e-9
    wavfile.write(
        os.path.join(path, name), FS, (x / peak * 0.9 * 32767).astype(np.int16)
    )


def build_split(root, split, n_pairs, seconds, seed):
    rng = np.random.default_rng(seed)
    n = int(seconds * FS)
    for i in range(n_pairs):
        name = f"p{i:05d}.wav"
        anech, reverb = [], []
        for _ in range(2):
            spk = make_speaker(rng, FS)
            dry = synth_utterance(spk, rng, FS, n)
            rir = synth_rir(rng, rng.uniform(0.1, 0.5))
            wet = fftconvolve(dry, rir)[:n].astype(np.float32)
            anech.append(dry / (np.sqrt(np.mean(dry**2)) + 1e-9))
            reverb.append(wet / (np.sqrt(np.mean(wet**2)) + 1e-9))
        noise = synth_noise(rng, n)
        # noise at a random SNR in [5, 20] dB vs the reverberant speech sum
        sp_pow = np.mean((reverb[0] + reverb[1]) ** 2)
        snr_db = rng.uniform(5.0, 20.0)
        noise *= np.sqrt(sp_pow / (np.mean(noise**2) + 1e-12) / 10 ** (snr_db / 10))
        _write(root, split, "s1_anechoic", name, anech[0])
        _write(root, split, "s2_anechoic", name, anech[1])
        _write(root, split, "s1_reverb", name, reverb[0])
        _write(root, split, "s2_reverb", name, reverb[1])
        _write(root, split, "noise", name, noise)
        _write(root, split, "mix_both_reverb", name,
               reverb[0] + reverb[1] + noise)
        _write(root, split, "mix_both_anechoic", name,
               anech[0] + anech[1] + noise)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n_train", type=int, default=3000)
    p.add_argument("--n_val", type=int, default=600)
    p.add_argument("--n_test", type=int, default=600)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    build_split(args.out, "tr", args.n_train, args.seconds, args.seed)
    build_split(args.out, "cv", args.n_val, args.seconds, args.seed + 1)
    build_split(args.out, "tt", args.n_test, args.seconds, args.seed + 2)
    print(f"WHAMR-style corpus written to {args.out}")


if __name__ == "__main__":
    main()
