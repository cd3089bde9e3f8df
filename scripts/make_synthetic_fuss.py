"""Generate a synthetic FUSS-style universal-separation corpus.

Zero-egress stand-in for FUSS (`fuss.py:64-94` layout: a
``{split}_example_list.txt`` whose lines are ``mixture src1 src2 ...``
relative wav paths, 16 kHz, 1-4 sources per example). Sources are drawn
from five acoustically distinct families — formant voices, harmonic tones,
gated filtered noise, repeating chirps, percussive click trains — so
mixtures are genuinely separable by spectro-temporal structure and the
variable-source-count / silent-slot semantics of the zero-reference SNR
loss are exercised for real.

Usage:
    python scripts/make_synthetic_fuss.py --out .artifacts/fuss \
        --n_train 3000 --n_val 480 --n_eval 480 --seconds 4.0
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.io import wavfile
from scipy.signal import lfilter

from make_synthetic_corpus import make_speaker, synth_utterance

FS = 16000  # the FUSS loader accepts 16 kHz only (`fuss.py:64-65`)


def _env_gates(rng, n, rate_hz, p_on=0.7, smooth_s=0.02):
    n_seg = max(int(rate_hz * n / FS), 1)
    gates = (rng.random(n_seg + 1) < p_on) * rng.uniform(0.3, 1.0, n_seg + 1)
    env = np.interp(np.arange(n), np.linspace(0, n - 1, n_seg + 1), gates)
    win = max(int(smooth_s * FS), 1)
    return np.convolve(env, np.ones(win) / win, mode="same").astype(np.float32)


def synth_voice(rng, n):
    spk = make_speaker(rng, FS)
    return synth_utterance(spk, rng, FS, n)


def synth_tone(rng, n):
    t = np.arange(n) / FS
    f0 = rng.uniform(200, 1200)
    vib = 1 + 0.01 * np.sin(2 * np.pi * rng.uniform(4, 7) * t)
    x = sum(
        rng.uniform(0.2, 1.0) / (k + 1)
        * np.sin(2 * np.pi * f0 * (k + 1) * vib * t + rng.uniform(0, 6.28))
        for k in range(5)
    )
    return (x * _env_gates(rng, n, rng.uniform(0.5, 2.0))).astype(np.float32)


def synth_noiseband(rng, n):
    x = rng.standard_normal(n).astype(np.float32)
    # 2nd-order resonator band-pass at a random center
    fc, bw = rng.uniform(500, 6000), rng.uniform(200, 800)
    r = np.exp(-np.pi * bw / FS)
    a = [1.0, -2 * r * np.cos(2 * np.pi * fc / FS), r * r]
    x = lfilter([1.0], a, x).astype(np.float32)
    return x * _env_gates(rng, n, rng.uniform(1.0, 4.0), p_on=0.5)


def synth_chirp(rng, n):
    t = np.arange(n) / FS
    period = rng.uniform(0.4, 1.2)
    f_lo, f_hi = rng.uniform(300, 800), rng.uniform(2000, 7000)
    phase_t = (t % period) / period
    f = f_lo * (f_hi / f_lo) ** phase_t
    phase = 2 * np.pi * np.cumsum(f) / FS
    return (np.sin(phase) * _env_gates(rng, n, 1.0 / period)).astype(np.float32)


def synth_clicks(rng, n):
    x = np.zeros(n, np.float32)
    n_clicks = rng.integers(4, 20)
    decay = np.exp(-np.arange(int(0.05 * FS)) / (rng.uniform(0.002, 0.01) * FS))
    for _ in range(n_clicks):
        pos = rng.integers(0, n - len(decay))
        x[pos : pos + len(decay)] += rng.uniform(0.3, 1.0) * decay.astype(
            np.float32
        ) * rng.choice([-1, 1])
    fc = rng.uniform(1000, 7000)
    r = np.exp(-np.pi * 600 / FS)
    a = [1.0, -2 * r * np.cos(2 * np.pi * fc / FS), r * r]
    return lfilter([1.0], a, x).astype(np.float32)


FAMILIES = [synth_voice, synth_tone, synth_noiseband, synth_chirp, synth_clicks]


def _write_wav(path, x):
    peak = np.abs(x).max() + 1e-9
    wavfile.write(path, FS, (x / peak * 0.9 * 32767).astype(np.int16))


def build_split(root, split, n_examples, seconds, seed, max_sources=4):
    rng = np.random.default_rng(seed)
    n = int(seconds * FS)
    os.makedirs(os.path.join(root, split), exist_ok=True)
    lines = []
    for i in range(n_examples):
        if split == "train":
            # uniform 1..max (FUSS has a tail of 1-2 source examples)
            n_src = int(rng.integers(1, max_sources + 1))
        else:
            # balanced counts so every per-count val generator is non-empty
            n_src = 1 + i % max_sources
        fams = rng.choice(len(FAMILIES), size=n_src, replace=False)
        srcs = [FAMILIES[f](rng, n) for f in fams]
        srcs = [
            s / (np.sqrt(np.mean(s**2)) + 1e-9) * rng.uniform(0.3, 1.0)
            for s in srcs
        ]
        names = []
        for k, s in enumerate(srcs):
            rel = f"{split}/ex{i:05d}_src{k}.wav"
            _write_wav(os.path.join(root, rel), s)
            names.append(rel)
        mix_rel = f"{split}/ex{i:05d}_mix.wav"
        _write_wav(os.path.join(root, mix_rel), np.sum(srcs, axis=0))
        lines.append(" ".join([mix_rel] + names))
    with open(os.path.join(root, f"{split}_example_list.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n_train", type=int, default=3000)
    p.add_argument("--n_val", type=int, default=480)
    p.add_argument("--n_eval", type=int, default=480)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--max_sources", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    build_split(args.out, "train", args.n_train, args.seconds, args.seed,
                args.max_sources)
    build_split(args.out, "validation", args.n_val, args.seconds,
                args.seed + 1, args.max_sources)
    build_split(args.out, "eval", args.n_eval, args.seconds, args.seed + 2,
                args.max_sources)
    print(f"FUSS-style corpus written to {args.out}")


if __name__ == "__main__":
    main()
