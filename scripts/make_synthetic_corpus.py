"""Generate a synthetic multi-speaker corpus in the hierarchical layout.

Zero-egress stand-in for the wsj0-mix hierarchical speaker corpus
(`create_wsj0mix_hier_speakers.py:214-263` layout: class folder = speaker,
one joblib'd energy-normalized ``wav`` per utterance folder): each synthetic
"speaker" is a source-filter voice — a fixed vocal-tract resonator cascade
(speaker-specific formants) excited by a pitch-contoured impulse train with
syllabic voicing gates — so mixtures of two different speakers are genuinely
separable by spectro-temporal structure, unlike white-noise sources.

Usage:
    python scripts/make_synthetic_corpus.py --out /path/corpus \
        --train_speakers 40 --utts 60 --fs 8000 --seconds 4.0
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.signal import lfilter

from sudo_rm_rf_tpu.prep.hierarchical import _dump_sample


def _resonator(f_hz: float, bw_hz: float, fs: int):
    """2nd-order all-pole resonator coefficients (formant filter)."""
    r = np.exp(-np.pi * bw_hz / fs)
    theta = 2 * np.pi * f_hz / fs
    return [1.0], [1.0, -2 * r * np.cos(theta), r * r]


def make_speaker(rng: np.random.Generator, fs: int):
    """Sample speaker-level parameters."""
    return {
        "f0": float(rng.uniform(85, 280)),
        "formants": [
            (float(rng.uniform(280, 900)), float(rng.uniform(60, 120))),
            (float(rng.uniform(900, 2300)), float(rng.uniform(80, 160))),
            (float(rng.uniform(2300, 3300)), float(rng.uniform(100, 200))),
        ],
        "breathiness": float(rng.uniform(0.02, 0.12)),
        "syllable_rate": float(rng.uniform(2.5, 5.5)),
    }


def synth_utterance(spk: dict, rng: np.random.Generator, fs: int, n: int):
    t = np.arange(n) / fs
    # pitch contour: slow random walk + vibrato around the speaker F0
    drift = np.cumsum(rng.standard_normal(n)) / fs
    drift = drift / (np.abs(drift).max() + 1e-9) * spk["f0"] * 0.15
    f0 = spk["f0"] + drift + 3.0 * np.sin(2 * np.pi * 5.5 * t)
    # glottal impulse train via phase accumulation
    phase = np.cumsum(f0) / fs
    excitation = np.zeros(n, np.float32)
    excitation[np.diff(np.floor(phase), prepend=0.0) > 0] = 1.0
    excitation += spk["breathiness"] * rng.standard_normal(n).astype(np.float32)
    # syllabic voicing gate: smoothed random on/off at the syllable rate
    n_syl = max(int(spk["syllable_rate"] * n / fs), 1)
    gates = (rng.random(n_syl + 1) > 0.25).astype(np.float32) * rng.uniform(
        0.4, 1.0, n_syl + 1
    )
    env = np.interp(np.arange(n), np.linspace(0, n - 1, n_syl + 1), gates)
    # `mode="same"` returns max(len(env), win) samples, so a segment shorter
    # than the 20 ms smoothing window would come back win-long; clamp.
    win = max(1, min(int(0.02 * fs), n))
    env = np.convolve(env, np.ones(win) / win, mode="same").astype(np.float32)
    x = excitation * env
    for f_hz, bw in spk["formants"]:
        b, a = _resonator(f_hz, bw, fs)
        x = lfilter(b, a, x).astype(np.float32)
    x = np.diff(x, prepend=0.0).astype(np.float32)  # lip radiation
    peak = np.abs(x).max() + 1e-9
    return (x / peak).astype(np.float32)


def build_split(out_dir: str, n_speakers: int, n_utts: int, fs: int,
                seconds: float, seed: int):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    for s in range(n_speakers):
        spk = make_speaker(rng, fs)
        for u in range(n_utts):
            wav = synth_utterance(spk, rng, fs, n)
            _dump_sample(
                os.path.join(out_dir, f"spk{s:03d}", f"utt{u:03d}"), wav
            )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--train_speakers", type=int, default=40)
    p.add_argument("--val_speakers", type=int, default=10)
    p.add_argument("--test_speakers", type=int, default=10)
    p.add_argument("--utts", type=int, default=60)
    p.add_argument("--val_utts", type=int, default=20)
    p.add_argument("--fs", type=int, default=8000)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    build_split(os.path.join(args.out, "train"), args.train_speakers,
                args.utts, args.fs, args.seconds, args.seed)
    build_split(os.path.join(args.out, "val"), args.val_speakers,
                args.val_utts, args.fs, args.seconds, args.seed + 1)
    build_split(os.path.join(args.out, "test"), args.test_speakers,
                args.val_utts, args.fs, args.seconds, args.seed + 2)
    print(f"corpus written to {args.out}")


if __name__ == "__main__":
    main()
