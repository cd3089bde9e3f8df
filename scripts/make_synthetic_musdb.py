"""Zero-egress MUSDB18 stand-in: synthetic 4-stem music corpus.

Writes the decoded-directory layout `data/musdb.py` scans
(`root/{train,test}/<track>/{mixture,drums,bass,other,vocals}.wav`, the
standard musdb decode output; reference loader
`sudo_rm_rf/dnn/dataset_loader/musdb_dataset.py:86,154-166`). The real
MUSDB18 (150 pro tracks @ 44.1 kHz stereo) is unreachable in this
environment, so each stem family is synthesized to be spectrally and
temporally distinct — the separation task is real even if the music isn't:

  * drums  — kick (decaying 60 Hz sine bursts on the beat grid), snare
             (bandpassed noise bursts on the off-beats), closed hats
             (short high-noise ticks at 2x the beat rate);
  * bass   — root-note square-ish line (f0 50-110 Hz + odd harmonics)
             following a per-track 4-chord loop;
  * other  — sustained triads (3-5 harmonics per voice, slow vibrato,
             chorus detune) on the same chord loop;
  * vocals — the formant-synthesis pseudo-speech of
             `make_synthetic_corpus.py` (harmonic excitation + syllabic
             gating + formant resonators), pitch-tracked to the chord loop.

mixture.wav is the exact linear stem sum (musdb's construction). Mono,
--fs Hz (default 8000 to match the training pipeline).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.io import wavfile
from scipy.signal import lfilter

from make_synthetic_corpus import _resonator, make_speaker, synth_utterance

CHORD_POOL = [
    [0, 4, 7], [0, 3, 7], [0, 5, 9], [0, 4, 9],  # maj/min/sus-ish triads
]


def _note_hz(semitones_from_a1: float) -> float:
    return 55.0 * 2.0 ** (semitones_from_a1 / 12.0)


def _env(n, attack, decay, fs):
    a = min(int(attack * fs), n)
    e = np.ones(n, np.float32)
    if a > 0:
        e[:a] = np.linspace(0, 1, a)
    e *= np.exp(-np.arange(n) / (decay * fs)).astype(np.float32)
    return e


def synth_drums(rng, fs, n, bpm):
    beat = int(60.0 / bpm * fs)
    x = np.zeros(n, np.float32)
    for i in range(0, n, beat):  # kick on every beat
        m = min(int(0.12 * fs), n - i)
        tt = np.arange(m) / fs
        x[i : i + m] += 0.9 * np.sin(
            2 * np.pi * (60.0 * tt - 30.0 * tt * tt)
        ).astype(np.float32) * _env(m, 0.001, 0.05, fs)
    for i in range(beat // 2, n, beat):  # snare on off-beats
        m = min(int(0.08 * fs), n - i)
        noise = rng.standard_normal(m).astype(np.float32)
        b, a = _resonator(1800.0, 800.0, fs)
        x[i : i + m] += 0.5 * lfilter(b, a, noise).astype(
            np.float32
        ) * _env(m, 0.0005, 0.03, fs)
    for i in range(0, n, beat // 2):  # hats at 2x
        m = min(int(0.03 * fs), n - i)
        noise = rng.standard_normal(m).astype(np.float32)
        hp = noise - np.concatenate([[0.0], noise[:-1]])  # crude highpass
        x[i : i + m] += 0.25 * hp.astype(np.float32) * _env(m, 0.0002, 0.01, fs)
    return x


def synth_bass(rng, fs, n, bpm, chords, root):
    beat = int(60.0 / bpm * fs)
    bar = 4 * beat
    x = np.zeros(n, np.float32)
    for i in range(0, n, beat):
        chord = chords[(i // bar) % len(chords)]
        f0 = _note_hz(root + chord[0] - 12)  # root an octave down
        m = min(beat, n - i)
        tt = np.arange(m) / fs
        tone = sum(
            (1.0 / (2 * k + 1)) * np.sin(2 * np.pi * f0 * (2 * k + 1) * tt)
            for k in range(3)
        )
        x[i : i + m] += 0.7 * tone.astype(np.float32) * _env(m, 0.005, 0.4, fs)
    return x


def synth_other(rng, fs, n, bpm, chords, root):
    beat = int(60.0 / bpm * fs)
    bar = 4 * beat
    x = np.zeros(n, np.float32)
    for i in range(0, n, bar):
        chord = chords[(i // bar) % len(chords)]
        m = min(bar, n - i)
        tt = np.arange(m) / fs
        vib = 1.0 + 0.004 * np.sin(2 * np.pi * 5.0 * tt)
        seg = np.zeros(m, np.float32)
        for semi in chord:
            f0 = _note_hz(root + semi + 12)
            detune = 1.0 + rng.uniform(-0.002, 0.002)
            for h in range(1, 4):
                seg += (0.3 / h) * np.sin(
                    2 * np.pi * f0 * detune * h * tt * vib
                ).astype(np.float32)
        x[i : i + m] += seg * _env(m, 0.05, 2.0, fs)
    return x


def synth_vocals(rng, fs, n):
    spk = make_speaker(rng, fs)
    out = np.zeros(n, np.float32)
    pos = 0
    while pos < n:
        m = min(int(rng.uniform(2.0, 5.0) * fs), n - pos)
        out[pos : pos + m] = synth_utterance(spk, rng, fs, m)
        pos += m + int(rng.uniform(0.2, 1.0) * fs)
    return out


def write_track(track_dir, rng, fs, seconds):
    os.makedirs(track_dir, exist_ok=True)
    n = int(seconds * fs)
    bpm = float(rng.uniform(80, 140))
    root = float(rng.uniform(0, 12))
    chords = [CHORD_POOL[int(rng.integers(len(CHORD_POOL)))] for _ in range(4)]
    stems = {
        "drums": synth_drums(rng, fs, n, bpm),
        "bass": synth_bass(rng, fs, n, bpm, chords, root),
        "other": synth_other(rng, fs, n, bpm, chords, root),
        "vocals": synth_vocals(rng, fs, n),
    }
    gains = {"drums": 0.35, "bass": 0.3, "other": 0.25, "vocals": 0.4}
    mixture = np.zeros(n, np.float32)
    for name, wav in stems.items():
        peak = np.abs(wav).max() + 1e-9
        wav = (gains[name] * wav / peak).astype(np.float32)
        stems[name] = wav
        mixture += wav
    stems["mixture"] = mixture
    for name, wav in stems.items():
        wavfile.write(os.path.join(track_dir, f"{name}.wav"), fs,
                      (wav * 32000).astype(np.int16))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--train_tracks", type=int, default=60)
    p.add_argument("--test_tracks", type=int, default=12)
    p.add_argument("--fs", type=int, default=8000)
    p.add_argument("--seconds", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    for split, count, seed in (("train", args.train_tracks, args.seed),
                               ("test", args.test_tracks, args.seed + 1)):
        rng = np.random.default_rng(seed)
        for i in range(count):
            write_track(
                os.path.join(args.out, split, f"track{i:03d}"),
                rng, args.fs, args.seconds,
            )
    print(f"musdb stand-in written to {args.out}")


if __name__ == "__main__":
    main()
