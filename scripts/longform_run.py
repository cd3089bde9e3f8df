"""Long-form at-scale run: one N-minute recording separated on chip.

`scripts/bench_longform.py` measures throughput on random init/noise; this
driver produces the *run artifact* the bench alone cannot: a genuinely long
mixture built from held-out synthetic-corpus speakers, separated by the
TRAINED flagship checkpoint with both long-context engines, scored against
ground truth.

  * `OverlapAddSeparator` — COLA 4 s chunks, per-chunk PIT realignment
    (the approximate engine the reference would need too; upstream has no
    long-form path at all — `run_improved_sudormrf.py` trains/evaluates on
    4 s crops only).
  * `SequenceParallelSeparator` — the exact single pass (1-shard degenerate
    mesh on one chip; on a pod slice the time axis splits n ways — exactness
    under sharding is asserted in tests/test_sequence_parallel.py).

Writes docs/runs/longform_u16/summary.json (+README) with per-engine
SI-SDRi vs ground truth, wall-clock, and audio-seconds/second.

Usage:
    python scripts/longform_run.py \
        --checkpoint .artifacts/ckpt/improved_u16_synth_full/improved_u16_synth_full/best_* \
        [--minutes 10] [--corpus .artifacts/corpus/test] [--out docs/runs/longform_u16]
"""

from __future__ import annotations

import argparse
import glob
import itertools
import json
import os
import time

import joblib
import numpy as np


def _si_sdr(est: np.ndarray, ref: np.ndarray, eps: float = 1e-8) -> float:
    est = est - est.mean()
    ref = ref - ref.mean()
    a = float(np.dot(est, ref) / (np.dot(ref, ref) + eps))
    target = a * ref
    noise = est - target
    return float(10.0 * np.log10(
        (np.dot(target, target) + eps) / (np.dot(noise, noise) + eps)
    ))


def pit_si_sdri(est: np.ndarray, refs: np.ndarray, mixture: np.ndarray):
    """Best-permutation SI-SDR improvement of (S,T) estimates vs refs."""
    n = refs.shape[0]
    best = max(
        np.mean([_si_sdr(est[p[i]], refs[i]) for i in range(n)])
        for p in itertools.permutations(range(n))
    )
    base = np.mean([_si_sdr(mixture, refs[i]) for i in range(n)])
    return float(best), float(best - base)


def build_long_sources(corpus: str, seconds: float, fs: int,
                       speakers=("spk000", "spk001")) -> np.ndarray:
    """Concatenate a speaker's held-out utterances into one long stream."""
    t = int(seconds * fs)
    streams = []
    for spk in speakers:
        utts = sorted(glob.glob(os.path.join(corpus, spk, "utt*", "wav")))
        if not utts:
            raise SystemExit(f"no utterances under {corpus}/{spk}")
        parts, total = [], 0
        for path in itertools.cycle(utts):
            wav = np.asarray(joblib.load(path), dtype=np.float32).reshape(-1)
            parts.append(wav)
            total += wav.shape[-1]
            if total >= t:
                break
        stream = np.concatenate(parts)[:t]
        # unit-variance per speaker => 0 dB long-term mixing SNR
        stream = (stream - stream.mean()) / (stream.std() + 1e-9)
        streams.append(stream)
    return np.stack(streams)  # (S, T)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--minutes", type=float, default=10.0)
    p.add_argument("-fs", type=int, default=8000)
    p.add_argument("--corpus", default=".artifacts/corpus/test")
    p.add_argument("--out", default="docs/runs/longform_u16")
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--engines", default="overlap_add,seq_parallel")
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.convert.flax_checkpoint import (
        load_params_from_checkpoint,
    )
    from sudo_rm_rf_tpu.inference import (
        OverlapAddSeparator,
        SequenceParallelSeparator,
        make_seq_mesh,
    )
    from sudo_rm_rf_tpu.models.fast_inference import improved_forward_fast

    ckpt = sorted(glob.glob(args.checkpoint))
    ckpt = [c for c in ckpt if not c.endswith(".json")]
    if not ckpt:
        raise SystemExit(f"no checkpoint matches {args.checkpoint}")
    ckpt = ckpt[-1]

    hp = dict(out_channels=256, in_channels=512, num_blocks=16,
              upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
              num_sources=2)
    model = models.get_model("relu", **hp)
    init_t = (hp["enc_kernel_size"] // 2) * 2 ** hp["upsampling_depth"] * 10
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, init_t)))["params"]
    params = load_params_from_checkpoint(ckpt, params)

    seconds = args.minutes * 60.0
    sources = build_long_sources(args.corpus, seconds, args.fs)
    mixture = sources.sum(axis=0)

    def fast(p_, v):
        return improved_forward_fast(
            p_, v, num_blocks=hp["num_blocks"],
            upsampling_depth=hp["upsampling_depth"],
            enc_kernel_size=hp["enc_kernel_size"], num_sources=2,
            impl="fma", compute_dtype=args.compute_dtype,
        )

    engines = {}
    want = set(args.engines.split(","))
    if "overlap_add" in want:
        engines["overlap_add"] = OverlapAddSeparator(
            model, params, chunk_samples=4 * args.fs, num_sources=2,
            batch_chunks=8, forward_fn=fast,
        )
    if "seq_parallel" in want:
        engines["seq_parallel"] = SequenceParallelSeparator(
            params, mesh=make_seq_mesh(),
            num_blocks=hp["num_blocks"],
            upsampling_depth=hp["upsampling_depth"],
            enc_kernel_size=hp["enc_kernel_size"], num_sources=2,
            model_type="relu", compute_dtype=args.compute_dtype,
        )

    rows = {}
    for name, sep in engines.items():
        est = np.asarray(sep.separate(mixture))  # warmup/compile
        if est.ndim == 3:
            est = est[0]
        assert np.isfinite(est).all(), f"{name}: non-finite output"
        t0 = time.perf_counter()
        for _ in range(args.reps):
            sep.separate(mixture)
        dt = (time.perf_counter() - t0) / args.reps
        sisdr, sisdri = pit_si_sdri(est, sources, mixture)
        rows[name] = {
            "si_sdr_db": round(sisdr, 3),
            "si_sdri_db": round(sisdri, 3),
            "seconds_per_recording": round(dt, 2),
            "audio_sec_per_sec": round(seconds / dt, 1),
        }
        print(json.dumps({"engine": name, **rows[name]}))

    summary = {
        "model": "improved U16/512 (relu)",
        "checkpoint": ckpt,
        "recording_minutes": args.minutes,
        "fs": args.fs,
        "compute_dtype": args.compute_dtype,
        "n_devices": len(jax.devices()),
        "corpus": args.corpus,
        "engines": rows,
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print("wrote", os.path.join(args.out, "summary.json"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
