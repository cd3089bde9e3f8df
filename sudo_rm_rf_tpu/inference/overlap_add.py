"""Overlap-add chunked inference for arbitrarily long recordings.

A capability the reference does NOT have: its eval path runs whole
utterances at batch size 1 (`simple_whamr_evaluation.py:138-151`), which
breaks down for long recordings (memory) and recompiles per length under
XLA. Here:

  * the recording is cut into fixed-length 50%-overlapping chunks, so the
    model compiles ONCE for a single static (batch_chunks, 1, chunk) shape;
  * chunks are processed in fixed-size batches (continuous batching across
    arbitrarily many chunks);
  * each chunk is standardized before the model and de-standardized after
    (the README inference recipe, `README.md:100-109`);
  * source permutations are re-aligned between consecutive chunks by
    maximizing overlap correlation (PIT models may swap source order
    chunk-to-chunk);
  * chunks are blended with a Hann window (COLA at 50% hop);
  * with a device mesh, chunk batches are sharded over the ``data`` axis —
    multi-chip serving of one long recording (the reference's serving story
    is single-GPU only).
"""

from __future__ import annotations

import itertools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _hann(n: int) -> np.ndarray:
    # periodic Hann: COLA (sums to 1) at hop n//2
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


class OverlapAddSeparator:
    """Stream a long mixture through a fixed-shape jitted separator.

    Args:
      model: flax module (B, 1, T) -> (B, S, T).
      params: model params pytree.
      chunk_samples: model input length per chunk (e.g. 4 s * fs).
      batch_chunks: chunks processed per device step (static batch).
      mixture_consistency: optional 'uniform'/'magsq' projection per chunk
        (applied for GroupComm models per `README.md:111-114`).
      mesh: optional jax.sharding.Mesh; chunk batches are sharded over its
        ``data`` axis (params replicated), so one long recording is served
        by all chips. batch_chunks is rounded up to a mesh multiple.
    """

    def __init__(
        self,
        model,
        params,
        chunk_samples: int,
        num_sources: int = 2,
        batch_chunks: int = 8,
        mixture_consistency: Optional[str] = None,
        input_normalize: bool = True,
        forward_fn: Optional[Callable] = None,
        mesh=None,
    ):
        """forward_fn(params, (B,1,T)) -> (B,S,T) overrides model.apply —
        e.g. models.fast_inference.improved_forward_fast with impl='fma'."""
        self.model = model
        self._apply = forward_fn or (
            lambda p, v: model.apply({"params": p}, v)
        )
        self.params = params
        self.chunk = int(chunk_samples)
        self.hop = self.chunk // 2
        self.num_sources = num_sources
        self.mesh = mesh
        if mesh is not None:
            from sudo_rm_rf_tpu.parallel.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            batch_chunks = -(-batch_chunks // n_data) * n_data
        self.batch_chunks = batch_chunks
        self.window = _hann(self.chunk).astype(np.float32)
        self.input_normalize = input_normalize
        self.mixture_consistency = mixture_consistency
        self._perms = list(itertools.permutations(range(num_sources)))

        def _forward(params, chunks):  # (B, chunk)
            x = chunks
            if self.input_normalize:
                mean = jnp.mean(x, axis=-1, keepdims=True)
                std = jnp.std(x, axis=-1, keepdims=True, ddof=1)
                xn = (x - mean) / (std + 1e-9)
            else:
                mean = jnp.zeros_like(x[..., :1])
                std = jnp.ones_like(x[..., :1])
                xn = x
            est = self._apply(params, xn[:, None, :])
            if self.mixture_consistency is not None:
                from sudo_rm_rf_tpu.losses import mixture_consistency as mc

                est = mc(est, xn[:, None, :], self.mixture_consistency)
            # de-standardize back to the input scale (`README.md:108-109`)
            return est * std[:, None, :] + mean[:, None, :]

        if mesh is None:
            self._forward = jax.jit(_forward)
        else:
            from sudo_rm_rf_tpu.parallel.mesh import (
                batch_sharding, replicated_sharding,
            )

            # params replicated, chunk batch split over the data axis;
            # results gathered back replicated for the host-side blend.
            self._forward = jax.jit(
                _forward,
                in_shardings=(replicated_sharding(mesh),
                              batch_sharding(mesh, ndim=2)),
                out_shardings=replicated_sharding(mesh),
            )

    def _run_chunks(self, frames: np.ndarray) -> np.ndarray:
        """(n_chunks, chunk) -> (n_chunks, S, chunk), batched at a static size."""
        n = frames.shape[0]
        outs = []
        for start in range(0, n, self.batch_chunks):
            batch = frames[start : start + self.batch_chunks]
            pad = self.batch_chunks - batch.shape[0]
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad, self.chunk), np.float32)], axis=0
                )
            est = np.asarray(self._forward(self.params, jnp.asarray(batch)))
            outs.append(est[: batch.shape[0] - pad if pad else self.batch_chunks])
        return np.concatenate(outs, axis=0)

    def _align(self, prev_tail: np.ndarray, est: np.ndarray) -> np.ndarray:
        """Pick the source permutation of `est` best correlated with the
        previous chunk's overlapping tail. prev_tail/est-head: (S, hop)."""
        head = est[:, : self.hop]
        best_perm, best_score = None, -np.inf
        for perm in self._perms:
            score = sum(
                float(np.dot(prev_tail[s], head[perm[s]]))
                for s in range(self.num_sources)
            )
            if score > best_score:
                best_score, best_perm = score, perm
        return est[list(best_perm)]

    def separate(self, mixture: np.ndarray) -> np.ndarray:
        """(T,) mixture -> (S, T) separated sources."""
        mixture = np.asarray(mixture, np.float32).reshape(-1)
        t = mixture.shape[0]
        if t <= self.chunk:
            padded = np.zeros(self.chunk, np.float32)
            padded[:t] = mixture
            est = self._run_chunks(padded[None])[0]
            return est[:, :t]

        n_chunks = -(-(t - self.chunk) // self.hop) + 1
        total = (n_chunks - 1) * self.hop + self.chunk
        padded = np.zeros(total, np.float32)
        padded[:t] = mixture
        idx = np.arange(self.chunk)[None, :] + self.hop * np.arange(n_chunks)[:, None]
        frames = padded[idx]  # (n_chunks, chunk)

        est = self._run_chunks(frames)  # (n_chunks, S, chunk)

        out = np.zeros((self.num_sources, total), np.float32)
        norm = np.zeros(total, np.float32)
        prev = None
        for c in range(n_chunks):
            cur = est[c]
            if prev is not None:
                prev_tail = prev[:, -self.hop :]
                cur = self._align(prev_tail, cur)
            start = c * self.hop
            # first/last chunks keep full weight at the borders (no fade
            # where there is no partner chunk)
            w = self.window.copy()
            if c == 0:
                w[: self.hop] = 1.0
            if c == n_chunks - 1:
                w[self.hop :] = 1.0
            out[:, start : start + self.chunk] += cur * w
            norm[start : start + self.chunk] += w
            prev = cur
        out /= np.maximum(norm, 1e-8)
        return out[:, :t]


def separate_file(
    model,
    params,
    in_path: str,
    out_dir: str,
    fs: int = 8000,
    chunk_seconds: float = 4.0,
    num_sources: int = 2,
    **kwargs,
):
    """Read a wav, separate it, write <stem>_s{i}.wav files."""
    import os

    from sudo_rm_rf_tpu.data.base import read_wav
    from scipy.io import wavfile

    sr, wav = read_wav(in_path)
    if sr != fs:
        raise ValueError(f"{in_path}: sample rate {sr} != expected {fs}")
    sep = OverlapAddSeparator(
        model, params, chunk_samples=int(chunk_seconds * fs),
        num_sources=num_sources, **kwargs,
    )
    est = sep.separate(wav)
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(in_path))[0]
    paths = []
    for s in range(est.shape[0]):
        out = est[s]
        peak = np.abs(out).max()
        if peak > 1.0:
            out = out / peak
        path = os.path.join(out_dir, f"{stem}_s{s + 1}.wav")
        wavfile.write(path, fs, (out * 32767).astype(np.int16))
        paths.append(path)
    return paths
