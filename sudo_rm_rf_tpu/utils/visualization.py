"""Mask / learned-basis visualization.

Reference: `sudo_rm_rf/dnn/utils/cometml_learned_masks.py:63-96` — heatmaps
of estimated masks and encoder/decoder bases uploaded per epoch. Here they
render to local PNGs (matplotlib-gated) and optionally upload through the
ExperimentLogger's comet backend.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def save_heatmap(
    array: np.ndarray,
    path: str,
    title: str = "",
    xlabel: str = "time frames",
    ylabel: str = "basis index",
) -> Optional[str]:
    """2-D heatmap PNG; returns the path or None if matplotlib is missing."""
    plt = _plt()
    if plt is None:
        return None
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 4))
    im = ax.imshow(np.asarray(array), aspect="auto", origin="lower",
                   interpolation="nearest")
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def log_masks_and_bases(
    out_dir: str,
    masks: Optional[np.ndarray] = None,  # (S, N, T) post-nonlinearity masks
    encoder_basis: Optional[np.ndarray] = None,  # (N, 1, L) conv weights
    decoder_basis: Optional[np.ndarray] = None,  # (N*S, S, L) or similar
    step: int = 0,
    experiment=None,
):
    """Render per-source masks and the learned filterbanks."""
    paths = []
    if masks is not None:
        for s in range(masks.shape[0]):
            p = save_heatmap(
                masks[s], os.path.join(out_dir, f"mask_s{s + 1}_step{step}.png"),
                title=f"estimated mask, source {s + 1}",
            )
            if p:
                paths.append(p)
    if encoder_basis is not None:
        w = np.asarray(encoder_basis).reshape(encoder_basis.shape[0], -1)
        p = save_heatmap(
            w, os.path.join(out_dir, f"encoder_basis_step{step}.png"),
            title="encoder basis", xlabel="tap", ylabel="filter",
        )
        if p:
            paths.append(p)
    if decoder_basis is not None:
        w = np.asarray(decoder_basis).reshape(decoder_basis.shape[0], -1)
        p = save_heatmap(
            w, os.path.join(out_dir, f"decoder_basis_step{step}.png"),
            title="decoder basis", xlabel="tap", ylabel="filter",
        )
        if p:
            paths.append(p)
    if experiment is not None and hasattr(experiment, "log_image"):
        for p in paths:
            experiment.log_image(p, step=step)
    return paths
