"""Differentiable mixture-consistency projection (Wisdom et al., ICASSP 2019).

Reference: `sudo_rm_rf/dnn/experiments/utils/mixture_consistency.py:14-36`.
Applied after the forward pass for GroupComm and FUSS models
(`run_sudormrf_gc_v2.py:153-155`, `run_fuss_separation.py:252`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mixture_consistency(
    pr_batch: jax.Array,
    input_mixture: jax.Array,
    mix_weights_type: str = "uniform",
) -> jax.Array:
    """est + w * (mix - sum(est)) with uniform or magnitude-squared weights.

    pr_batch: (B, S, T) estimates; input_mixture: (B, 1, T).
    """
    num_sources = pr_batch.shape[1]
    pr_mixture = jnp.sum(pr_batch, axis=1, keepdims=True)
    if mix_weights_type == "magsq":
        w = jnp.mean(pr_batch**2, axis=-1, keepdims=True)
        w = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-9)
    elif mix_weights_type == "uniform":
        w = 1.0 / num_sources
    else:
        raise ValueError(f"Invalid mixture consistency weight type: {mix_weights_type}")
    return pr_batch + w * (input_mixture - pr_mixture)
