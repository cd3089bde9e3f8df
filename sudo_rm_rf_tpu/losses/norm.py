"""Permutation-invariant weighted-L1 loss for mask/signal estimation.

Reference: `sudo_rm_rf/dnn/losses/norm.py:13-65`. Faithful to the reference
reduction, including its quirk: the min over permutations is taken on the
*batch-mean* loss, not per-sample (``all_mses.mean(-2)`` reduces the batch
axis before the min).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu.losses.sisdr import all_permutations


def perm_invariant_norm(
    pr_batch: jax.Array,
    t_batch: jax.Array,
    weights: jax.Array | None = None,
    weighted_norm: float = 0.0,
) -> jax.Array:
    """min over permutations of mean |w^p * (pr_perm - t)|."""
    n_sources = pr_batch.shape[1]
    perms = all_permutations(n_sources)
    w = t_batch if weights is None else weights
    losses = []
    for perm in perms:
        permuted = pr_batch[:, list(perm), :]
        se = jnp.abs((w**weighted_norm) * (permuted - t_batch))
        losses.append(jnp.mean(se.reshape(se.shape[0], -1), axis=1))
    all_mses = jnp.stack(losses, axis=1)  # (B, P)
    return jnp.min(jnp.mean(all_mses, axis=-2), axis=-1)
