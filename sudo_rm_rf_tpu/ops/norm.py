"""Normalization ops.

GlobLN — Global Layer Norm — normalizes each batch element over ALL non-batch
dims (channels AND time), then applies a learned per-channel gain/bias.
Reference semantics: `sudo_rm_rf/dnn/models/improved_sudormrf.py:30-47`
(note: eps=1e-8 is added to the *variance* before sqrt, and variance is the
biased/population variance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def glob_ln(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    eps: float = 1e-8,
) -> jax.Array:
    """Global layer norm over all non-batch dims of a (N, C, ...) tensor.

    gamma/beta are (C,) and broadcast along every trailing dim.
    """
    dims = tuple(range(1, x.ndim))
    shape = (1, -1) + (1,) * (x.ndim - 2)
    if x.dtype == jnp.float32:
        mean = jnp.mean(x, axis=dims, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=dims, keepdims=True)
        normed = (x - mean) * jax.lax.rsqrt(var + eps)
        return gamma.reshape(shape) * normed + beta.reshape(shape)
    # low precision (bf16 serving): fp32 statistics, folded scale/shift
    # applied in the compute dtype so tensor traffic stays narrow
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=dims, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=dims, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    g32 = gamma.astype(jnp.float32).reshape(shape)
    sc = (g32 * inv).astype(x.dtype)
    sh = (beta.astype(jnp.float32).reshape(shape) - g32 * inv * mean).astype(x.dtype)
    return sc * x + sh


def channel_ln(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    eps: float = 1e-8,
) -> jax.Array:
    """Per-time-step layer norm over the channel dim of (N, C, T).

    torch.nn.functional equivalent of ConvTasNet's "cLN over channels only"
    (asteroid-style ChanLN); used by baseline models.
    """
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + eps)
    return gamma[None, :, None] * normed + beta[None, :, None]


def cumulative_ln(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    eps: float = 1e-8,
) -> jax.Array:
    """Cumulative (causal) layer norm of (N, C, T).

    At each step t, normalize by mean/var of all entries x[:, :, :t+1].
    Reference semantics: `sudo_rm_rf/dnn/models/original_convtasnet.py:244-287`
    (cLN used by the causal ConvTasNet baseline). Implemented with cumsums —
    O(CT) and fully parallel, no scan.
    """
    n, c, t = x.shape
    step_sum = jnp.sum(x, axis=1)  # (N, T)
    step_pow_sum = jnp.sum(jnp.square(x), axis=1)  # (N, T)
    cum_sum = jnp.cumsum(step_sum, axis=-1)  # (N, T)
    cum_pow_sum = jnp.cumsum(step_pow_sum, axis=-1)
    entry_cnt = c * jnp.arange(1, t + 1, dtype=x.dtype)  # (T,)
    cum_mean = cum_sum / entry_cnt  # (N, T)
    cum_var = cum_pow_sum / entry_cnt - jnp.square(cum_mean)
    normed = (x - cum_mean[:, None, :]) * jax.lax.rsqrt(
        jnp.maximum(cum_var[:, None, :], 0.0) + eps
    )
    return gamma[None, :, None] * normed + beta[None, :, None]
