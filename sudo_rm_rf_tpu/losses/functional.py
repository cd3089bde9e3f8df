"""Functional SDR losses — the reference's simple closed-form API
(`sudo_rm_rf/dnn/losses/sisdr.py:15-63`).

These mirror `_sdr`, `sdri_loss`, `sisdr_loss`, `pit_loss` for drop-in
compatibility; the class-based losses in losses/sisdr.py are the
production path.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp


def sdr(y: jax.Array, z: jax.Array, si: bool = False) -> jax.Array:
    """Closed-form (scale-invariant) SDR of estimate z against target y over
    the trailing dim (ref `:15-20`)."""
    if si:
        a = (jnp.mean(z * y, -1) / jnp.mean(y * y, -1))[..., None] * y
        return 10 * jnp.log10(jnp.mean(a**2, -1) / jnp.mean((a - z) ** 2, -1))
    return 10 * jnp.log10(jnp.mean(y * y, -1) / jnp.mean((y - z) ** 2, -1))


def _ensure_3d(x):
    return x[None] if x.ndim < 3 else x


def sdri_loss(y, z, of=0.0):
    """Negative SDR improvement (ref `:23-31`)."""
    return -jnp.mean(sdr(_ensure_3d(y), _ensure_3d(z), si=False) - of)


def sisdr_loss(y, z, of=0.0):
    """Negative SI-SDR improvement (ref `:34-42`)."""
    return -jnp.mean(sdr(_ensure_3d(y), _ensure_3d(z), si=True) - of)


def pit_loss(y, z, of=0.0, si: bool = False):
    """Negative best-permutation mean SDR (ref `:45-63`)."""
    y, z = _ensure_3d(y), _ensure_3d(z)
    perms = list(itertools.permutations(range(y.shape[-2])))
    scores = jnp.stack([sdr(y[:, list(p), :], z, si) for p in perms], axis=2)
    per_perm = jnp.mean(scores, axis=1)  # (B, n_perms)
    return -jnp.mean(jnp.max(per_perm, axis=-1))
