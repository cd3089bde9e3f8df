"""On-device online mixing augmentation, as pure jittable functions.

The reference remixes batches on-GPU inside the train loop with implicit
torch RNG (`run_improved_sudormrf.py:151-165`, `run_fuss_separation.py:195-215`,
`run_improved_sudormrf_reverb.py:141-168`). Here each recipe is a pure
function of an explicit jax.random key, so it jits into the train step,
shards over the data-parallel mesh, and is reproducible by construction.

Note on DP semantics: permutations are drawn over the *global* batch at the
jit boundary; under a sharded batch XLA keeps the gather local-ish via
collective permute only when needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_wav(wav: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(x - mean) / (std + eps) over the trailing time dim.

    Matches ``normalize_tensor_wav`` (`run_improved_sudormrf.py:126-131`);
    std is torch's default unbiased (ddof=1) estimate.
    """
    mean = jnp.mean(wav, axis=-1, keepdims=True)
    std = jnp.std(wav, axis=-1, keepdims=True, ddof=1)
    return (wav - mean) / (std + eps)


def _energy_match(new: jax.Array, energy: jax.Array) -> jax.Array:
    """Rescale `new` so its per-row energy equals `energy`."""
    return new * jnp.sqrt(energy / jnp.sum(new**2, axis=-1, keepdims=True))


def online_remix_sources(key: jax.Array, clean_wavs: jax.Array):
    """WSJ0/WHAM-style 2-source online remixing.

    Reference `run_improved_sudormrf.py:151-165`: permute the source slots
    once for the whole batch, then independently shuffle each source across
    the batch, rescale each new source to the original per-slot energies, and
    re-standardize. Returns (mixture (B, T), sources (B, S, T)).
    """
    b, s, _ = clean_wavs.shape
    k_slot, *k_batch = jax.random.split(key, s + 1)
    energies = jnp.sum(clean_wavs**2, axis=-1, keepdims=True)  # (B, S, 1)
    slot_perm = jax.random.permutation(k_slot, s)
    shuffled = clean_wavs[:, slot_perm]
    new_sources = []
    for i in range(s):
        batch_perm = jax.random.permutation(k_batch[i], b)
        new_i = shuffled[batch_perm, i, :]
        new_sources.append(_energy_match(new_i, energies[:, i]))
    sources = jnp.stack([normalize_wav(x) for x in new_sources], axis=1)
    mixture = normalize_wav(sum(new_sources))
    return mixture, sources


def online_remix_pairs(key: jax.Array, sources: jax.Array, targets: jax.Array):
    """WHAMR-style remixing of (reverberant source, anechoic target) pairs.

    Reference `run_improved_sudormrf_reverb.py:141-168`: the SAME batch
    permutation is applied to source and target of each slot, both rescaled
    to their original per-slot energies. Returns (mixture (B,T), targets).
    """
    b, s, _ = sources.shape
    keys = jax.random.split(key, s)
    s_energies = jnp.sum(sources**2, axis=-1, keepdims=True)
    t_energies = jnp.sum(targets**2, axis=-1, keepdims=True)
    new_s, new_t = [], []
    for k in range(s):
        perm = jax.random.permutation(keys[k], b)
        new_s.append(_energy_match(sources[perm, k, :], s_energies[:, k]))
        new_t.append(_energy_match(targets[perm, k, :], t_energies[:, k]))
    mixture = normalize_wav(sum(new_s))
    return mixture, jnp.stack(new_t, axis=1)


def fuss_online_augment(key: jax.Array, clean_sources: jax.Array) -> jax.Array:
    """FUSS universal-separation augmentation.

    Reference `run_fuss_separation.py:195-215`: shuffle each source slot
    across the batch, permute the slots, apply random gains in [0.5, 1.5).
    Returns augmented sources (B, S, T); the mixture is their sum.
    """
    b, s, _ = clean_sources.shape
    k_gain, k_slot, *k_batch = jax.random.split(key, s + 2)
    cols = [
        clean_sources[jax.random.permutation(k_batch[i], b), i] for i in range(s)
    ]
    aug = jnp.stack(cols, axis=1)
    aug = aug[:, jax.random.permutation(k_slot, s)]
    gains = jax.random.uniform(k_gain, (b, s, 1)) + 0.5
    return aug * gains


def fuss_mixture(sources: jax.Array, eps: float = 1e-9):
    """Sum sources and standardize, FUSS-style (`run_fuss_separation.py:237-243`,
    which stabilizes the std with 1e-9 rather than normalize_tensor_wav's 1e-8)."""
    mixture = jnp.sum(sources, axis=1)
    return normalize_wav(mixture, eps)
