"""Permutation-invariant SNR with zero-reference (silent source) handling.

Reference: `sudo_rm_rf/dnn/losses/snr.py:13-142` — the FUSS training loss
(`run_fuss_separation.py:91-102`). A target is *active* iff its input SNR
against the mixture is >= ``inactivity_threshold`` dB; inactive targets are
excluded from the numerator and stabilized in the denominator by the mixture
power, so the model is rewarded for outputting silence there.

Same TPU-first structure as sisdr.py: one pairwise (B, S, S) SNR matrix,
permutations scored by a one-hot einsum.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from sudo_rm_rf_tpu.losses.sisdr import _perm_onehots, all_permutations


@dataclass(frozen=True)
class PermInvariantSNRwithZeroRefs:
    n_sources: int
    zero_mean: bool = False
    backward_loss: bool = True
    inactivity_threshold: float = -40.0
    return_individual_results: bool = False

    @property
    def permutations(self) -> np.ndarray:
        return all_permutations(self.n_sources)

    def __call__(
        self,
        pr_batch: jax.Array,
        t_batch: jax.Array,
        eps: float = 1e-9,
        thresh: float = 0.001,
        return_best_permutation: bool = False,
    ):
        min_len = min(pr_batch.shape[-1], t_batch.shape[-1])
        pr_batch = pr_batch[:, :, :min_len]
        t_batch = t_batch[:, :, :min_len]
        if self.zero_mean:
            pr_batch = pr_batch - jnp.mean(pr_batch, axis=-1, keepdims=True)
            t_batch = t_batch - jnp.mean(t_batch, axis=-1, keepdims=True)

        mixture = jnp.sum(t_batch, axis=-2, keepdims=True)  # (B, 1, T)
        mixture_power = jnp.sum(mixture * mixture, axis=-1)  # (B, 1)
        target_powers = jnp.sum(t_batch * t_batch, axis=-1)  # (B, S)
        input_snr = 10.0 * jnp.log10(target_powers / (mixture_power + eps))
        activity_mask = input_snr >= self.inactivity_threshold  # (B, S) per tgt

        active = activity_mask.astype(t_batch.dtype)
        denom_stab = thresh * (
            active * target_powers + (1.0 - active) * mixture_power
        )  # (B, S)
        num_active = jnp.sum(active, axis=-1, keepdims=True)  # (B, 1)

        # pairwise: snr[b, i, j] of estimate i against target j
        # (`snr.py:55-68`): 10 * active_j * log10(||t_j||^2+eps / (||pr_i-t_j||^2
        #  + stab_j + eps))
        nom = target_powers + eps  # (B, S_tgt)
        err = pr_batch[:, :, None, :] - t_batch[:, None, :, :]
        denom = jnp.sum(err * err, axis=-1) + denom_stab[:, None, :] + eps
        pair = 10.0 * active[:, None, :] * jnp.log10(nom[:, None, :] / denom + eps)

        perms = self.permutations
        onehot = jnp.asarray(_perm_onehots(perms, self.n_sources))
        # reference takes the SUM over sources, weighted by num_active
        # (`snr.py:106-109`)
        scores = jnp.einsum("bij,pji->bp", pair, onehot)
        scores = scores * num_active
        best_perm_ind = jnp.argmax(scores, axis=-1)
        best_snr = jnp.max(scores, axis=-1)

        if not self.return_individual_results:
            best_snr = jnp.mean(best_snr)
        if self.backward_loss:
            best_snr = -best_snr
        if return_best_permutation:
            return best_snr, jnp.asarray(perms)[best_perm_ind]
        return best_snr


# The reference ships a near-duplicate "Simpler" class
# (`snr.py:145-262`) whose only behavioral delta is a latent crash when
# backward_loss=True (compute_snr returns one value, forward unpacks two).
# Same math here; kept as an alias for API compatibility.
SimplerPermInvariantSNRwithZeroRefs = PermInvariantSNRwithZeroRefs
