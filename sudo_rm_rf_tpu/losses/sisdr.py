"""Permutation-invariant SI-SDR / SDR losses and metrics.

Reference semantics: `sudo_rm_rf/dnn/losses/sisdr.py` — the asteroid-derived
``PITLossWrapper(PairwiseNegSDR)`` used by the current best recipes
(`run_improved_sudormrf.py:64-73`), the in-house ``PermInvariantSISDR``
(train loss and SISDRi val metric), and the rho^2-stabilized metric used for
FUSS variable-source-count eval (`sisdr.py:460-576`).

TPU-first structure: every PIT variant computes an (B, S_est, S_tgt)
pairwise measure matrix ONCE — O(S^2 T) work that XLA fuses into a couple of
reductions — and then scores all permutations with a one-hot einsum over that
tiny matrix (O(S! S^2), data-independent). This replaces the reference's
Python loop over S! permutations of the full (B, S, T) signal, is fully
shape-static, and differentiates cleanly through the max.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _perm_onehots(perms: np.ndarray, n: int) -> np.ndarray:
    """(P, S) index array -> (P, S, n) one-hot selector, float32."""
    p, s = perms.shape
    oh = np.zeros((p, s, n), np.float32)
    oh[np.arange(p)[:, None], np.arange(s)[None, :], perms] = 1.0
    return oh


def all_permutations(n_sources: int) -> np.ndarray:
    return np.array(list(itertools.permutations(range(n_sources))), np.int64)


def partial_permutations(n_estimated: int, n_actual: int) -> np.ndarray:
    """P(n_estimated, n_actual) injections (`sisdr.py:488-491`)."""
    return np.array(
        list(itertools.permutations(range(n_estimated), r=n_actual)), np.int64
    )


# ---------------------------------------------------------------------------
# asteroid-style pairwise losses + PIT wrapper (ref `sisdr.py:197-458`)
# ---------------------------------------------------------------------------


def pairwise_neg_sdr(
    est_targets: jax.Array,
    targets: jax.Array,
    *,
    sdr_type: str = "sisdr",
    zero_mean: bool = True,
    take_log: bool = True,
) -> jax.Array:
    """Pairwise negative (SI-)SDR matrix, shape (B, S_est, S_tgt).

    Matches ``PairwiseNegSDR`` (`sisdr.py:390-458`): element [b, i, j] is the
    negative SDR of estimate i against target j.
    """
    assert sdr_type in ("snr", "sisdr", "sdsdr")
    if zero_mean:
        targets = targets - jnp.mean(targets, axis=-1, keepdims=True)
        est_targets = est_targets - jnp.mean(est_targets, axis=-1, keepdims=True)

    s_tgt = targets[:, None, :, :]  # (B, 1, S_tgt, T)
    s_est = est_targets[:, :, None, :]  # (B, S_est, 1, T)

    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(s_est * s_tgt, axis=-1, keepdims=True)
        tgt_energy = jnp.sum(s_tgt**2, axis=-1, keepdims=True) + 1e-8
        proj = dot * s_tgt / tgt_energy  # (B, S_est, S_tgt, T)
    else:
        proj = jnp.broadcast_to(s_tgt, s_est.shape[:2] + s_tgt.shape[2:])
    if sdr_type in ("sdsdr", "snr"):
        e_noise = s_est - s_tgt
    else:
        e_noise = s_est - proj

    sdr = jnp.sum(proj**2, axis=-1) / (jnp.sum(e_noise**2, axis=-1) + 1e-8)
    if take_log:
        sdr = 10.0 * jnp.log10(sdr + 1e-8)
    return -sdr


def pit_from_pair_matrix(
    pair_losses: jax.Array, perms: np.ndarray | None = None
) -> Tuple[jax.Array, jax.Array]:
    """Best-permutation loss from a pairwise loss matrix.

    Matches ``PITLossWrapper.find_best_perm`` (`sisdr.py:341-387`): the
    matrix is transposed so rows are targets, each permutation's score is the
    mean over sources, and the minimum is returned.

    Returns (min_loss (B,), min_loss_idx (B,)); ``perms[min_loss_idx[b]]``
    maps target row i -> chosen estimate column perms[i].
    """
    n_src = pair_losses.shape[-1]
    if perms is None:
        perms = all_permutations(n_src)
    pwl = jnp.swapaxes(pair_losses, -1, -2)  # (B, tgt, est)
    onehot = jnp.asarray(_perm_onehots(perms, n_src))  # (P, tgt, est)
    loss_set = jnp.einsum("bij,pij->bp", pwl, onehot) / n_src
    min_idx = jnp.argmin(loss_set, axis=1)
    min_loss = jnp.min(loss_set, axis=1)
    return min_loss, min_idx


def reorder_sources(
    est_targets: jax.Array, min_loss_idx: jax.Array, perms: np.ndarray | None = None
) -> jax.Array:
    """Reorder estimates into target order given PIT indices.

    Output row i holds the estimate assigned to target i (asteroid's
    ``reorder_source`` semantics).
    """
    n_src = est_targets.shape[1]
    if perms is None:
        perms = all_permutations(n_src)
    batch_perms = jnp.asarray(perms)[min_loss_idx]  # (B, S): target i <- est
    return jnp.take_along_axis(est_targets, batch_perms[:, :, None], axis=1)


def pit_neg_sdr_loss(
    est_targets: jax.Array,
    targets: jax.Array,
    *,
    sdr_type: str = "sisdr",
    zero_mean: bool = True,
    return_est: bool = False,
):
    """``PITLossWrapper(PairwiseNegSDR(sdr_type), pit_from='pw_mtx')``.

    The training loss of the reference's best recipes
    (`run_improved_sudormrf.py:64-73`). Returns the batch-mean min loss;
    with ``return_est`` also the reordered estimates.
    """
    pw = pairwise_neg_sdr(est_targets, targets, sdr_type=sdr_type, zero_mean=zero_mean)
    min_loss, min_idx = pit_from_pair_matrix(pw)
    mean_loss = jnp.mean(min_loss)
    if return_est:
        return mean_loss, reorder_sources(est_targets, min_idx)
    return mean_loss


# ---------------------------------------------------------------------------
# In-house PermInvariantSISDR (ref `sisdr.py:66-193`)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PermInvariantSISDR:
    """Permutation-invariant SI-SDR loss / SISDRi metric.

    Mirrors the reference class: optional zero-mean, optional improvement
    (subtract the mixture-vs-targets SI-SDR baseline), sign flip for use as
    a loss, per-sample results. ``eps`` defaults match the reference forward
    path (1e-9 passed into compute_sisnr, `sisdr.py:163-187`).
    """

    n_sources: int
    zero_mean: bool = False
    backward_loss: bool = True
    improvement: bool = False
    return_individual_results: bool = False

    @property
    def permutations(self) -> np.ndarray:
        return all_permutations(self.n_sources)

    def _pair_sisnr(self, pr, t, t_energy, eps):
        """(B, S_est, S_tgt) matrix of SI-SNR(pr_i, t_j) (`sisdr.py:120-129`)."""
        dot = jnp.sum(pr[:, :, None, :] * t[:, None, :, :], axis=-1, keepdims=True)
        s_t = dot / (t_energy[:, None, :, :] + eps) * t[:, None, :, :]
        e_t = pr[:, :, None, :] - s_t
        return 10.0 * jnp.log10(
            jnp.sum(s_t**2, axis=-1) / (jnp.sum(e_t**2, axis=-1) + eps)
        )

    def __call__(
        self,
        pr_batch: jax.Array,
        t_batch: jax.Array,
        eps: float = 1e-9,
        initial_mixtures: Optional[jax.Array] = None,
        return_best_permutation: bool = False,
    ):
        min_len = min(pr_batch.shape[-1], t_batch.shape[-1])
        if initial_mixtures is not None:
            min_len = min(min_len, initial_mixtures.shape[-1])
            initial_mixtures = initial_mixtures[:, :, :min_len]
        pr_batch = pr_batch[:, :, :min_len]
        t_batch = t_batch[:, :, :min_len]
        if self.zero_mean:
            pr_batch = pr_batch - jnp.mean(pr_batch, axis=-1, keepdims=True)
            t_batch = t_batch - jnp.mean(t_batch, axis=-1, keepdims=True)
            if initial_mixtures is not None:
                initial_mixtures = initial_mixtures - jnp.mean(
                    initial_mixtures, axis=-1, keepdims=True
                )

        # reference eps in the pairwise path is 10e-8 via compute_permuted_
        # sisnrs default... but forward passes eps straight through; keep it.
        t_energy = jnp.sum(t_batch * t_batch, axis=-1, keepdims=True)
        pair = self._pair_sisnr(pr_batch, t_batch, t_energy, eps)  # (B,Se,St)

        perms = self.permutations
        onehot = jnp.asarray(_perm_onehots(perms, self.n_sources))  # (P,j,i)
        # score[p] = mean_j pair[perm[j], j]
        scores = jnp.einsum("bij,pji->bp", pair, onehot) / self.n_sources
        best_perm_ind = jnp.argmax(scores, axis=-1)
        best_sisdr = jnp.max(scores, axis=-1)

        if self.improvement:
            assert initial_mixtures is not None
            mix = jnp.broadcast_to(
                initial_mixtures, initial_mixtures.shape[:1] + (self.n_sources, min_len)
            )
            dot = jnp.sum(mix * t_batch, axis=-1, keepdims=True)
            s_t = dot / (t_energy + eps) * t_batch
            e_t = mix - s_t
            base = 10.0 * jnp.log10(
                jnp.sum(s_t**2, axis=-1) / (jnp.sum(e_t**2, axis=-1) + eps)
            )
            best_sisdr = best_sisdr - jnp.mean(base)

        if not self.return_individual_results:
            best_sisdr = jnp.mean(best_sisdr)
        if self.backward_loss:
            best_sisdr = -best_sisdr
        if return_best_permutation:
            return best_sisdr, jnp.asarray(perms)[best_perm_ind]
        return best_sisdr


# ---------------------------------------------------------------------------
# rho^2-stabilized variable-source-count metric (ref `sisdr.py:460-576`)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StabilizedPermInvSISDRMetric:
    """Stabilized SI-SDR over P(n_estimated, n_actual) source injections.

    SI-SDR is computed as ``10 log10(rho^2 / (1 - rho^2))`` with rho the
    normalized inner product — bounded for silent estimates
    (`sisdr.py:507-514`). Used for FUSS eval per source count
    (`run_fuss_separation.py:104-131`).
    """

    n_estimated_sources: int
    n_actual_sources: int
    zero_mean: bool = False
    single_source: bool = False
    backward_loss: bool = True
    improvement: bool = False
    return_individual_results: bool = False

    def __post_init__(self):
        assert self.n_estimated_sources >= self.n_actual_sources
        if self.single_source:
            assert self.n_actual_sources == 1

    @property
    def permutations(self) -> np.ndarray:
        # in single_source mode the estimates are summed into one signal
        # first, so only the trivial assignment remains (the reference's
        # single_source path crashes for n_estimated > 1 — never exercised:
        # `run_fuss_separation.py:111-120` always passes n_estimated=1 there).
        if self.single_source:
            return np.zeros((1, 1), np.int64)
        return partial_permutations(self.n_estimated_sources, self.n_actual_sources)

    @staticmethod
    def _stab_sisnr(pr, t, t_powers, eps):
        """(B, Se, St): stabilized SI-SNR of every estimate vs target pair."""
        pr_powers = jnp.sum(pr * pr, axis=-1)[:, :, None]  # (B, Se, 1)
        inner_sq = jnp.sum(pr[:, :, None, :] * t[:, None, :, :], axis=-1) ** 2
        rho_sq = inner_sq / (pr_powers * t_powers[:, None, :] + eps)
        # Cauchy-Schwarz bounds the true rho^2 at 1; float32 rounding can
        # land a hair above when estimate == target (e.g. the improvement
        # baseline on an example whose other sources are silent in the
        # crop), turning 1 - rho^2 + eps negative -> log10(NaN) that the
        # batch-mean then spreads to every sample. The clamp only removes
        # that rounding excursion (the reference metric NaNs here,
        # `sisdr.py:507-514`); clamped-at-1 values hit the +90 dB eps
        # ceiling, the stabilizer's intended behavior.
        rho_sq = jnp.clip(rho_sq, 0.0, 1.0)
        return 10.0 * jnp.log10((rho_sq + eps) / (1.0 - rho_sq + eps))

    def __call__(
        self,
        pr_batch: jax.Array,
        t_batch: jax.Array,
        eps: float = 1e-9,
        return_best_permutation: bool = False,
    ):
        if self.single_source:
            pr_batch = jnp.sum(pr_batch, axis=-2, keepdims=True)
        if self.zero_mean:
            pr_batch = pr_batch - jnp.mean(pr_batch, axis=-1, keepdims=True)
            t_batch = t_batch - jnp.mean(t_batch, axis=-1, keepdims=True)

        assert t_batch.shape[-2] == self.n_actual_sources
        t_powers = jnp.sum(t_batch * t_batch, axis=-1)  # (B, St)
        pair = self._stab_sisnr(pr_batch, t_batch, t_powers, eps)  # (B,Se,St)

        perms = self.permutations  # (P, n_actual) of estimate indices
        n_est_eff = 1 if self.single_source else self.n_estimated_sources
        onehot = jnp.asarray(_perm_onehots(perms, n_est_eff))
        scores = jnp.einsum("bij,pji->bp", pair, onehot) / self.n_actual_sources
        best_perm_ind = jnp.argmax(scores, axis=-1)
        best_sisdr = jnp.max(scores, axis=-1)

        if self.improvement:
            mixture = jnp.sum(t_batch, axis=-2, keepdims=True)
            if self.zero_mean:
                mixture = mixture - jnp.mean(mixture, axis=-1, keepdims=True)
            mix = jnp.broadcast_to(
                mixture, mixture.shape[:1] + (self.n_actual_sources, mixture.shape[-1])
            )
            mix_powers = jnp.sum(mix * mix, axis=-1)
            inner_sq = jnp.sum(mix * t_batch, axis=-1) ** 2
            rho_sq = jnp.clip(
                inner_sq / (mix_powers * t_powers + eps), 0.0, 1.0
            )
            base = 10.0 * jnp.log10((rho_sq + eps) / (1.0 - rho_sq + eps))
            best_sisdr = best_sisdr - jnp.mean(base)

        if not self.return_individual_results:
            best_sisdr = jnp.mean(best_sisdr)
        if self.backward_loss:
            best_sisdr = -best_sisdr
        if return_best_permutation:
            return best_sisdr, jnp.asarray(perms)[best_perm_ind]
        return best_sisdr
