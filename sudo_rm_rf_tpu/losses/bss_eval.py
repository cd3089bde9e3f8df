"""BSS-eval source-separation metrics (SDR / SIR / SAR), closed form.

The reference evaluation leans on ``asteroid.metrics.get_metrics`` for
sdr/sir/sar next to SI-SDR (`simple_whamr_evaluation.py:153-171`). This is
the TPU-native equivalent: the classic BSS-eval decomposition of each
estimate into

    s_target = P_j e                               (projection onto target j)
    e_interf = P_S e - s_target                    (other-source leakage)
    e_artif  = e - P_S e                           (everything else)

with ``P_j`` the orthogonal projection onto the span of target j's delayed
copies (``filter_taps`` delays — the allowed distortion filter) and ``P_S``
the projection onto ALL sources' delayed copies (Vincent et al. 2006).
``filter_taps=1`` is the scalar-gain special case; ``filter_taps=512`` is
the museval / mir_eval default, making absolute SDR/SIR/SAR values
literature-comparable. Because both are orthogonal projections, every norm
reduces to correlation solves (no filtered signals are ever materialized):

    ||s_target||^2 = d_j^T R_jj^{-1} d_j     (L-tap cross-corr d, Toeplitz R)
    ||e_interf||^2 = e^T P_S e - ||s_target||^2
    ||e_artif||^2  = ||e||^2 - e^T P_S e

where e^T P_S e = D^T G^{-1} D with G the (n*L x n*L) block-Toeplitz Gram
of all delayed sources, all correlations computed by FFT (zero-padded,
mir_eval's convention).

Permutation: best mean-SIR assignment over all n! permutations (mir_eval's
convention), evaluated by one-hot einsum like the PIT losses.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np


def _filtered_energies(est, targets, taps: int, eps: float):
    """Projection energies for L-tap distortion filters, via FFT
    correlations + block-Toeplitz solves (museval/mir_eval convention:
    sources zero-padded, projections live on length T + L - 1).

    Returns (num, proj_energy, e_powers):
      num (B, n_est, n): ||P_j e_i||^2, projection onto target j's L delays
      proj_energy (B, n_est): ||P_S e_i||^2, projection onto ALL delays
      e_powers (B, n_est): ||e_i||^2
    """
    b, n, t = targets.shape
    L = taps
    n_fft = 1 << (t + L - 1).bit_length()
    sf = jnp.fft.rfft(targets, n=n_fft, axis=-1)  # (B, n, F)
    ef = jnp.fft.rfft(est, n=n_fft, axis=-1)  # (B, n_est, F)

    # source-source correlations c_kl[m] = sum_t s_k[t] s_l[t-m]
    c_ss = jnp.fft.irfft(
        sf[:, :, None] * jnp.conj(sf[:, None, :]), n=n_fft, axis=-1
    )  # (B, n, n, n_fft)
    # est-source correlations d_ik[m] = sum_t e_i[t] s_k[t-m]
    c_es = jnp.fft.irfft(
        ef[:, :, None] * jnp.conj(sf[:, None, :]), n=n_fft, axis=-1
    )  # (B, n_est, n, n_fft)

    # Toeplitz block (k,l)[a,b] = sum_t s_k[t-a] s_l[t-b] = c_kl[b-a]
    lag = (jnp.arange(L)[None, :] - jnp.arange(L)[:, None]) % n_fft  # (L, L)
    blocks = c_ss[..., lag]  # (B, n, n, L, L)
    gram = jnp.transpose(blocks, (0, 1, 3, 2, 4)).reshape(b, n * L, n * L)
    d = c_es[..., :L]  # (B, n_est, n, L): lags 0..L-1
    d_full = d.reshape(b, n, n * L)  # n_est == n

    jitter = eps * (1.0 + jnp.trace(gram, axis1=-2, axis2=-1))[:, None]
    gram_r = gram + jitter[..., None] * jnp.eye(n * L)
    # ||P_S e||^2 = d^T G^{-1} d, one solve per estimate
    coefs = jnp.linalg.solve(
        gram_r[:, None].repeat(n, 1), d_full[..., None]
    )[..., 0]  # (B, n_est, n*L)
    proj_energy = jnp.sum(coefs * d_full, axis=-1)  # (B, n_est)

    # ||P_j e||^2 = d_j^T R_jj^{-1} d_j per (estimate, target)
    diag = blocks[:, jnp.arange(n), jnp.arange(n)]  # (B, n, L, L)
    # jitter is (B, 1): insert axes to (B, 1, 1, 1) so it broadcasts over
    # (B, n, L, L) for ANY batch size (with only [..., None] it is
    # (B, 1, 1), which right-aligns against the n axis and happens to
    # broadcast only when B == n — the shape coincidence that hid this)
    diag_r = diag + jitter[..., None, None] * jnp.eye(L)
    cj = jnp.linalg.solve(
        diag_r[:, None].repeat(n, 1), d[..., None]
    )[..., 0]  # (B, n_est, n, L)
    num = jnp.sum(cj * d, axis=-1)  # (B, n_est, n)

    e_powers = jnp.einsum("bet,bet->be", est, est)
    return num, proj_energy, e_powers


def bss_eval_sources(
    est: jax.Array,
    targets: jax.Array,
    eps: float = 1e-10,
    filter_taps: int = 1,
):
    """BSS-eval SDR/SIR/SAR with permutation by best mean SIR.

    Args:
      est: (B, n, T) estimated sources.
      targets: (B, n, T) true sources (must be linearly independent).
      filter_taps: distortion-filter length L. 1 = scalar gain (closed
        form, cheapest); 512 = the museval/mir_eval default, making
        absolute values literature-comparable.
    Returns:
      dict with 'sdr', 'sir', 'sar' each (B, n) — metric of estimate i
      against its assigned true source — and 'perm' (B, n): perm[b, j] is
      the estimate index assigned to true source j.
    """
    est = jnp.asarray(est, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    b, n, _ = targets.shape

    if filter_taps > 1:
        num, proj_energy, e_powers = _filtered_energies(
            est, targets, filter_taps, eps
        )
    else:
        gram = jnp.einsum("bnt,bmt->bnm", targets, targets)  # (B, n, n)
        cross = jnp.einsum("bet,bnt->ben", est, targets)  # <e_i, s_j>
        # projection energy e^T P e via G^-1 (solve once per estimate)
        coefs = jnp.linalg.solve(
            gram[:, None].repeat(n, 1), cross[..., None]
        )[..., 0]  # (B, n_est, n)
        proj_energy = jnp.sum(coefs * cross, axis=-1)  # (B, n_est)

        t_powers = jnp.einsum("bnt,bnt->bn", targets, targets)  # ||s_j||^2
        e_powers = jnp.einsum("bet,bet->be", est, est)  # ||e_i||^2
        # ||s_target||^2 (B,e,j)
        num = cross**2 / (t_powers[:, None, :] + eps)

    def db(x, y):
        # every energy term here is mathematically >= 0 but roundoff can
        # push any of them slightly negative when a component is ~absent
        # (near-zero interference -> proj_energy ~ num; an estimate nearly
        # orthogonal to the target span -> proj_energy itself, computed via
        # linalg.solve, can go negative), which would NaN the log; clamp
        # both numerator and denominator before stabilizing
        return 10.0 * jnp.log10(
            (jnp.maximum(x, 0.0) + eps) / (jnp.maximum(y, 0.0) + eps)
        )

    sdr_pair = db(num, e_powers[:, :, None] - num)
    sir_pair = db(num, proj_energy[:, :, None] - num)
    sar_each = db(proj_energy, e_powers - proj_energy)  # (B, n_est)

    perms = np.array(list(itertools.permutations(range(n))))
    onehot = jnp.asarray(
        np.stack([np.eye(n)[p] for p in perms]), jnp.float32
    )  # (P, n_est->j)
    # perm p assigns estimate perms[p][j] to target j
    sir_scores = jnp.einsum("bej,pej->bp", sir_pair, onehot) / n
    best = jnp.argmax(sir_scores, axis=-1)  # (B,)
    assign = jnp.asarray(perms)[best]  # (B, n): estimate index per target j

    sdr = jnp.stack(
        [sdr_pair[jnp.arange(b), assign[:, j], j] for j in range(n)], axis=1
    )
    sir = jnp.stack(
        [sir_pair[jnp.arange(b), assign[:, j], j] for j in range(n)], axis=1
    )
    sar = jnp.take_along_axis(sar_each, assign, axis=1)
    return {"sdr": sdr, "sir": sir, "sar": sar, "perm": assign}


def bss_eval_improvement(
    est: jax.Array,
    targets: jax.Array,
    mixture: jax.Array,
    eps: float = 1e-10,
    filter_taps: int = 1,
):
    """SDR improvement: bss_eval SDR of est minus SDR of the mixture
    repeated per source (asteroid's ``input_sdr`` convention)."""
    res = bss_eval_sources(est, targets, eps, filter_taps=filter_taps)
    mix = jnp.broadcast_to(
        mixture if mixture.ndim == 3 else mixture[:, None, :],
        targets.shape,
    )
    base = bss_eval_sources(mix, targets, eps, filter_taps=filter_taps)
    return {
        "sdr_i": res["sdr"] - base["sdr"],
        **res,
    }
