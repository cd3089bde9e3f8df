"""BSS-eval source-separation metrics (SDR / SIR / SAR), closed form.

The reference evaluation leans on ``asteroid.metrics.get_metrics`` for
sdr/sir/sar next to SI-SDR (`simple_whamr_evaluation.py:153-171`). This is
the TPU-native equivalent: the classic BSS-eval decomposition of each
estimate into

    s_target = <e, s_j> / ||s_j||^2 * s_j          (allowed target scaling)
    e_interf = P_S e - s_target                    (other-source leakage)
    e_artif  = e - P_S e                           (everything else)

with ``P_S`` the orthogonal projection onto the span of ALL true sources
(Vincent et al. 2006, distortion-filter length 1 — museval/mir_eval default
to 512-tap projection filters, so absolute values differ slightly; ranking
and permutation behavior match). Because ``P_S`` is an orthogonal
projection, every norm reduces to inner products:

    ||s_target||^2 = <e, s_j>^2 / ||s_j||^2
    ||e_interf||^2 = e^T P e - ||s_target||^2
    ||e_artif||^2  = ||e||^2 - e^T P e

Permutation: best mean-SIR assignment over all n! permutations (mir_eval's
convention), evaluated by one-hot einsum like the PIT losses.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np


def bss_eval_sources(
    est: jax.Array, targets: jax.Array, eps: float = 1e-10
):
    """BSS-eval SDR/SIR/SAR with permutation by best mean SIR.

    Args:
      est: (B, n, T) estimated sources.
      targets: (B, n, T) true sources (must be linearly independent).
    Returns:
      dict with 'sdr', 'sir', 'sar' each (B, n) — metric of estimate i
      against its assigned true source — and 'perm' (B, n): perm[b, j] is
      the estimate index assigned to true source j.
    """
    est = jnp.asarray(est, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    b, n, _ = targets.shape

    gram = jnp.einsum("bnt,bmt->bnm", targets, targets)  # (B, n, n)
    cross = jnp.einsum("bet,bnt->ben", est, targets)  # <e_i, s_j>
    # projection energy e^T P e via G^-1 (solve once per estimate)
    coefs = jnp.linalg.solve(
        gram[:, None].repeat(n, 1), cross[..., None]
    )[..., 0]  # (B, n_est, n)
    proj_energy = jnp.sum(coefs * cross, axis=-1)  # (B, n_est)

    t_powers = jnp.einsum("bnt,bnt->bn", targets, targets)  # ||s_j||^2
    e_powers = jnp.einsum("bet,bet->be", est, est)  # ||e_i||^2
    num = cross**2 / (t_powers[:, None, :] + eps)  # ||s_target||^2 (B,e,j)

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
    est: jax.Array, targets: jax.Array, mixture: jax.Array, eps: float = 1e-10
):
    """SDR improvement: bss_eval SDR of est minus SDR of the mixture
    repeated per source (asteroid's ``input_sdr`` convention)."""
    res = bss_eval_sources(est, targets, eps)
    mix = jnp.broadcast_to(
        mixture if mixture.ndim == 3 else mixture[:, None, :],
        targets.shape,
    )
    base = bss_eval_sources(mix, targets, eps)
    return {
        "sdr_i": res["sdr"] - base["sdr"],
        **res,
    }
