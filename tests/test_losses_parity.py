"""Golden tests: losses vs the reference torch implementations on random
batches, including best-permutation indices and gradients-through-the-max."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import losses


def _batch(b=4, s=2, t=800, seed=0):
    rng = np.random.default_rng(seed)
    est = rng.standard_normal((b, s, t)).astype(np.float32)
    # targets correlated with (shuffled) estimates so PIT is non-trivial
    tgt = 0.7 * est[:, ::-1, :] + 0.3 * rng.standard_normal((b, s, t)).astype(np.float32)
    return est, tgt


@pytest.mark.parametrize("sdr_type", ["snr", "sisdr", "sdsdr"])
def test_pairwise_neg_sdr_matches_asteroid_copy(sdr_type):
    from sudo_rm_rf.dnn.losses.sisdr import PairwiseNegSDR

    est, tgt = _batch(s=3, seed=1)
    want = PairwiseNegSDR(sdr_type)(torch.from_numpy(est), torch.from_numpy(tgt))
    got = losses.pairwise_neg_sdr(jnp.array(est), jnp.array(tgt), sdr_type=sdr_type)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("s", [2, 3, 4])
def test_pit_loss_matches_pitlosswrapper(s):
    from sudo_rm_rf.dnn.losses.sisdr import PITLossWrapper, PairwiseNegSDR

    est, tgt = _batch(s=s, seed=2)
    ref = PITLossWrapper(PairwiseNegSDR("sisdr"), pit_from="pw_mtx")
    want = ref(torch.from_numpy(est), torch.from_numpy(tgt)).item()
    got = float(losses.pit_neg_sdr_loss(jnp.array(est), jnp.array(tgt)))
    assert abs(got - want) < 1e-3


def test_pit_loss_gradients_flow():
    est, tgt = _batch(seed=3)

    def loss_fn(e):
        return losses.pit_neg_sdr_loss(e, jnp.array(tgt))

    g = jax.grad(loss_fn)(jnp.array(est))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.parametrize("improvement", [False, True])
@pytest.mark.parametrize("zero_mean", [False, True])
def test_perm_invariant_sisdr_matches_reference(improvement, zero_mean):
    from sudo_rm_rf.dnn.losses.sisdr import PermInvariantSISDR as Ref

    est, tgt = _batch(b=5, s=3, seed=4)
    mix = tgt.sum(1, keepdims=True)
    ref = Ref(
        batch_size=5, zero_mean=zero_mean, n_sources=3, backward_loss=True,
        improvement=improvement,
    )
    want, want_perm = ref(
        torch.from_numpy(est), torch.from_numpy(tgt),
        initial_mixtures=torch.from_numpy(mix), return_best_permutation=True,
    )
    ours = losses.PermInvariantSISDR(
        n_sources=3, zero_mean=zero_mean, improvement=improvement
    )
    got, got_perm = ours(
        jnp.array(est), jnp.array(tgt),
        initial_mixtures=jnp.array(mix), return_best_permutation=True,
    )
    assert abs(float(got) - want.item()) < 1e-3
    np.testing.assert_array_equal(np.asarray(got_perm), want_perm.numpy())


def test_perm_invariant_sisdr_individual_results():
    from sudo_rm_rf.dnn.losses.sisdr import PermInvariantSISDR as Ref

    est, tgt = _batch(b=6, s=2, seed=5)
    ref = Ref(n_sources=2, backward_loss=False, return_individual_results=True)
    want = ref(torch.from_numpy(est), torch.from_numpy(tgt))
    ours = losses.PermInvariantSISDR(
        n_sources=2, backward_loss=False, return_individual_results=True
    )
    got = ours(jnp.array(est), jnp.array(tgt))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("n_est,n_act", [(4, 2), (4, 4), (3, 1), (1, 1)])
def test_stabilized_metric_matches_reference(n_est, n_act):
    from sudo_rm_rf.dnn.losses.sisdr import StabilizedPermInvSISDRMetric as Ref

    rng = np.random.default_rng(6)
    est = rng.standard_normal((4, n_est, 700)).astype(np.float32)
    tgt = rng.standard_normal((4, n_act, 700)).astype(np.float32)
    tgt[:, :, :] += 0.5 * est[:, :n_act, :]

    ref = Ref(
        n_estimated_sources=n_est, n_actual_sources=n_act, backward_loss=False,
        improvement=True,
    )
    want, want_perm = ref(
        torch.from_numpy(est), torch.from_numpy(tgt), return_best_permutation=True
    )
    ours = losses.StabilizedPermInvSISDRMetric(
        n_estimated_sources=n_est, n_actual_sources=n_act, backward_loss=False,
        improvement=True,
    )
    got, got_perm = ours(jnp.array(est), jnp.array(tgt), return_best_permutation=True)
    assert abs(float(got) - want.item()) < 2e-3
    np.testing.assert_array_equal(np.asarray(got_perm), want_perm.numpy())


def test_stabilized_metric_single_source_sums_estimates():
    """single_source sums all estimate slots before scoring against the
    1-source target (the reference's intent; its own code path crashes for
    n_estimated > 1 and is never exercised that way)."""
    rng = np.random.default_rng(11)
    est = rng.standard_normal((3, 4, 500)).astype(np.float32)
    tgt = est.sum(1, keepdims=True) + 0.1 * rng.standard_normal((3, 1, 500)).astype(
        np.float32
    )
    ours = losses.StabilizedPermInvSISDRMetric(
        n_estimated_sources=4, n_actual_sources=1, single_source=True,
        backward_loss=False,
    )
    summed = losses.StabilizedPermInvSISDRMetric(
        n_estimated_sources=1, n_actual_sources=1, backward_loss=False
    )
    got = float(ours(jnp.array(est), jnp.array(tgt)))
    want = float(summed(jnp.array(est.sum(1, keepdims=True)), jnp.array(tgt)))
    assert abs(got - want) < 1e-5


def test_zero_ref_snr_matches_reference():
    from sudo_rm_rf.dnn.losses.snr import PermInvariantSNRwithZeroRefs as Ref

    rng = np.random.default_rng(7)
    # 4 slots, 2 active + 2 silent targets (the FUSS setting)
    tgt = np.zeros((3, 4, 600), np.float32)
    tgt[:, :2] = rng.standard_normal((3, 2, 600))
    est = rng.standard_normal((3, 4, 600)).astype(np.float32) * 0.5
    est[:, :2] += 0.8 * tgt[:, :2]

    ref = Ref(n_sources=4, backward_loss=True)
    want, want_perm = ref(
        torch.from_numpy(est), torch.from_numpy(tgt), return_best_permutation=True
    )
    ours = losses.PermInvariantSNRwithZeroRefs(n_sources=4)
    got, got_perm = ours(jnp.array(est), jnp.array(tgt), return_best_permutation=True)
    assert abs(float(got) - want.item()) < 2e-3
    np.testing.assert_array_equal(np.asarray(got_perm), want_perm.numpy())


def test_perm_invariant_norm_matches_reference():
    from sudo_rm_rf.dnn.losses.norm import PermInvariantNorm as Ref

    est, tgt = _batch(b=3, s=3, t=200, seed=8)
    want = Ref(n_sources=3, weighted_norm=1.0)(
        torch.from_numpy(est), torch.from_numpy(np.abs(tgt)),
        weights=torch.from_numpy(np.abs(tgt) + 0.1),
    ).item()
    got = float(
        losses.perm_invariant_norm(
            jnp.array(est), jnp.array(np.abs(tgt)),
            weights=jnp.array(np.abs(tgt) + 0.1), weighted_norm=1.0,
        )
    )
    assert abs(got - want) < 1e-5


@pytest.mark.parametrize("wtype", ["uniform", "magsq"])
def test_mixture_consistency_matches_reference(wtype):
    import sudo_rm_rf.dnn.experiments.utils.mixture_consistency as ref_mc

    rng = np.random.default_rng(9)
    est = rng.standard_normal((2, 3, 400)).astype(np.float32)
    mix = rng.standard_normal((2, 1, 400)).astype(np.float32)
    want = ref_mc.apply(torch.from_numpy(est), torch.from_numpy(mix), wtype).numpy()
    got = np.asarray(
        losses.mixture_consistency(jnp.array(est), jnp.array(mix), wtype)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # consistency property: corrected estimates sum to the mixture
    np.testing.assert_allclose(got.sum(1, keepdims=True), mix, rtol=1e-4, atol=1e-4)


def test_reordered_estimates_align_with_targets():
    est, tgt = _batch(b=4, s=3, seed=10)
    loss, reordered = losses.pit_neg_sdr_loss(
        jnp.array(est), jnp.array(tgt), return_est=True
    )
    # after reordering, direct (non-PIT) loss must equal the PIT loss
    pw = losses.pairwise_neg_sdr(reordered, jnp.array(tgt))
    direct = jnp.mean(jnp.diagonal(pw, axis1=1, axis2=2))
    assert abs(float(direct) - float(loss)) < 1e-4


def test_functional_losses_match_reference():
    from sudo_rm_rf.dnn.losses import sisdr as ref

    est, tgt = _batch(b=3, s=3, seed=12)
    te, tt = torch.from_numpy(est), torch.from_numpy(tgt)
    je, jt = jnp.array(est), jnp.array(tgt)

    want = ref._sdr(tt, te, SI=True).numpy()
    got = np.asarray(losses.sdr(jt, je, si=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    assert abs(float(losses.sdri_loss(jt, je)) - ref.sdri_loss(tt, te).item()) < 1e-3
    assert abs(float(losses.sisdr_loss(jt, je)) - ref.sisdr_loss(tt, te).item()) < 1e-3
    assert abs(float(losses.pit_loss(je, jt, si=True)) -
               ref.pit_loss(te, tt, SI=True).item()) < 1e-3


def test_bss_eval_sources_matches_naive_numpy():
    """Closed-form BSS-eval vs an explicit-projection numpy oracle."""
    from sudo_rm_rf_tpu.losses import bss_eval_sources

    rng = np.random.default_rng(21)
    b, n, t = 3, 3, 800
    targets = rng.standard_normal((b, n, t)).astype(np.float32)
    # estimates = mixed sources + artifacts, shuffled per batch
    mix_mat = rng.standard_normal((b, n, n)).astype(np.float32)
    mix_mat += 2.5 * np.eye(n, dtype=np.float32)
    est = np.einsum("ben,bnt->bet", mix_mat, targets)
    est += 0.3 * rng.standard_normal(est.shape).astype(np.float32)
    shuf = rng.permutation(n)
    est = est[:, shuf]

    got = {k: np.asarray(v) for k, v in bss_eval_sources(est, targets).items()}

    import itertools

    def naive_one(e, S):
        # explicit least-squares projection onto span(S)
        coefs, *_ = np.linalg.lstsq(S.T, e, rcond=None)
        proj = coefs @ S
        out = []
        for j in range(S.shape[0]):
            s_t = (e @ S[j]) / (S[j] @ S[j]) * S[j]
            e_interf = proj - s_t
            e_artif = e - proj
            sdr = 10 * np.log10(
                (s_t @ s_t) / ((e_interf + e_artif) @ (e_interf + e_artif))
            )
            sir = 10 * np.log10((s_t @ s_t) / (e_interf @ e_interf))
            sar = 10 * np.log10((proj @ proj) / (e_artif @ e_artif))
            out.append((sdr, sir, sar))
        return np.array(out)  # (n_targets, 3)

    for bi in range(b):
        per_est = np.stack([naive_one(est[bi, i], targets[bi]) for i in range(n)])
        # best mean-SIR permutation, mir_eval-style
        best, best_perm = -np.inf, None
        for perm in itertools.permutations(range(n)):
            score = np.mean([per_est[perm[j], j, 1] for j in range(n)])
            if score > best:
                best, best_perm = score, perm
        np.testing.assert_array_equal(got["perm"][bi], best_perm)
        for j in range(n):
            want_sdr, want_sir, want_sar = per_est[best_perm[j], j]
            assert abs(got["sdr"][bi, j] - want_sdr) < 1e-2
            assert abs(got["sir"][bi, j] - want_sir) < 1e-2
            assert abs(got["sar"][bi, j] - want_sar) < 1e-2


def test_bss_eval_filtered_matches_delayed_copies_oracle():
    """512-tap-convention BSS-eval (museval/mir_eval distortion filters) vs
    an explicit numpy oracle that materializes the delayed-copies design
    matrix and solves least squares. Small taps keep the oracle cheap; the
    FFT/block-Toeplitz path is tap-count-generic.

    b != n is load-bearing: the per-target jitter broadcast used to be
    (B, 1, 1) against (B, n, L, L), which only broadcast when B == n —
    the evaluate CLI at bs8/n2 crashed on exactly this (regression)."""
    from sudo_rm_rf_tpu.losses import bss_eval_sources

    rng = np.random.default_rng(33)
    b, n, t, L = 3, 2, 400, 8
    targets = rng.standard_normal((b, n, t)).astype(np.float32)
    mix_mat = rng.standard_normal((b, n, n)).astype(np.float32)
    mix_mat += 2.0 * np.eye(n, dtype=np.float32)
    est = np.einsum("ben,bnt->bet", mix_mat, targets)
    # filtered leakage: a short FIR of one source into the other estimate
    est[:, 0, 2:] += 0.4 * targets[:, 1, :-2]
    est += 0.2 * rng.standard_normal(est.shape).astype(np.float32)

    got = {
        k: np.asarray(v)
        for k, v in bss_eval_sources(est, targets, filter_taps=L).items()
    }

    import itertools

    def delayed(S):
        # (n*L, t+L-1): rows are s_k delayed by 0..L-1, zero-padded
        rows = []
        for k in range(S.shape[0]):
            for d in range(L):
                r = np.zeros(t + L - 1)
                r[d:d + t] = S[k]
                rows.append(r)
        return np.array(rows)

    def naive_one(e, S):
        ez = np.zeros(t + L - 1)
        ez[:t] = e
        A = delayed(S)
        coefs, *_ = np.linalg.lstsq(A.T, ez, rcond=None)
        proj = coefs @ A
        out = []
        for j in range(S.shape[0]):
            Aj = A[j * L:(j + 1) * L]
            cj, *_ = np.linalg.lstsq(Aj.T, ez, rcond=None)
            s_t = cj @ Aj
            e_interf = proj - s_t
            e_artif = ez - proj
            sdr = 10 * np.log10(
                (s_t @ s_t) / ((e_interf + e_artif) @ (e_interf + e_artif))
            )
            sir = 10 * np.log10((s_t @ s_t) / (e_interf @ e_interf))
            sar = 10 * np.log10((proj @ proj) / (e_artif @ e_artif))
            out.append((sdr, sir, sar))
        return np.array(out)

    for bi in range(b):
        per_est = np.stack(
            [naive_one(est[bi, i], targets[bi]) for i in range(n)]
        )
        best, best_perm = -np.inf, None
        for perm in itertools.permutations(range(n)):
            score = np.mean([per_est[perm[j], j, 1] for j in range(n)])
            if score > best:
                best, best_perm = score, perm
        np.testing.assert_array_equal(got["perm"][bi], best_perm)
        for j in range(n):
            want_sdr, want_sir, want_sar = per_est[best_perm[j], j]
            assert abs(got["sdr"][bi, j] - want_sdr) < 5e-2
            assert abs(got["sir"][bi, j] - want_sir) < 5e-2
            assert abs(got["sar"][bi, j] - want_sar) < 5e-2


def test_bss_eval_filtered_taps1_matches_closed_form():
    """filter_taps=1 through the FFT/Toeplitz path must equal the scalar
    closed form (same math, L=1)."""
    from sudo_rm_rf_tpu.losses import bss_eval_sources
    from sudo_rm_rf_tpu.losses.bss_eval import _filtered_energies

    rng = np.random.default_rng(34)
    targets = rng.standard_normal((2, 2, 600)).astype(np.float32)
    est = targets[:, ::-1] + 0.3 * rng.standard_normal((2, 2, 600)).astype(
        np.float32
    )
    base = bss_eval_sources(est, targets)
    import jax.numpy as jnp

    num, proj, epow = _filtered_energies(
        jnp.asarray(est), jnp.asarray(targets), taps=1, eps=1e-10
    )
    filt = bss_eval_sources(est, targets, filter_taps=1)
    for k in ("sdr", "sir", "sar", "perm"):
        np.testing.assert_allclose(
            np.asarray(base[k]), np.asarray(filt[k]), rtol=1e-5, atol=1e-5
        )
    # the L=1 Toeplitz energies equal the scalar identities
    cross = np.einsum("bet,bnt->ben", est, targets)
    tp = np.einsum("bnt,bnt->bn", targets, targets)
    np.testing.assert_allclose(
        np.asarray(num), cross**2 / tp[:, None, :], rtol=1e-4
    )


def test_bss_eval_sources_finite_on_perfect_separation():
    """Regression: when an estimate is (near-)exactly a true source the
    interference/artifact energies are ~0 and roundoff can push the
    closed-form error terms slightly negative, which used to NaN the log
    (seen as sir_mean=NaN in `sudo-tpu-evaluate` on a well-trained
    checkpoint). All metrics must stay finite, with SIR/SAR very large."""
    from sudo_rm_rf_tpu.losses import bss_eval_sources

    rng = np.random.default_rng(22)
    targets = rng.standard_normal((2, 2, 800)).astype(np.float32)
    est = targets[:, ::-1].copy()  # exact copies, swapped order

    got = {k: np.asarray(v) for k, v in bss_eval_sources(est, targets).items()}
    for key in ("sdr", "sir", "sar"):
        assert np.isfinite(got[key]).all(), (key, got[key])
    assert (got["sir"] > 40).all()
    np.testing.assert_array_equal(got["perm"], [[1, 0], [1, 0]])


def test_stabilized_metric_finite_when_mixture_equals_target():
    """Variable-count FUSS crops can leave all-but-one source silent, making
    the improvement baseline's mixture EQUAL a target: float32 rounding then
    pushes rho^2 past 1 and 1-rho^2+eps negative -> NaN in the reference
    formula (`sisdr.py:507-514`), which the batch-mean spreads to every
    sample. The clamp keeps the metric finite (+90 dB eps ceiling)."""
    t = np.random.default_rng(5).standard_normal((3, 3, 4000)).astype(np.float32)
    t[0, 1:] = 0.0  # example whose mixture == its only active source
    est = np.random.default_rng(6).standard_normal((3, 4, 4000)).astype(np.float32)
    m = losses.StabilizedPermInvSISDRMetric(
        n_estimated_sources=4, n_actual_sources=3, zero_mean=True,
        improvement=True, backward_loss=False, return_individual_results=True,
    )
    vals = np.asarray(m(jnp.asarray(est), jnp.asarray(t)))
    assert np.isfinite(vals).all(), vals
    # perfect estimate of a sane batch also stays finite (rho == 1 path)
    vals2 = np.asarray(
        losses.StabilizedPermInvSISDRMetric(
            n_estimated_sources=3, n_actual_sources=3, zero_mean=True,
            improvement=False, backward_loss=False,
            return_individual_results=True,
        )(jnp.asarray(t[1:]), jnp.asarray(t[1:]))
    )
    assert np.isfinite(vals2).all(), vals2
