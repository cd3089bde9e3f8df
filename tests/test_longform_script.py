"""Long-form run driver (scripts/longform_run.py): the scoring helpers and
source assembly must match the framework's loss definitions, since the
docs/runs/longform_u16 artifact's SI-SDRi numbers come from them."""

import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    path = os.path.join(REPO, "scripts", "longform_run.py")
    spec = importlib.util.spec_from_file_location("longform_run", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["longform_run"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_pit_si_sdri_matches_losses_module():
    """The script's numpy PIT SI-SDR agrees with losses.sisdr on the same
    (permuted) estimates."""
    import jax.numpy as jnp

    from sudo_rm_rf_tpu.losses import PermInvariantSISDR

    lf = _load_module()
    rng = np.random.default_rng(0)
    refs = rng.standard_normal((2, 4000)).astype(np.float32)
    # estimates = noisy, PERMUTED references: PIT must undo the swap
    est = refs[::-1] + 0.1 * rng.standard_normal((2, 4000)).astype(np.float32)
    mixture = refs.sum(axis=0)

    best, sisdri = lf.pit_si_sdri(est, refs, mixture)

    loss = PermInvariantSISDR(n_sources=2, zero_mean=True,
                              backward_loss=False, improvement=False)
    want = float(np.asarray(loss(
        jnp.asarray(est[None]), jnp.asarray(refs[None]))).mean())
    assert abs(best - want) < 0.02, (best, want)
    # identity estimates: SI-SDR is huge, improvement positive
    best_id, sisdri_id = lf.pit_si_sdri(refs, refs, mixture)
    assert best_id > 60 and sisdri_id > 60


def test_build_long_sources_layout(tmp_path):
    """Concatenates per-speaker utterances to the exact requested length,
    unit-variance per stream."""
    import joblib

    lf = _load_module()
    fs = 800
    rng = np.random.default_rng(1)
    for spk in ("spk000", "spk001"):
        for utt in range(3):
            d = tmp_path / spk / f"utt{utt:03d}"
            d.mkdir(parents=True)
            joblib.dump(rng.standard_normal(600).astype(np.float32),
                        str(d / "wav"))
    out = lf.build_long_sources(str(tmp_path), seconds=5.0, fs=fs)
    assert out.shape == (2, 4000)
    assert np.allclose(out.std(axis=-1), 1.0, atol=1e-3)
    assert np.isfinite(out).all()
