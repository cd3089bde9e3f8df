"""Sequence parallelism: time-sharded forward == unsharded forward.

The reference has no long-input distribution story (whole-utterance bs=1
eval, `simple_whamr_evaluation.py:138-151`); these tests pin the TPU-native
capability: an 8-way time-sharded shard_map forward (halo exchange +
psum'd GlobLN statistics) reproducing the single-device fast path exactly,
including both global boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sudo_rm_rf_tpu import models
from sudo_rm_rf_tpu.inference.sequence_parallel import (
    SequenceParallelSeparator,
    default_halo_frames,
    improved_forward_seq,
    make_seq_mesh,
)
from sudo_rm_rf_tpu.models.fast_inference import improved_forward_fast

CFG = dict(
    out_channels=16, in_channels=32, num_blocks=2, upsampling_depth=3,
    enc_kernel_size=17, enc_num_basis=16, num_sources=2,
)


def _init():
    model = models.SuDORMRFImproved(**CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 512)))["params"]
    return params


def test_seq_parallel_matches_unsharded():
    params = _init()
    mesh = make_seq_mesh(8)
    stride = CFG["enc_kernel_size"] // 2
    align = stride * 2 ** CFG["upsampling_depth"]
    halo = default_halo_frames(CFG["num_blocks"], CFG["upsampling_depth"])
    per = max(halo * stride, 3 * align)
    per = -(-per // align) * align
    t = 8 * per  # aligned for both paths: neither pads internally
    x = np.random.default_rng(0).standard_normal((1, t)).astype(np.float32)

    ref = improved_forward_fast(
        params, jnp.asarray(x)[:, None, :],
        num_blocks=CFG["num_blocks"],
        upsampling_depth=CFG["upsampling_depth"],
        enc_kernel_size=CFG["enc_kernel_size"],
        num_sources=2, impl="fma",
    )
    out = improved_forward_seq(
        params, jnp.asarray(x), mesh,
        num_blocks=CFG["num_blocks"],
        depth=CFG["upsampling_depth"],
        enc_kernel_size=CFG["enc_kernel_size"],
        num_sources=2,
    )
    assert out.shape == ref.shape
    # full-array compare: interior AND both global boundaries must be exact
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_seq_parallel_batch_dim():
    params = _init()
    mesh = make_seq_mesh(4)
    stride = CFG["enc_kernel_size"] // 2
    align = stride * 2 ** CFG["upsampling_depth"]
    halo = default_halo_frames(CFG["num_blocks"], CFG["upsampling_depth"])
    per = -(-max(halo * stride, align) // align) * align
    t = 4 * per
    x = np.random.default_rng(1).standard_normal((3, t)).astype(np.float32)
    ref = improved_forward_fast(
        params, jnp.asarray(x)[:, None, :],
        num_blocks=CFG["num_blocks"],
        upsampling_depth=CFG["upsampling_depth"],
        enc_kernel_size=CFG["enc_kernel_size"],
        num_sources=2, impl="fma",
    )
    out = improved_forward_seq(
        params, jnp.asarray(x), mesh,
        num_blocks=CFG["num_blocks"], depth=CFG["upsampling_depth"],
        enc_kernel_size=CFG["enc_kernel_size"], num_sources=2,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_seq_separator_arbitrary_length_matches_padded_fast_path():
    """The separator's pad→shard→crop pipeline equals running the fast path
    on the identically padded input (same normalization recipe)."""
    params = _init()
    sep = SequenceParallelSeparator(
        params, mesh=make_seq_mesh(8),
        num_blocks=CFG["num_blocks"],
        upsampling_depth=CFG["upsampling_depth"],
        enc_kernel_size=CFG["enc_kernel_size"],
        num_sources=2,
    )
    t = 5000 + 37
    mixture = np.random.default_rng(2).standard_normal(t).astype(np.float32)
    est = sep.separate(mixture)
    assert est.shape == (2, t)

    mean, std = mixture.mean(), mixture.std(ddof=1)
    xn = (mixture - mean) / (std + 1e-9)
    total = sep._padded_len(t)
    padded = np.zeros(total, np.float32)
    padded[:t] = xn
    ref = improved_forward_fast(
        params, jnp.asarray(padded)[None, None, :],
        num_blocks=CFG["num_blocks"],
        upsampling_depth=CFG["upsampling_depth"],
        enc_kernel_size=CFG["enc_kernel_size"],
        num_sources=2, impl="fma",
    )
    ref = np.asarray(ref)[0, :, :t] * (std + 1e-9) + mean
    # the separator de-standardizes with host float math (std not +eps'd on
    # the multiply-back); compare in the same convention
    ref2 = np.asarray(
        improved_forward_fast(
            params, jnp.asarray(padded)[None, None, :],
            num_blocks=CFG["num_blocks"],
            upsampling_depth=CFG["upsampling_depth"],
            enc_kernel_size=CFG["enc_kernel_size"],
            num_sources=2, impl="fma",
        )
    )[0, :, :t] * std + mean
    np.testing.assert_allclose(est, ref2, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ref, ref2, rtol=1e-3, atol=1e-3)


def test_seq_separator_mixture_consistency():
    params = _init()
    sep = SequenceParallelSeparator(
        params, mesh=make_seq_mesh(2),
        num_blocks=CFG["num_blocks"],
        upsampling_depth=CFG["upsampling_depth"],
        enc_kernel_size=CFG["enc_kernel_size"],
        num_sources=2, mixture_consistency="uniform",
    )
    t = 4096
    mixture = np.random.default_rng(3).standard_normal(t).astype(np.float32)
    mixture -= mixture.mean()  # de-standardization adds the mean back per
    # source, so sum-to-mixture holds exactly only for zero-mean input
    est = sep.separate(mixture)
    assert est.shape == (2, t)
    # uniform consistency: the de-standardized estimates sum back to the
    # mixture up to the global pad crop
    resid = mixture - est.sum(axis=0)
    assert np.abs(resid).max() < 5e-3


def test_seq_short_input_guard():
    """Inputs shorter than one halo per shard still separate (extra pad)."""
    params = _init()
    sep = SequenceParallelSeparator(
        params, mesh=make_seq_mesh(8),
        num_blocks=CFG["num_blocks"],
        upsampling_depth=CFG["upsampling_depth"],
        enc_kernel_size=CFG["enc_kernel_size"], num_sources=2,
    )
    mixture = np.random.default_rng(4).standard_normal(777).astype(np.float32)
    est = sep.separate(mixture)
    assert est.shape == (2, 777)
    assert np.isfinite(est).all()


def test_default_halo_covers_receptive_field():
    """Shrinking the halo below the receptive field must break exactness —
    evidence the default is load-bearing, not slack."""
    params = _init()
    mesh = make_seq_mesh(8)
    stride = CFG["enc_kernel_size"] // 2
    align = stride * 2 ** CFG["upsampling_depth"]
    halo = default_halo_frames(CFG["num_blocks"], CFG["upsampling_depth"])
    per = -(-max(halo * stride, 3 * align) // align) * align
    t = 8 * per
    x = np.random.default_rng(5).standard_normal((1, t)).astype(np.float32)
    ref = np.asarray(improved_forward_fast(
        params, jnp.asarray(x)[:, None, :],
        num_blocks=CFG["num_blocks"],
        upsampling_depth=CFG["upsampling_depth"],
        enc_kernel_size=CFG["enc_kernel_size"], num_sources=2, impl="fma",
    ))
    tiny_halo = 2 ** (CFG["upsampling_depth"] - 1)
    out = np.asarray(improved_forward_seq(
        params, jnp.asarray(x), mesh,
        num_blocks=CFG["num_blocks"], depth=CFG["upsampling_depth"],
        enc_kernel_size=CFG["enc_kernel_size"], num_sources=2,
        halo_frames=tiny_halo,
    ))
    err = np.abs(out - ref).max()
    assert err > 1e-3, "a one-level halo should NOT be exact"


def test_separate_cli_seq_parallel_mode(tmp_path):
    """End-to-end: checkpoint -> `sudo-tpu-separate --mode seq_parallel`."""
    from scipy.io import wavfile

    from sudo_rm_rf_tpu.cli.separate import main as separate_main
    from sudo_rm_rf_tpu.utils import CheckpointManager

    params = _init()
    ckpt = CheckpointManager(str(tmp_path / "ckpt"), "tinyimproved").save(
        params, "final"
    )
    mix = (
        0.2 * np.sin(2 * np.pi * 440 / 8000 * np.arange(6000))
    ).astype(np.float32)
    wav_path = str(tmp_path / "mix.wav")
    wavfile.write(wav_path, 8000, (mix * 32767).astype(np.int16))

    rc = separate_main([
        "--checkpoint", ckpt, "--model_type", "relu",
        "--input", wav_path, "--out_dir", str(tmp_path / "out"),
        "--mode", "seq_parallel",
        "--out_channels", str(CFG["out_channels"]),
        "--in_channels", str(CFG["in_channels"]),
        "--num_blocks", str(CFG["num_blocks"]),
        "--upsampling_depth", str(CFG["upsampling_depth"]),
        "--enc_kernel_size", str(CFG["enc_kernel_size"]),
        "--enc_num_basis", str(CFG["enc_num_basis"]),
    ])
    assert rc == 0
    for s in (1, 2):
        sr, est = wavfile.read(tmp_path / "out" / f"mix_s{s}.wav")
        assert sr == 8000 and est.shape == (6000,)


GC_CFG = dict(
    out_channels=32, in_channels=64, num_blocks=2, upsampling_depth=3,
    enc_kernel_size=17, enc_num_basis=16, num_sources=2, group_size=4,
)


def test_gc_seq_parallel_matches_unsharded():
    from sudo_rm_rf_tpu.inference.sequence_parallel import (
        groupcomm_forward_seq,
    )
    from sudo_rm_rf_tpu.models.fast_inference import groupcomm_forward_fast

    model = models.get_model("groupcomm_v2", **GC_CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 512)))["params"]
    mesh = make_seq_mesh(8)
    stride = GC_CFG["enc_kernel_size"] // 2
    align = stride * 2 ** GC_CFG["upsampling_depth"]
    halo = default_halo_frames(GC_CFG["num_blocks"], GC_CFG["upsampling_depth"])
    per = -(-max(halo * stride, 3 * align) // align) * align
    t = 8 * per
    x = np.random.default_rng(7).standard_normal((1, t)).astype(np.float32)

    ref = groupcomm_forward_fast(
        params, jnp.asarray(x)[:, None, :],
        num_blocks=GC_CFG["num_blocks"],
        upsampling_depth=GC_CFG["upsampling_depth"],
        enc_kernel_size=GC_CFG["enc_kernel_size"],
        num_sources=2, group_size=GC_CFG["group_size"], impl="fma_merged",
    )
    out = groupcomm_forward_seq(
        params, jnp.asarray(x), mesh,
        num_blocks=GC_CFG["num_blocks"], depth=GC_CFG["upsampling_depth"],
        enc_kernel_size=GC_CFG["enc_kernel_size"], num_sources=2,
        group_size=GC_CFG["group_size"],
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_gc_seq_separator():
    model = models.get_model("groupcomm_v2", **GC_CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 512)))["params"]
    sep = SequenceParallelSeparator(
        params, mesh=make_seq_mesh(4),
        num_blocks=GC_CFG["num_blocks"],
        upsampling_depth=GC_CFG["upsampling_depth"],
        enc_kernel_size=GC_CFG["enc_kernel_size"],
        num_sources=2, mixture_consistency="uniform",
        model_type="groupcomm_v2", group_size=GC_CFG["group_size"],
    )
    t = 9000 + 11
    mixture = np.random.default_rng(8).standard_normal(t).astype(np.float32)
    est = sep.separate(mixture)
    assert est.shape == (2, t)
    assert np.isfinite(est).all()


CAUSAL_CFG = dict(
    out_channels=16, in_channels=32, num_blocks=2, upsampling_depth=3,
    enc_kernel_size=17, enc_num_basis=16, num_sources=2,
)


def _causal_params(seed=0):
    """Init + perturb: untrained skipinit gains are 0 (identity blocks), so
    set them nonzero to actually exercise the halo'd ladder."""
    model = models.get_model("causal", **CAUSAL_CFG)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 1, 512)))[
        "params"
    ]
    for i in range(CAUSAL_CFG["num_blocks"]):
        params[f"sm_{i}"]["skipinit_gain"] = jnp.asarray(0.5 + 0.1 * i)
    return model, params


def test_causal_seq_parallel_matches_unsharded():
    from sudo_rm_rf_tpu.inference.sequence_parallel import (
        causal_forward_seq,
        causal_halo_frames,
    )

    model, params = _causal_params()
    mesh = make_seq_mesh(8)
    stride = CAUSAL_CFG["enc_kernel_size"] // 2
    align = stride * 2 ** CAUSAL_CFG["upsampling_depth"]
    halo = causal_halo_frames(
        CAUSAL_CFG["num_blocks"], CAUSAL_CFG["upsampling_depth"]
    )
    per = -(-max(halo * stride, 3 * align) // align) * align
    t = 8 * per
    x = np.random.default_rng(9).standard_normal((1, t)).astype(np.float32)

    ref = model.apply({"params": params}, jnp.asarray(x)[:, None, :])
    out = causal_forward_seq(
        params, jnp.asarray(x), mesh,
        num_blocks=CAUSAL_CFG["num_blocks"],
        depth=CAUSAL_CFG["upsampling_depth"],
        enc_kernel_size=CAUSAL_CFG["enc_kernel_size"], num_sources=2,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_causal_seq_too_small_halo_must_break():
    """Falsification: a halo below the causal receptive field must NOT
    reproduce the unsharded forward (guards against a vacuous test)."""
    from sudo_rm_rf_tpu.inference.sequence_parallel import causal_forward_seq

    model, params = _causal_params(seed=1)
    mesh = make_seq_mesh(8)
    stride = CAUSAL_CFG["enc_kernel_size"] // 2
    align = stride * 2 ** CAUSAL_CFG["upsampling_depth"]
    small_halo = 4  # way below num_blocks*10*2^depth
    per = -(-max(small_halo * stride, 3 * align) // align) * align
    t = 8 * per
    x = np.random.default_rng(10).standard_normal((1, t)).astype(np.float32)
    ref = model.apply({"params": params}, jnp.asarray(x)[:, None, :])
    out = causal_forward_seq(
        params, jnp.asarray(x), mesh,
        num_blocks=CAUSAL_CFG["num_blocks"],
        depth=CAUSAL_CFG["upsampling_depth"],
        enc_kernel_size=CAUSAL_CFG["enc_kernel_size"], num_sources=2,
        halo_frames=small_halo,
    )
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() > 1e-3


def test_causal_seq_separator():
    model, params = _causal_params(seed=2)
    sep = SequenceParallelSeparator(
        params, mesh=make_seq_mesh(4),
        num_blocks=CAUSAL_CFG["num_blocks"],
        upsampling_depth=CAUSAL_CFG["upsampling_depth"],
        enc_kernel_size=CAUSAL_CFG["enc_kernel_size"],
        num_sources=2, model_type="causal",
    )
    t = 9000 + 17
    mixture = np.random.default_rng(11).standard_normal(t).astype(np.float32)
    est = sep.separate(mixture)
    assert est.shape == (2, t)
    assert np.isfinite(est).all()


# ---------------------------------------------------------------------------
# attentive v1/v2: exact global attention under time sharding
# ---------------------------------------------------------------------------

ATT_CFG = dict(
    out_channels=16, in_channels=32, num_blocks=2, upsampling_depth=3,
    enc_kernel_size=17, enc_num_basis=16, num_sources=2,
    n_heads=2, att_dims=16, att_dropout=0.0,
)


def _att_model(variant):
    from sudo_rm_rf_tpu.models import get_model

    kwargs = dict(ATT_CFG)
    if variant == "v2":
        # v2 normally hardcodes 4 heads / 256 dims (ref v2 :386-391);
        # disable for a test-sized block
        kwargs["hardcode_block_attention"] = False
    return get_model("attention" if variant == "v1" else "attention_v2",
                     **kwargs)


@pytest.mark.parametrize("variant", ["v1", "v2"])
def test_attentive_seq_parallel_matches_unsharded(variant):
    """The per-block transformer at the deepest ladder level is reproduced
    EXACTLY via a global k/v all-gather (q local) — not windowed. The
    time-sharded forward must match the unsharded flax apply everywhere,
    including both global boundaries (`attentive_sudormrf.py:163-193`)."""
    from sudo_rm_rf_tpu.inference.sequence_parallel import attentive_forward_seq

    model = _att_model(variant)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 512)))["params"]
    mesh = make_seq_mesh(8)
    stride = ATT_CFG["enc_kernel_size"] // 2
    align = stride * 2 ** ATT_CFG["upsampling_depth"]
    halo = default_halo_frames(ATT_CFG["num_blocks"], ATT_CFG["upsampling_depth"])
    per = -(-max(halo * stride, align) // align) * align
    t = 8 * per
    x = np.random.default_rng(7).standard_normal((2, t)).astype(np.float32)

    ref = model.apply({"params": params}, jnp.asarray(x)[:, None, :])
    out = attentive_forward_seq(
        params, jnp.asarray(x), mesh,
        num_blocks=ATT_CFG["num_blocks"], depth=ATT_CFG["upsampling_depth"],
        enc_kernel_size=ATT_CFG["enc_kernel_size"], num_sources=2,
        n_heads=ATT_CFG["n_heads"], variant=variant,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_attentive_seq_separator_arbitrary_length():
    from sudo_rm_rf_tpu.models import get_model

    # the real kernel size: stride 10 and 2**depth are non-degenerate, so
    # the model's own v1 LCM pad rule keeps ladder frame counts divisible
    # (the k=17 test config above relies on pre-aligned inputs)
    cfg = dict(ATT_CFG, enc_kernel_size=21, hardcode_block_attention=False)
    model = get_model("attention_v2", **cfg)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 512)))["params"]
    sep = SequenceParallelSeparator(
        params, mesh=make_seq_mesh(4),
        num_blocks=cfg["num_blocks"],
        upsampling_depth=cfg["upsampling_depth"],
        enc_kernel_size=cfg["enc_kernel_size"],
        num_sources=2, model_type="attention_v2",
        n_heads=cfg["n_heads"], input_normalize=False,
    )
    t = 5000 + 37  # deliberately unaligned
    x = np.random.default_rng(3).standard_normal(t).astype(np.float32)
    got = sep.separate(x)
    assert got.shape == (2, t)
    # same pad→run→crop pipeline on the unsharded apply (GlobLN statistics
    # see the padded length, so the reference must be padded identically)
    padded = np.zeros(sep._padded_len(t), np.float32)
    padded[:t] = x
    ref = np.asarray(
        model.apply({"params": params}, jnp.asarray(padded)[None, None, :])
    )[0, :, :t]
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_attentive_seq_v3_refused_with_reason():
    with pytest.raises(ValueError, match="overlap-add"):
        SequenceParallelSeparator({}, model_type="attention_v3")
