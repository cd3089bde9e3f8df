"""Driver-contract tests: entry() compiles, dryrun_multichip runs on the
virtual 8-device CPU mesh, bench's forward path is jittable."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def test_entry_traces():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (4, 2, 32000)


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_overlap_add_with_fast_forward():
    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.inference import OverlapAddSeparator
    from sudo_rm_rf_tpu.models.fast_inference import improved_forward_fast

    hp = dict(out_channels=16, in_channels=32, num_blocks=1, upsampling_depth=2,
              enc_kernel_size=21, enc_num_basis=16, num_sources=2)
    model = models.SuDORMRFImproved(**hp)
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, 640)))["params"]
    sep = OverlapAddSeparator(
        model, params, chunk_samples=640, num_sources=2, batch_chunks=2,
        forward_fn=lambda p, v: improved_forward_fast(
            p, v, num_blocks=1, upsampling_depth=2, enc_kernel_size=21,
            num_sources=2, impl="fma",
        ),
    )
    mixture = np.random.default_rng(0).standard_normal(2000).astype(np.float32)
    est = sep.separate(mixture)
    assert est.shape == (2, 2000) and np.isfinite(est).all()

    # fma fast path agrees with the plain model through the separator
    sep2 = OverlapAddSeparator(
        model, params, chunk_samples=640, num_sources=2, batch_chunks=2
    )
    est2 = sep2.separate(mixture)
    np.testing.assert_allclose(est, est2, rtol=1e-3, atol=1e-4)


def test_streaming_matches_offline_for_causal_model():
    """Causal model: streamed hop-by-hop output equals the offline forward
    EXACTLY outside two edge regions — a head transient (the fixed window's
    pre-roll sees bias-propagated activations where offline sees per-layer
    zero padding; dies out within the receptive field) and the final
    enc_kernel_size//2 samples (decoder edge). Verified to ~1e-7 in between,
    plus exact emission stability (pushing more audio never changes
    already-emitted samples)."""
    import flax.traverse_util as tu

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.inference.streaming import StreamingSeparator

    hp = dict(in_audio_channels=1, out_channels=16, in_channels=32,
              num_blocks=1, upsampling_depth=2, enc_kernel_size=21,
              enc_num_basis=16, num_sources=2)
    model = models.CausalSuDORMRF(**hp)
    rng = np.random.default_rng(0)
    t = 4800
    mixture = rng.standard_normal(t).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, 640)))["params"]
    # randomize skipinit gains so blocks actually contribute
    flat = tu.flatten_dict(params)
    for k in flat:
        if k[-1] == "skipinit_gain":
            flat[k] = jnp.asarray(0.7)
    params = tu.unflatten_dict(flat)

    offline = np.asarray(
        model.apply({"params": params}, jnp.asarray(mixture[None, None, :]))
    )[0]

    sep = StreamingSeparator(
        model, params, hop_samples=80, context_samples=1600, num_sources=2,
        lookahead_samples=160,
    )
    streamed = sep.separate_stream(mixture)
    assert streamed.shape == offline.shape == (2, t)
    head, tail = 400, hp["enc_kernel_size"] // 2 + 1
    np.testing.assert_allclose(
        streamed[:, head:-tail], offline[:, head:-tail], rtol=1e-4, atol=1e-5
    )

    # emission stability: a shorter stream emits identical samples
    sep.reset()
    shorter = sep.separate_stream(mixture[:2400])
    overlap = 2400 - sep.lookahead
    np.testing.assert_array_equal(
        shorter[:, :overlap], streamed[:, :overlap]
    )


def test_streaming_push_contract():
    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.inference.streaming import StreamingSeparator

    hp = dict(in_audio_channels=1, out_channels=16, in_channels=32,
              num_blocks=1, upsampling_depth=2, enc_kernel_size=21,
              enc_num_basis=16, num_sources=2)
    model = models.CausalSuDORMRF(**hp)
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, 640)))["params"]
    sep = StreamingSeparator(model, params, hop_samples=80, context_samples=320)
    out = sep.push(np.zeros(80, np.float32))
    assert out.shape == (2, 80)
    import pytest

    with pytest.raises(ValueError):
        sep.push(np.zeros(81, np.float32))
