"""End-to-end forward parity: our flax models vs the torch reference models,
with weights transplanted through the checkpoint converter.

These are the strongest tests in the suite: they pin the encoder padding
arithmetic, every conv/norm/activation, the mask heads, and the transposed
conv decoders, all at once.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import models
from sudo_rm_rf_tpu.convert import state_dict_to_params


def _forward_pair(ref_model, jax_model, x_np, ignore_unused=()):
    ref_model.eval()
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x_np)).numpy()

    shapes = jax.eval_shape(jax_model.init, jax.random.key(0), jnp.array(x_np))
    params = state_dict_to_params(
        ref_model.state_dict(), shapes["params"], ignore_unused=ignore_unused
    )
    got = np.asarray(jax_model.apply({"params": params}, jnp.array(x_np)))
    return want, got


# small-but-representative hyperparams: odd input length exercises padding
HP = dict(
    out_channels=16,
    in_channels=32,
    num_blocks=2,
    upsampling_depth=3,
    enc_kernel_size=21,
    enc_num_basis=24,
    num_sources=2,
)


def test_improved_sudormrf_parity():
    from sudo_rm_rf.dnn.models import improved_sudormrf as ref

    torch.manual_seed(0)
    ref_model = ref.SuDORMRF(**HP)
    jax_model = models.SuDORMRFImproved(**HP)
    x = np.random.default_rng(0).standard_normal((2, 1, 661)).astype(np.float32)
    want, got = _forward_pair(ref_model, jax_model, x)
    assert got.shape == want.shape == (2, 2, 661)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sudormrf_v1_parity():
    from sudo_rm_rf.dnn.models import sudormrf as ref

    torch.manual_seed(1)
    ref_model = ref.SuDORMRF(**HP)
    jax_model = models.SuDORMRFv1(**HP)
    x = np.random.default_rng(1).standard_normal((2, 1, 661)).astype(np.float32)
    want, got = _forward_pair(ref_model, jax_model, x, ignore_unused=("ln_mask_in",))
    assert got.shape == want.shape == (2, 2, 661)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_groupcomm_v2_parity():
    from sudo_rm_rf.dnn.models import groupcomm_sudormrf_v2 as ref

    hp = dict(
        in_audio_channels=1,
        out_channels=32,
        in_channels=64,
        num_blocks=2,
        upsampling_depth=3,
        enc_kernel_size=21,
        enc_num_basis=24,
        num_sources=2,
        group_size=4,
    )
    torch.manual_seed(2)
    ref_model = ref.GroupCommSudoRmRf(**hp)
    jax_model = models.GroupCommSuDORMRF(**hp)
    x = np.random.default_rng(2).standard_normal((2, 1, 661)).astype(np.float32)
    want, got = _forward_pair(ref_model, jax_model, x)
    assert got.shape == want.shape == (2, 2, 661)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_groupcomm_v2_multichannel_parity():
    from sudo_rm_rf.dnn.models import groupcomm_sudormrf_v2 as ref

    hp = dict(
        in_audio_channels=2,
        out_channels=32,
        in_channels=64,
        num_blocks=1,
        upsampling_depth=3,
        enc_kernel_size=21,
        enc_num_basis=24,
        num_sources=2,
        group_size=4,
    )
    torch.manual_seed(3)
    ref_model = ref.GroupCommSudoRmRf(**hp)
    jax_model = models.GroupCommSuDORMRF(**hp)
    x = np.random.default_rng(3).standard_normal((2, 2, 661)).astype(np.float32)
    want, got = _forward_pair(ref_model, jax_model, x)
    assert got.shape == want.shape == (2, 4, 661)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_groupcomm_fma_blocks_match_reference_blocks():
    """block_impl='fma' (bandwidth-shaped TAC + group-merged FMA ladder) has
    the identical param tree and matches the reference blocks in outputs AND
    grads — it is the fast TRAINABLE GroupComm path (round-2 VERDICT #2)."""
    import jax
    import jax.numpy as jnp

    hp = dict(
        in_audio_channels=1, out_channels=32, in_channels=64, num_blocks=2,
        upsampling_depth=3, enc_kernel_size=21, enc_num_basis=24,
        num_sources=2, group_size=4,
    )
    slow = models.GroupCommSuDORMRF(**hp)
    fast = models.GroupCommSuDORMRF(**hp, block_impl="fma")
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 1, 661)).astype(np.float32)
    )
    params = slow.init(jax.random.key(0), x)["params"]
    fast_shapes = jax.eval_shape(fast.init, jax.random.key(0), x)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(fast_shapes)
    for p, (a, b) in zip(
        jax.tree.leaves(jax.tree.map(lambda v: v.shape, params)),
        zip(jax.tree.leaves(jax.tree.map(lambda v: v.shape, fast_shapes)),
            jax.tree.leaves(fast_shapes)),
    ):
        assert p == a

    want = np.asarray(slow.apply({"params": params}, x))
    got = np.asarray(fast.apply({"params": params}, x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def loss(model):
        def f(p):
            est = model.apply({"params": p}, x)
            return jnp.mean((est - jnp.roll(x, 7, axis=-1)) ** 2)
        return f

    g_slow = jax.grad(loss(slow))(params)
    g_fast = jax.grad(loss(fast))(params)
    for a, b in zip(jax.tree.leaves(g_slow), jax.tree.leaves(g_fast)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)

    # remat composes with the fast blocks
    rem = models.GroupCommSuDORMRF(**hp, block_impl="fma", remat_blocks=True)
    g_rem = jax.grad(loss(rem))(params)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_rem)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-8)


def test_causal_v3_parity():
    from sudo_rm_rf.dnn.models import causal_improved_sudormrf_v3 as ref

    hp = dict(
        in_audio_channels=1,
        out_channels=16,
        in_channels=32,
        num_blocks=2,
        upsampling_depth=3,
        enc_kernel_size=21,
        enc_num_basis=24,
        num_sources=2,
    )
    torch.manual_seed(4)
    ref_model = ref.CausalSuDORMRF(**hp)
    # skipinit_gain is zero-init, which would hide the whole block: randomize
    with torch.no_grad():
        for name, p in ref_model.named_parameters():
            if "skipinit_gain" in name:
                p.fill_(0.7)
    jax_model = models.CausalSuDORMRF(**hp)
    x = np.random.default_rng(4).standard_normal((2, 1, 661)).astype(np.float32)
    want, got = _forward_pair(ref_model, jax_model, x)
    assert got.shape == want.shape == (2, 2, 661)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_causal_v3_is_actually_causal():
    """Future samples must not affect past outputs (streaming contract)."""
    hp = dict(
        in_audio_channels=1,
        out_channels=16,
        in_channels=32,
        num_blocks=1,
        upsampling_depth=2,
        enc_kernel_size=21,
        enc_num_basis=24,
        num_sources=2,
    )
    model = models.CausalSuDORMRF(**hp)
    x1 = np.random.default_rng(5).standard_normal((1, 1, 640)).astype(np.float32)
    x2 = x1.copy()
    x2[..., 400:] += 10.0  # perturb the future
    params = model.init(jax.random.key(0), jnp.array(x1))
    y1 = np.asarray(model.apply(params, jnp.array(x1)))
    y2 = np.asarray(model.apply(params, jnp.array(x2)))
    # outputs strictly before the perturbation (minus enc stride slack + the
    # decoder's backward reach of one kernel) must be identical
    safe = 400 - 2 * hp["enc_kernel_size"] * 2**hp["upsampling_depth"]
    assert safe > 0
    np.testing.assert_allclose(y1[..., :safe], y2[..., :safe], atol=1e-5)


def test_registry_dispatch():
    m = models.get_model("relu", **HP)
    assert isinstance(m, models.SuDORMRFImproved)
    m = models.get_model("groupcomm_v2")
    assert isinstance(m, models.GroupCommSuDORMRF)
    with pytest.raises(KeyError):
        models.get_model("nope")


def test_flax_to_torch_export_roundtrip():
    """params_to_state_dict: a flax-trained model exports into the torch
    reference and reproduces the flax forward — checkpoint interchange runs
    both ways (torch users can consume models trained here)."""
    from sudo_rm_rf.dnn.models import improved_sudormrf as ref
    from sudo_rm_rf_tpu.convert import params_to_state_dict

    jax_model = models.SuDORMRFImproved(**HP)
    x = np.random.default_rng(7).standard_normal((2, 1, 661)).astype(np.float32)
    params = jax_model.init(jax.random.key(3), jnp.array(x))["params"]
    got = np.asarray(jax_model.apply({"params": params}, jnp.array(x)))

    torch_model = ref.SuDORMRF(**HP).eval()
    sd = params_to_state_dict(
        params, target_keys=torch_model.state_dict().keys(), to_torch=True
    )
    torch_model.load_state_dict(sd, strict=True)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # heuristic path (no target keys) must round-trip through the forward
    # converter to the identical tree
    sd2 = params_to_state_dict(params)
    back = state_dict_to_params(sd2, params)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flax_to_torch_export_groupcomm():
    from sudo_rm_rf.dnn.models import groupcomm_sudormrf_v2 as ref
    from sudo_rm_rf_tpu.convert import params_to_state_dict

    hp = dict(in_audio_channels=1, out_channels=32, in_channels=64,
              num_blocks=2, upsampling_depth=3, enc_kernel_size=21,
              enc_num_basis=24, num_sources=2, group_size=4)
    jax_model = models.GroupCommSuDORMRF(**hp)
    x = np.random.default_rng(8).standard_normal((2, 1, 661)).astype(np.float32)
    params = jax_model.init(jax.random.key(4), jnp.array(x))["params"]
    got = np.asarray(jax_model.apply({"params": params}, jnp.array(x)))

    torch_model = ref.GroupCommSudoRmRf(**hp).eval()
    sd = params_to_state_dict(
        params, target_keys=torch_model.state_dict().keys(), to_torch=True
    )
    torch_model.load_state_dict(sd, strict=True)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
