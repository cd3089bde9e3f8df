"""Forward parity for the attentive SuDoRM-RF variants vs the torch reference."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import models
from sudo_rm_rf_tpu.convert import state_dict_to_params

# enc_kernel_size must stay 21: other kernels can produce encoder lengths not
# divisible by 2^(depth-1), which crashes the reference's additive ladder too.
HP = dict(
    out_channels=16,
    in_channels=32,
    num_blocks=2,
    upsampling_depth=3,
    enc_kernel_size=21,
    enc_num_basis=16,
    num_sources=2,
)


def _run_pair(ref_model, jax_model, x):
    ref_model.eval()
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x)).numpy()
    shapes = jax.eval_shape(jax_model.init, jax.random.key(0), jnp.array(x))
    params = state_dict_to_params(ref_model.state_dict(), shapes["params"])
    got = np.asarray(jax_model.apply({"params": params}, jnp.array(x)))
    return want, got


def test_attentive_v2_parity():
    from sudo_rm_rf.dnn.models import attentive_sudormrf_v2 as ref

    torch.manual_seed(0)
    rm = ref.SuDORMRF(**HP)
    jm = models.get_model("attention_v2", **HP)
    x = np.random.default_rng(0).standard_normal((2, 1, 501)).astype(np.float32)
    want, got = _run_pair(rm, jm, x)
    assert got.shape == want.shape == (2, 2, 501)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_attentive_v3_parity():
    from sudo_rm_rf.dnn.models import attentive_sudormrf_v3 as ref

    torch.manual_seed(1)
    rm = ref.SuDORMRF(**HP)
    jm = models.get_model("attention_v3", **HP)
    x = np.random.default_rng(1).standard_normal((2, 1, 501)).astype(np.float32)
    want, got = _run_pair(rm, jm, x)
    assert got.shape == want.shape == (2, 2, 501)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_attentive_v1_parity_with_patched_reference():
    """The upstream v1 MHANormLayer.forward references in/out linears that
    are commented out of __init__ (attentive_sudormrf.py:163-167) — it
    crashes as shipped. Patch the reference with the evident intent and
    check parity against our restored implementation."""
    from sudo_rm_rf.dnn.models import attentive_sudormrf as ref

    torch.manual_seed(2)
    rm = ref.SuDORMRF(**HP)
    for blk in rm.sm:
        att = blk.attention
        att.in_linear = torch.nn.Linear(HP["in_channels"], 256)
        att.out_linear = torch.nn.Linear(256, HP["in_channels"])
    jm = models.get_model("attention", **HP)
    x = np.random.default_rng(2).standard_normal((1, 1, 501)).astype(np.float32)
    want, got = _run_pair(rm, jm, x)
    assert got.shape == want.shape == (1, 2, 501)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_attentive_upstream_v1_is_broken():
    """Documents why the v1 parity test patches the reference."""
    from sudo_rm_rf.dnn.models import attentive_sudormrf as ref

    rm = ref.SuDORMRF(**HP)
    with pytest.raises(AttributeError):
        rm(torch.rand(1, 1, 501))


def test_attentive_scan_blocks_parity():
    """scan_blocks=True (one lax.scan over stacked block params) matches the
    unrolled stack exactly after stack_block_params conversion."""
    from sudo_rm_rf_tpu.models.attentive import (
        AttentiveSuDORMRFv2, AttentiveSuDORMRFv3, stack_block_params)

    hp = dict(out_channels=16, in_channels=32, num_blocks=3, upsampling_depth=3,
              enc_kernel_size=21, enc_num_basis=16, num_sources=2)
    for ctor in (AttentiveSuDORMRFv2, AttentiveSuDORMRFv3):
        m_unr = ctor(**hp)
        m_scan = ctor(**hp, scan_blocks=True)
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((2, 1, 1344)).astype(np.float32)
        )
        params = m_unr.init(jax.random.key(0), x)["params"]
        want = np.asarray(m_unr.apply({"params": params}, x))
        got = np.asarray(
            m_scan.apply({"params": stack_block_params(params, 3)}, x)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
