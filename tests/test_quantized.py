"""Int8 quantized serving path: matmul accuracy + end-to-end fidelity.

The int8 path is a *gated* serving configuration (like bf16): correctness
here means (a) the quantized matmul primitive is accurate to int8 physics,
(b) the end-to-end forward tracks the exact fp32 forward within the
fidelity gate bench.py enforces, and (c) shapes/jit behave.
"""

import numpy as np

import jax.numpy as jnp
import jax

from sudo_rm_rf_tpu import models
from sudo_rm_rf_tpu.models.fast_inference import improved_forward_fast
from sudo_rm_rf_tpu.models.quantized import (
    _mm_int8,
    fidelity_db,
    improved_forward_int8,
    quantize_improved_params,
    quantize_weight_per_channel,
)


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.3
    v = rng.standard_normal((2, 128, 160)).astype(np.float32)
    want = np.einsum("oc,bct->bot", w, v)
    got = np.asarray(
        _mm_int8(quantize_weight_per_channel(jnp.asarray(w)), jnp.asarray(v),
                 out_dtype=jnp.float32)
    )
    snr = fidelity_db(want, got)
    # int8 weight+act: ~7 effective bits on gaussian data -> well above 30 dB
    assert snr > 30.0, snr


def test_quantized_weight_roundtrip_scale():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((16, 32)).astype(np.float32)
    q = quantize_weight_per_channel(jnp.asarray(w))
    assert q["q"].dtype == jnp.int8
    back = np.asarray(q["q"], np.float32) * np.asarray(q["s"])[:, None]
    # per-channel absmax maps to exactly +-127
    assert np.all(np.abs(np.asarray(q["q"])).max(axis=1) == 127)
    assert np.max(np.abs(back - w)) < np.max(np.abs(w)) / 127.0 + 1e-6


def test_improved_forward_int8_fidelity():
    hp = dict(out_channels=32, in_channels=64, num_blocks=4, upsampling_depth=3,
              enc_kernel_size=21, enc_num_basis=24, num_sources=2)
    model = models.SuDORMRFImproved(**hp)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 1, 1286)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), x)
    want = np.asarray(
        improved_forward_fast(
            variables["params"], x, num_blocks=4, upsampling_depth=3,
            enc_kernel_size=21, num_sources=2,
        )
    )
    qp = quantize_improved_params(variables["params"])
    got = np.asarray(
        improved_forward_int8(qp, x, upsampling_depth=3, enc_kernel_size=21,
                              num_sources=2)
    )
    assert got.shape == want.shape == (2, 2, 1286)
    assert got.dtype == np.float32
    snr = fidelity_db(want, got)
    # untrained random params are the adversarial case (no learned structure);
    # the serving gate in bench.py re-measures on the actual checkpoint
    assert snr > 15.0, snr


def test_improved_forward_int8_deterministic():
    hp = dict(out_channels=32, in_channels=64, num_blocks=2, upsampling_depth=3,
              enc_kernel_size=21, enc_num_basis=24, num_sources=2)
    model = models.SuDORMRFImproved(**hp)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 1, 661)).astype(np.float32)
    )
    variables = model.init(jax.random.key(1), x)
    qp = quantize_improved_params(variables["params"])
    a = np.asarray(improved_forward_int8(qp, x, upsampling_depth=3,
                                         enc_kernel_size=21, num_sources=2))
    b = np.asarray(improved_forward_int8(qp, x, upsampling_depth=3,
                                         enc_kernel_size=21, num_sources=2))
    np.testing.assert_array_equal(a, b)
