"""Every registry name constructs and runs a forward at tiny size — the
reference's in-file __main__ smoke tests (SURVEY.md section 4.2), as a
matrix."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import models

CASES = {
    "relu": dict(out_channels=16, in_channels=32, num_blocks=1,
                 upsampling_depth=2, enc_kernel_size=21, enc_num_basis=16,
                 num_sources=2),
    "softmax": dict(out_channels=16, in_channels=32, num_blocks=1,
                    upsampling_depth=2, enc_kernel_size=21, enc_num_basis=16,
                    num_sources=2),
    "groupcomm_v2": dict(out_channels=16, in_channels=32, num_blocks=1,
                         upsampling_depth=2, enc_kernel_size=21,
                         enc_num_basis=16, num_sources=2, group_size=4),
    "causal": dict(out_channels=16, in_channels=32, num_blocks=1,
                   upsampling_depth=2, enc_kernel_size=21, enc_num_basis=16,
                   num_sources=2),
    "attention": dict(out_channels=16, in_channels=32, num_blocks=1,
                      upsampling_depth=3, enc_kernel_size=21, enc_num_basis=16,
                      num_sources=2),
    "attention_v2": dict(out_channels=16, in_channels=32, num_blocks=1,
                         upsampling_depth=3, enc_kernel_size=21,
                         enc_num_basis=16, num_sources=2),
    "attention_v3": dict(out_channels=16, in_channels=32, num_blocks=1,
                         upsampling_depth=3, enc_kernel_size=21,
                         enc_num_basis=16, num_sources=2),
    "convtasnet": dict(enc_dim=32, feature_dim=16, layer=2, stack=1, num_spk=2),
    "dprnn": dict(enc_dim=16, feature_dim=8, hidden_dim=8, layer=1,
                  segment_size=20, nspk=2, win_len=2),
    "demucs": dict(sources=2, channels=8, depth=2, lstm_layers=1),
    "tdcn": dict(N=16, L=21, B=8, H=12, P=3, X=2, R=1, S=2),
    "sepformer": dict(encoder_kernel_size=16, encoder_out_nchannels=16,
                      masknet_chunksize=20, masknet_numlayers=1,
                      intra_numlayers=1, inter_numlayers=1, intra_nhead=4,
                      inter_nhead=4, intra_dffn=16, inter_dffn=16),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_registry_model_forward(name):
    model = models.get_model(name, **CASES[name])
    t = 1680
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1, t)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), x)
    y = np.asarray(model.apply(variables, x))
    assert y.shape[0] == 2 and y.shape[1] == 2  # batch, sources
    assert y.shape[-1] == t  # length-preserving
    assert np.isfinite(y).all()


def test_residual_tdcn_smoke():
    # needs R*X >= 28 for its hardcoded residual table
    model = models.get_model("residual_tdcn", N=16, L=21, B=8, H=12, P=3,
                             X=8, R=4, S=2)
    x = jnp.zeros((1, 1, 800), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    y = np.asarray(model.apply(variables, x))
    assert y.shape[:2] == (1, 2) and np.isfinite(y).all()
