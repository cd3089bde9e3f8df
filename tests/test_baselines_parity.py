"""Forward parity for baseline models vs the torch reference."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu.convert import state_dict_to_params


def _convert_and_run(ref_model, jax_model, x, ignore_unused=()):
    ref_model.eval()
    with torch.no_grad():
        want = ref_model(torch.from_numpy(x)).numpy()
    shapes = jax.eval_shape(jax_model.init, jax.random.key(0), jnp.array(x))
    params = state_dict_to_params(
        ref_model.state_dict(), shapes["params"], ignore_unused=ignore_unused
    )
    got = np.asarray(jax_model.apply({"params": params}, jnp.array(x)))
    return want, got


@pytest.mark.parametrize("causal", [False, True])
def test_convtasnet_parity(causal):
    from sudo_rm_rf.dnn.models.original_convtasnet import TasNet

    from sudo_rm_rf_tpu.models.baselines.convtasnet import ConvTasNet

    hp = dict(enc_dim=48, feature_dim=16, sr=8000, win=2, layer=3, stack=2,
              kernel=3, num_spk=2, causal=causal)
    torch.manual_seed(0)
    rm = TasNet(**hp)
    jm = ConvTasNet(**hp)
    x = np.random.default_rng(0).standard_normal((2, 1, 3210)).astype(np.float32)
    want, got = _convert_and_run(rm, jm, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_dprnn_parity():
    from sudo_rm_rf.dnn.models.dprnn import FaSNet_base

    from sudo_rm_rf_tpu.models.baselines.dprnn import DPRNN

    torch.manual_seed(1)
    rm = FaSNet_base(enc_dim=32, feature_dim=16, hidden_dim=24, layer=2,
                     segment_size=20, nspk=2, win_len=2)
    jm = DPRNN(enc_dim=32, feature_dim=16, hidden_dim=24, layer=2,
               segment_size=20, nspk=2, win_len=2)
    x = np.random.default_rng(1).standard_normal((2, 1600)).astype(np.float32)
    want, got = _convert_and_run(rm, jm, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_overlap_and_add_matches_reference():
    from sudo_rm_rf.dnn.models.dprnn import overlap_and_add as ref_ola

    from sudo_rm_rf_tpu import ops

    rng = np.random.default_rng(2)
    sig = rng.standard_normal((3, 4, 10, 6)).astype(np.float32)
    for step in (2, 3, 6):
        want = ref_ola(torch.from_numpy(sig), step).numpy()
        got = np.asarray(ops.overlap_and_add(jnp.array(sig), step))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_demucs_parity():
    from sudo_rm_rf.dnn.models.demucs import Demucs as RefDemucs

    from sudo_rm_rf_tpu.models.baselines.demucs import Demucs

    torch.manual_seed(2)
    hp = dict(sources=2, audio_channels=1, channels=8, depth=3, lstm_layers=2,
              kernel_size=8, stride=4, context=3)
    rm = RefDemucs(**hp)
    jm = Demucs(**hp)
    x = np.random.default_rng(3).standard_normal((2, 4000)).astype(np.float32)
    want, got = _convert_and_run(rm, jm, x)
    assert got.shape == want.shape == (2, 2, 4000)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_demucs_upsample_mode_parity():
    from sudo_rm_rf.dnn.models.demucs import Demucs as RefDemucs

    from sudo_rm_rf_tpu.models.baselines.demucs import Demucs

    torch.manual_seed(3)
    hp = dict(sources=2, audio_channels=1, channels=8, depth=2, lstm_layers=1,
              kernel_size=8, stride=4, context=3, upsample=True)
    rm = RefDemucs(**hp)
    jm = Demucs(**hp)
    x = np.random.default_rng(4).standard_normal((1, 4000)).astype(np.float32)
    want, got = _convert_and_run(rm, jm, x)
    assert got.shape == want.shape == (1, 2, 4000)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_tdcn_parity():
    from sudo_rm_rf.dnn.models.two_step_tdcn import TDCN as RefTDCN

    from sudo_rm_rf_tpu.models.baselines.tdcn import TDCN

    torch.manual_seed(4)
    hp = dict(N=32, L=21, B=16, H=24, P=3, X=3, R=2, S=2)
    rm = RefTDCN(**hp)
    jm = TDCN(**hp)
    x = np.random.default_rng(5).standard_normal((2, 1, 3200)).astype(np.float32)
    want, got = _convert_and_run(rm, jm, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_residual_tdcn_parity():
    from sudo_rm_rf.dnn.models.two_step_tdcn import ResidualTN as RefRTN

    from sudo_rm_rf_tpu.models.baselines.tdcn import ResidualTN

    torch.manual_seed(5)
    hp = dict(N=32, L=21, B=16, H=24, P=3, X=8, R=4, S=2)
    rm = RefRTN(**hp)
    # randomize BatchNorm running stats so the mapping is actually exercised
    with torch.no_grad():
        for name, buf in rm.named_buffers():
            if name.endswith("running_mean"):
                buf.uniform_(-0.5, 0.5)
            elif name.endswith("running_var"):
                buf.uniform_(0.5, 1.5)
    jm = ResidualTN(**hp)
    x = np.random.default_rng(6).standard_normal((1, 1, 1600)).astype(np.float32)
    want, got = _convert_and_run(rm, jm, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-4)


def test_sepformer_parity():
    from sudo_rm_rf.dnn.models.sepformer import SepformerWrapper

    from sudo_rm_rf_tpu.models.baselines.sepformer import SepFormer

    torch.manual_seed(6)
    hp = dict(encoder_kernel_size=16, encoder_in_nchannels=1,
              encoder_out_nchannels=16, masknet_chunksize=20,
              masknet_numlayers=2, masknet_norm="ln",
              masknet_useextralinearlayer=False, masknet_extraskipconnection=True,
              masknet_numspks=2, intra_numlayers=2, inter_numlayers=2,
              intra_nhead=4, inter_nhead=4, intra_dffn=32, inter_dffn=32,
              intra_use_positional=True, inter_use_positional=True,
              intra_norm_before=True, inter_norm_before=True)
    rm = SepformerWrapper(**hp)
    jm = SepFormer(**hp)
    x = np.random.default_rng(7).standard_normal((2, 1, 1600)).astype(np.float32)
    want, got = _convert_and_run(rm, jm, x)
    assert got.shape == want.shape == (2, 2, 1600)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_dptnet_block_parity():
    """DPTNetBlock (`sepformer.py:1183-1260`) — the instantiable alt block.

    The upstream block is built seq-first (no batch_first) but fed
    (B, L, N), so its attention/recurrence run across the batch axis; our
    block implements the per-sequence intent, which equals the upstream
    computation on the transposed tensor — checked both ways here.
    """
    from sudo_rm_rf.dnn.models.sepformer import DPTNetBlock as RefBlock

    from sudo_rm_rf_tpu.models.baselines.sepformer import DPTNetBlock

    ref = RefBlock(d_model=16, nhead=4)
    jm = DPTNetBlock(d_model=16, nhead=4)
    x = np.random.default_rng(31).standard_normal((2, 40, 16)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    shapes = jax.eval_shape(
        jm.init, jax.random.key(0), jnp.array(np.swapaxes(x, 0, 1))
    )
    params = state_dict_to_params(ref.state_dict(), shapes["params"])
    got = np.swapaxes(
        np.asarray(jm.apply({"params": params}, jnp.array(np.swapaxes(x, 0, 1)))),
        0, 1,
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sbrnn_block_upstream_broken_and_intent():
    """SBRNNBlock upstream references an un-imported `SBRNN` symbol
    (`sepformer.py:1159`) -> NameError; our block implements the evident
    intent (speechbrain bidirectional LSTM returning raw (B, L, 2H))."""
    from sudo_rm_rf.dnn.models import sepformer as ref_sep

    with pytest.raises(NameError):
        ref_sep.SBRNNBlock(16, 24, 1, bidirectional=True)

    from sudo_rm_rf_tpu.models.baselines.sepformer import SBRNNBlock

    jm = SBRNNBlock(input_size=16, hidden_channels=24, num_layers=1,
                    bidirectional=True)
    x = np.random.default_rng(32).standard_normal((2, 40, 16)).astype(np.float32)
    shapes = jax.eval_shape(jm.init, jax.random.key(0), jnp.array(x))

    # intent oracle: plain torch LSTM with the same (converted) weights
    ref = torch.nn.LSTM(input_size=16, hidden_size=24, num_layers=1,
                        bidirectional=True, batch_first=True)
    sd = {f"mdl.rnn.{k}": v for k, v in ref.state_dict().items()}
    params = state_dict_to_params(sd, shapes["params"])
    ref.eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(x))[0].numpy()
    got = np.asarray(jm.apply({"params": params}, jnp.array(x)))
    assert got.shape == (2, 40, 48)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pytorch_transformer_block_parity():
    """PytorchTransformerBlock (`sepformer.py:948-1020`): the upstream
    wrapper builds a seq-first nn.TransformerEncoder but feeds (B, L, N),
    so — like DPTNetBlock — the literal upstream runs attention across the
    batch axis. Our block implements the per-sequence intent; feeding the
    upstream module the transposed tensor recovers it exactly (the
    positional encoding then also lands on the sequence axis, as written).
    """
    from sudo_rm_rf.dnn.models.sepformer import PytorchTransformerBlock as Ref

    from sudo_rm_rf_tpu.models.baselines.sepformer import (
        PytorchTransformerBlock,
    )

    ref = Ref(16, num_layers=2, nhead=4, d_ffn=32, dropout=0.0,
              use_positional_encoding=True)
    jm = PytorchTransformerBlock(out_channels=16, num_layers=2, nhead=4,
                                 d_ffn=32, use_positional_encoding=True)
    x = np.random.default_rng(34).standard_normal((2, 40, 16)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        # intent orientation: (L, B, N) into the seq-first upstream module
        want = ref(torch.from_numpy(np.swapaxes(x, 0, 1))).numpy()
    shapes = jax.eval_shape(jm.init, jax.random.key(0), jnp.array(x))
    params = state_dict_to_params(ref.state_dict(), shapes["params"])
    got = np.swapaxes(np.asarray(jm.apply({"params": params}, jnp.array(x))),
                      0, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fast_transformer_block_upstream_unrunnable_and_linear_attention():
    """Upstream FastTransformerBlock (`sepformer.py:802-891`) imports the
    external fast_transformers library inside __init__ — absent from the
    reference requirements and from this environment, so the upstream class
    cannot be constructed (no golden parity possible). Our block: linear
    attention must equal its naive quadratic form, and the reformer
    bucket-pad wrapper must preserve length."""
    from sudo_rm_rf.dnn.models import sepformer as ref_sep

    with pytest.raises(ImportError):
        ref_sep.FastTransformerBlock("linear", 16)

    from sudo_rm_rf_tpu.models.baselines.sepformer import (
        FastTransformerBlock, _LinearAttention,
    )

    # linear attention == naive O(L^2) kernelized attention
    att = _LinearAttention(d_model=16, nhead=4)
    x = np.random.default_rng(35).standard_normal((2, 24, 16)).astype(np.float32)
    params = att.init(jax.random.key(0), jnp.array(x))["params"]
    got = np.asarray(att.apply({"params": params}, jnp.array(x)))

    def lin(p, v):  # (B, L, D) x torch-layout (O, C) weight
        return np.einsum("blc,oc->blo", v, np.asarray(p["weight"])) + np.asarray(
            p["bias"]
        )

    def elu1(v):
        return np.where(v > 0, v, np.expm1(v)) + 1.0

    q = lin(params["q_proj"], x).reshape(2, 24, 4, 4)
    k = lin(params["k_proj"], x).reshape(2, 24, 4, 4)
    v = lin(params["v_proj"], x).reshape(2, 24, 4, 4)
    scores = np.einsum("blhd,bshd->bhls", elu1(q), elu1(k))
    weights = scores / (scores.sum(-1, keepdims=True) + 1e-6)
    naive = np.einsum("bhls,bshd->blhd", weights, v).reshape(2, 24, 16)
    want = lin(params["out_proj"], naive)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # reformer wrapper: zero-pad to bucket multiple, truncate back
    blk = FastTransformerBlock(out_channels=16, attention_type="reformer",
                               num_layers=1, nhead=4, d_ffn=32,
                               reformer_bucket_size=8)
    bp = blk.init(jax.random.key(1), jnp.array(x))["params"]
    y = np.asarray(blk.apply({"params": bp}, jnp.array(x)))
    assert y.shape == x.shape
    assert np.isfinite(y).all()


@pytest.mark.parametrize("kind", ["rnn", "dptnet", "pytorch", "fast"])
def test_sepformer_alt_block_forward(kind):
    """SepFormer with the alternative dual-path block families runs and
    preserves length (the reference never wires these into a runner; we
    expose them via intra/inter_block_type)."""
    from sudo_rm_rf_tpu.models.baselines.sepformer import SepFormer

    jm = SepFormer(
        encoder_kernel_size=16, encoder_out_nchannels=16,
        masknet_chunksize=20, masknet_numlayers=1, masknet_numspks=2,
        intra_numlayers=1, inter_numlayers=1, intra_nhead=4, inter_nhead=4,
        intra_dffn=32, inter_dffn=32,
        intra_block_type=kind, inter_block_type=kind, rnn_hidden=12,
        masknet_useextralinearlayer=(kind == "rnn"),
    )
    x = np.random.default_rng(33).standard_normal((2, 1, 1600)).astype(np.float32)
    params = jm.init(jax.random.key(0), jnp.array(x))["params"]
    y = np.asarray(jm.apply({"params": params}, jnp.array(x)))
    assert y.shape == (2, 2, 1600)
    assert np.isfinite(y).all()


def test_sepformer_scan_layers_parity():
    """scan_layers=True (lax.scan over stacked encoder layers) matches the
    unrolled SepFormer exactly after stack_sepformer_params conversion."""
    from sudo_rm_rf_tpu.models.baselines.sepformer import (
        SepFormer, stack_sepformer_params)

    hp = dict(encoder_kernel_size=16, encoder_out_nchannels=16,
              masknet_chunksize=20, masknet_numlayers=2, masknet_numspks=2,
              intra_numlayers=2, inter_numlayers=2, intra_nhead=4,
              inter_nhead=4, intra_dffn=32, inter_dffn=32)
    m_unr = SepFormer(**hp)
    m_scan = SepFormer(**hp, scan_layers=True)
    x = np.random.default_rng(34).standard_normal((2, 1, 1600)).astype(np.float32)
    params = m_unr.init(jax.random.key(0), jnp.array(x))["params"]
    want = np.asarray(m_unr.apply({"params": params}, jnp.array(x)))
    stacked = stack_sepformer_params(params, numlayers=2,
                                     intra_numlayers=2, inter_numlayers=2)
    got = np.asarray(m_scan.apply({"params": stacked}, jnp.array(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
