"""SepFormer baseline (dual-path transformer, vendored from SpeechBrain).

Behavioral spec from `sudo_rm_rf/dnn/models/sepformer.py`:
  * Encoder: Conv1d(1->N, k, stride=k//2, bias-free) + ReLU (`:673-730`)
  * Dual_Path_Model masknet (`:1412-1568`): norm -> 1x1 (bias-free) ->
    segmentation into 50%-overlap chunks -> num_layers x
    Dual_Computation_Block (intra transformer over chunk time, inter
    transformer across chunks, each + GroupNorm + skips, `:1277-1408`) ->
    PReLU -> Conv2d to spks*N -> overlap-add -> gated tanh/sigmoid ->
    bias-free 1x1 back to N -> ReLU
  * each transformer block = SpeechBrain TransformerEncoder (`:437-533`):
    pre/post-norm MHA + positionwise FFN, LayerNorm eps 1e-6, plus sinusoidal
    positional encoding ADDED ONCE at block input (`:1101-1117`)
  * Decoder: shared bias-free ConvTranspose1d applied per source, output
    padded/cropped to the input length (`:733-780`, `:1807-1831`)

Notes: the vendored ``linear_layer_after_inter_intra=True`` path calls
``torch.nn.Linear(out, input_size=...)`` which is a TypeError upstream — the
repo always uses False; we implement the evident intent when enabled.
Dropout is 0 by default (`:356`, `:477`).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import ops
from sudo_rm_rf_tpu.models.layers import Conv1d, ConvTranspose1d, PReLU
from sudo_rm_rf_tpu.models.sudormrf import GroupNorm1
from sudo_rm_rf_tpu.models.groupcomm_sudormrf import Linear
from sudo_rm_rf_tpu.models.attentive import TorchMHA, sinusoidal_pe
from sudo_rm_rf_tpu.models.baselines.dprnn import Conv2d1x1


class _TorchLayerNorm(nn.Module):
    """torch.nn.LayerNorm over the last dim (params weight/bias)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * w + b


class LayerNormLast(nn.Module):
    """SpeechBrain LayerNorm wrapper: child module named 'norm'
    (`sepformer.py:263-311`)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return _TorchLayerNorm(self.dim, self.eps, name="norm")(x)


class _SBMHA(nn.Module):
    """SpeechBrain MultiheadAttention wrapper: child 'att' (`sepformer.py:70-202`)."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x):
        return TorchMHA(self.d_model, self.nhead, name="att")(x)


class _PosFFN(nn.Module):
    """PositionalwiseFeedForward: Sequential ffn.{0,3} (`sepformer.py:205-260`)."""

    d_model: int
    d_ffn: int

    @nn.compact
    def __call__(self, x):  # (B, L, C)
        def lin(layer, v):
            return layer(jnp.swapaxes(v, -1, -2)).swapaxes(-1, -2)

        y = lin(Linear(self.d_model, self.d_ffn, name="ffn_0"), x)
        y = jax.nn.relu(y)
        return lin(Linear(self.d_ffn, self.d_model, name="ffn_3"), y)


class TransformerEncoderLayer(nn.Module):
    """`sepformer.py:314-434`, regularMHA, channels-last (B, L, C)."""

    d_ffn: int
    nhead: int
    d_model: int
    normalize_before: bool = False

    @nn.compact
    def __call__(self, src):
        norm1 = LayerNormLast(self.d_model, name="norm1")
        norm2 = LayerNormLast(self.d_model, name="norm2")
        att = _SBMHA(self.d_model, self.nhead, name="self_att")

        src1 = norm1(src) if self.normalize_before else src
        src = src + att(src1)
        if not self.normalize_before:
            src = norm1(src)

        src1 = norm2(src) if self.normalize_before else src
        ff = _PosFFN(self.d_model, self.d_ffn, name="pos_ffn")(src1)
        out = src + ff
        if not self.normalize_before:
            out = norm2(out)
        return out


class _ScanEncoderLayer(nn.Module):
    """lax.scan body: one transformer layer per step (stacked params)."""

    d_ffn: int
    nhead: int
    d_model: int
    normalize_before: bool

    @nn.compact
    def __call__(self, carry, _):
        x = TransformerEncoderLayer(
            self.d_ffn, self.nhead, self.d_model,
            normalize_before=self.normalize_before, name="layer",
        )(carry)
        return x, None


def stack_encoder_layers(enc_params: dict, num_layers: int) -> dict:
    """layers_0..layers_{n-1} -> layers_scan/layer stacked on axis 0."""
    subtrees = [enc_params[f"layers_{j}"] for j in range(num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *subtrees)
    out = {k: v for k, v in enc_params.items() if not k.startswith("layers_")}
    out["layers_scan"] = {"layer": stacked}
    return out


class _TransformerEncoder(nn.Module):
    """SpeechBrain TransformerEncoder: layers.{j} + final norm
    (`sepformer.py:437-533`). scan_layers=True runs the stack as one
    lax.scan over stacked params (identical math; the unrolled 32-layer
    SepFormer HLO exceeds the TPU relay's remote-compile size limit)."""

    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int
    norm_before: bool = False
    scan_layers: bool = False

    @nn.compact
    def __call__(self, x):
        if self.scan_layers:
            scanned = nn.scan(
                _ScanEncoderLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.num_layers,
            )
            x, _ = scanned(
                self.d_ffn, self.nhead, self.d_model,
                normalize_before=self.norm_before, name="layers_scan",
            )(x, None)
        else:
            for j in range(self.num_layers):
                x = TransformerEncoderLayer(
                    self.d_ffn, self.nhead, self.d_model,
                    normalize_before=self.norm_before, name=f"layers_{j}",
                )(x)
        return LayerNormLast(self.d_model, name="norm")(x)


class SBTransformerBlock(nn.Module):
    """`sepformer.py:1022-1117`: optional pos-enc add + TransformerEncoder
    under child 'mdl'."""

    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int = 2048
    use_positional_encoding: bool = False
    norm_before: bool = False
    scan_layers: bool = False

    @nn.compact
    def __call__(self, x):  # (B, L, C)
        if self.use_positional_encoding:
            x = x + sinusoidal_pe(x.shape[1], self.d_model, x.dtype)[None]
        return _TransformerEncoder(
            self.num_layers, self.d_model, self.nhead, self.d_ffn,
            norm_before=self.norm_before, scan_layers=self.scan_layers,
            name="mdl",
        )(x)


def stack_sepformer_params(params: dict, numlayers: int = 2,
                           intra_numlayers: int = 8,
                           inter_numlayers: int = 8) -> dict:
    """Convert an unrolled SepFormer param tree to the scan_layers layout
    (each dual block's intra/inter encoder layers stacked)."""
    out = dict(params)
    masknet = dict(params["masknet"])
    for i in range(numlayers):
        dm = dict(masknet[f"dual_mdl_{i}"])
        for which, n in (("intra", intra_numlayers), ("inter", inter_numlayers)):
            blk = dict(dm[f"{which}_mdl"])
            blk["mdl"] = stack_encoder_layers(blk["mdl"], n)
            dm[f"{which}_mdl"] = blk
        masknet[f"dual_mdl_{i}"] = dm
    out["masknet"] = masknet
    return out


class SBRNNBlock(nn.Module):
    """RNN dual-path block (`sepformer.py:1121-1182`) — evident intent.

    Upstream is broken dead code: the class body references ``SBRNN`` (the
    speechbrain RNN lobe) which is never imported in the vendored file, so
    instantiation raises NameError (covered by a test). The intent is a
    bidirectional LSTM over (B, L, N) returning the raw (B, L, 2H) states;
    param tree nests the torch LSTM under ``mdl``/``rnn`` to mirror the
    speechbrain wrapper's state_dict naming.
    """

    input_size: int
    hidden_channels: int
    num_layers: int = 1
    bidirectional: bool = True

    @property
    def out_dim(self) -> int:
        return self.hidden_channels * (2 if self.bidirectional else 1)

    @nn.compact
    def __call__(self, x):  # (B, L, N) -> (B, L, 2H)
        return _SBRNNWrapper(
            self.input_size, self.hidden_channels, self.num_layers,
            self.bidirectional, name="mdl",
        )(x)


class _SBRNNWrapper(nn.Module):
    """speechbrain RNN lobe naming: torch LSTM under child 'rnn'."""

    input_size: int
    hidden_channels: int
    num_layers: int
    bidirectional: bool

    @nn.compact
    def __call__(self, x):
        from sudo_rm_rf_tpu.models.baselines.dprnn import TorchLSTM

        return TorchLSTM(
            self.input_size, self.hidden_channels,
            bidirectional=self.bidirectional, num_layers=self.num_layers,
            name="rnn",
        )(x)


class DPTNetBlock(nn.Module):
    """DPTNet dual-path block (`sepformer.py:1183-1260`): post-norm MHA,
    then a bidirectional LSTM 'feed-forward' (d_model -> 2*d_model per
    direction) + ReLU + Linear back to d_model, both with residuals.

    Upstream quirk: the reference builds seq-first MHA and LSTM (no
    batch_first) yet documents/passes (B, L, N) — its attention and
    recurrence literally run across the BATCH axis. This module implements
    the evident intent (per-sequence over L); the parity test recovers the
    literal upstream numerics by transposing in/out, since the upstream
    block is exactly this block applied to the transposed tensor. Dropout
    is 0 upstream."""

    d_model: int
    nhead: int

    @property
    def out_dim(self) -> int:
        return self.d_model

    @nn.compact
    def __call__(self, src):  # (B, L, N)
        from sudo_rm_rf_tpu.models.baselines.dprnn import TorchLSTM

        src2 = TorchMHA(self.d_model, self.nhead, name="self_attn")(src)
        src = src + src2
        src = _TorchLayerNorm(self.d_model, eps=1e-5, name="norm1")(src)
        src2 = TorchLSTM(
            self.d_model, self.d_model * 2, bidirectional=True, name="rnn"
        )(src)
        src2 = jax.nn.relu(src2)
        src2 = Linear(self.d_model * 4, self.d_model, name="linear2")(
            jnp.swapaxes(src2, -1, -2)
        ).swapaxes(-1, -2)
        src = src + src2
        return _TorchLayerNorm(self.d_model, eps=1e-5, name="norm2")(src)


class _PytorchEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer (post-norm, relu, eval-mode): MHA +
    residual + LayerNorm(eps 1e-5), then linear1->relu->linear2 + residual
    + LayerNorm. Param names mirror the torch state_dict."""

    d_model: int
    nhead: int
    d_ffn: int

    @nn.compact
    def __call__(self, src):  # (B, L, N)
        src2 = TorchMHA(self.d_model, self.nhead, name="self_attn")(src)
        src = _TorchLayerNorm(self.d_model, eps=1e-5, name="norm1")(src + src2)
        h = Linear(self.d_model, self.d_ffn, name="linear1")(
            jnp.swapaxes(src, -1, -2)
        )
        h = jax.nn.relu(h)
        h = Linear(self.d_ffn, self.d_model, name="linear2")(h)
        src2 = jnp.swapaxes(h, -1, -2)
        return _TorchLayerNorm(self.d_model, eps=1e-5, name="norm2")(src + src2)


class _PytorchEncoderStack(nn.Module):
    """torch.nn.TransformerEncoder(norm=None): layers.{i} children."""

    d_model: int
    nhead: int
    d_ffn: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = _PytorchEncoderLayer(
                self.d_model, self.nhead, self.d_ffn, name=f"layers_{i}"
            )(x)
        return x


class PytorchTransformerBlock(nn.Module):
    """Plain-pytorch dual-path block (`sepformer.py:948-1020`).

    Upstream wraps ``nn.TransformerEncoder`` built seq-first (torch<2 has no
    batch_first) yet feeds the documented (B, L, N) tensor, so — exactly
    like DPTNetBlock — its attention literally runs across the batch axis.
    This module implements the evident per-sequence intent on (B, L, N);
    the parity test recovers the literal upstream numerics by transposing,
    since the upstream block is this block applied to the transposed
    tensor. The positional encoding is upstream's
    ``PyTorchPositionalEncoding`` (`sepformer.py:897-945`), added over the
    leading (sequence) axis. Dropout 0.1 upstream is inference-inactive;
    this is a serving/eval-oriented module like the other alt blocks.
    """

    out_channels: int
    num_layers: int = 6
    nhead: int = 8
    d_ffn: int = 2048
    use_positional_encoding: bool = True

    @property
    def out_dim(self) -> int:
        return self.out_channels

    @nn.compact
    def __call__(self, x):  # (B, L, N)
        if self.use_positional_encoding:
            x = x + sinusoidal_pe(x.shape[1], self.out_channels, x.dtype)[None]
        return _PytorchEncoderStack(
            self.out_channels, self.nhead, self.d_ffn, self.num_layers,
            name="mdl",
        )(x)


class _LinearAttention(nn.Module):
    """Linear (kernelized) attention: softmax replaced by the positive
    feature map phi(x) = elu(x) + 1, giving
    ``V' = phi(Q) (phi(K)^T V) / (phi(Q) phi(K)^T 1)`` — O(L) in sequence
    length, the 'linear' attention_type of the fast-transformers library
    the reference's FastTransformerBlock builds (`sepformer.py:802-891`).
    """

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x):  # (B, L, N)
        d, h = self.d_model, self.nhead
        hd = d // h
        q = Linear(d, d, name="q_proj")(jnp.swapaxes(x, -1, -2))
        k = Linear(d, d, name="k_proj")(jnp.swapaxes(x, -1, -2))
        v = Linear(d, d, name="v_proj")(jnp.swapaxes(x, -1, -2))
        b, _, L = q.shape
        q = jnp.swapaxes(q, -1, -2).reshape(b, L, h, hd)
        k = jnp.swapaxes(k, -1, -2).reshape(b, L, h, hd)
        v = jnp.swapaxes(v, -1, -2).reshape(b, L, h, hd)
        fq = jax.nn.elu(q) + 1.0
        fk = jax.nn.elu(k) + 1.0
        kv = jnp.einsum("blhd,blhe->bhde", fk, v)
        z = 1.0 / (jnp.einsum("blhd,bhd->blh", fq, jnp.sum(fk, axis=1)) + 1e-6)
        out = jnp.einsum("blhd,bhde,blh->blhe", fq, kv, z).reshape(b, L, d)
        return jnp.swapaxes(
            Linear(d, d, name="out_proj")(jnp.swapaxes(out, -1, -2)), -1, -2
        )


class _FastEncoderLayer(nn.Module):
    """fast-transformers TransformerEncoderLayer shape: attention residual,
    norm1, then linear1->relu->linear2 residual, norm2 (post-norm)."""

    d_model: int
    nhead: int
    d_ffn: int

    @nn.compact
    def __call__(self, x):
        x = x + _LinearAttention(self.d_model, self.nhead, name="attention")(x)
        x = _TorchLayerNorm(self.d_model, eps=1e-5, name="norm1")(x)
        y = Linear(self.d_model, self.d_ffn, name="linear1")(
            jnp.swapaxes(x, -1, -2)
        )
        y = jax.nn.relu(y)
        y = Linear(self.d_ffn, self.d_model, name="linear2")(y)
        return _TorchLayerNorm(self.d_model, eps=1e-5, name="norm2")(
            x + jnp.swapaxes(y, -1, -2)
        )


class FastTransformerBlock(nn.Module):
    """Efficient-attention dual-path block (`sepformer.py:802-891`).

    Upstream delegates to the external ``fast_transformers`` library, which
    is not in the reference's requirements.txt and is absent from this
    environment — the upstream class is unrunnable dead code (its import
    fails), so no golden parity is possible; tests cover upstream's
    ImportError plus this module's properties instead. Implemented here:
    the 'linear' attention type (elu+1 kernelized attention, O(L)), and
    upstream's reformer bucket zero-pad/truncate wrapper semantics when
    ``attention_type='reformer'`` is requested (applied around the same
    linear-attention stack, since the reformer internals live in the
    missing library).
    """

    out_channels: int
    attention_type: str = "linear"
    num_layers: int = 6
    nhead: int = 8
    d_ffn: int = 1024
    reformer_bucket_size: int = 32

    @property
    def out_dim(self) -> int:
        return self.out_channels

    @nn.compact
    def __call__(self, x):  # (B, L, N)
        pad = 0
        if self.attention_type == "reformer":
            bucket = self.reformer_bucket_size * 2
            pad = bucket - (x.shape[1] % bucket)
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        for i in range(self.num_layers):
            x = _FastEncoderLayer(
                self.out_channels, self.nhead, self.d_ffn,
                name=f"mdl_layers_{i}",
            )(x)
        if pad:
            x = x[:, :-pad, :]
        return x


class GlobalLayerNorm4(nn.Module):
    """SepFormer gLN over (C,K,S) with (C,1,1) params (`sepformer.py:536-607`)."""

    dim: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):  # (B, C, K, S)
        w = self.param("weight", nn.initializers.ones, (self.dim, 1, 1))
        b = self.param("bias", nn.initializers.zeros, (self.dim, 1, 1))
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2, 3), keepdims=True)
        return w * (x - mean) * jax.lax.rsqrt(var + self.eps) + b


class GroupNorm1_4d(GroupNorm1):
    """GroupNorm(1, C) applied to (B, C, K, S): normalize over (C, K, S)."""


def _segmentation(x, k):
    """(B, N, L) -> ((B, N, K, S), gap) (`sepformer.py:1571-1628`)."""
    b, n, l = x.shape
    p = k // 2
    gap = k - (p + l % k) % k
    if gap > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, gap)))
    x = jnp.pad(x, ((0, 0), (0, 0), (p, p)))
    seg1 = x[:, :, :-p].reshape(b, n, -1, k)
    seg2 = x[:, :, p:].reshape(b, n, -1, k)
    segs = jnp.concatenate([seg1, seg2], axis=3).reshape(b, n, -1, k)
    return jnp.swapaxes(segs, 2, 3), gap


def _over_add(x, gap):
    """(B, N, K, S) -> (B, N, L) (`sepformer.py:1630-1663`)."""
    b, n, k, s = x.shape
    p = k // 2
    x = jnp.swapaxes(x, 2, 3).reshape(b, n, -1, k * 2)
    x1 = x[:, :, :, :k].reshape(b, n, -1)[:, :, p:]
    x2 = x[:, :, :, k:].reshape(b, n, -1)[:, :, :-p]
    out = x1 + x2
    if gap > 0:
        out = out[:, :, :-gap]
    return out


def _make_block(cfg: dict, name: str):
    """Dual-path block factory: 'transformer' (SBTransformerBlock, the only
    kind any reference runner uses), 'rnn' (SBRNNBlock), 'dptnet'
    (DPTNetBlock), 'pytorch' (PytorchTransformerBlock), 'fast'
    (FastTransformerBlock) — `sepformer.py:1022,1121,1183,948,802`."""
    cfg = dict(cfg)
    kind = cfg.pop("block_type", "transformer")
    if kind == "transformer":
        return SBTransformerBlock(**cfg, name=name)
    if kind == "rnn":
        return SBRNNBlock(**cfg, name=name)
    if kind == "dptnet":
        return DPTNetBlock(**cfg, name=name)
    if kind == "pytorch":
        return PytorchTransformerBlock(**cfg, name=name)
    if kind == "fast":
        return FastTransformerBlock(**cfg, name=name)
    raise ValueError(f"unknown dual-path block type {kind!r}")


class DualComputationBlock(nn.Module):
    """`sepformer.py:1277-1408` with selectable intra/inter block models."""

    out_channels: int
    intra_cfg: dict
    inter_cfg: dict
    norm: str = "ln"
    skip_around_intra: bool = True
    linear_layer_after_inter_intra: bool = False

    @nn.compact
    def __call__(self, x):  # (B, N, K, S)
        b, n, k, s = x.shape

        intra_blk = _make_block(self.intra_cfg, "intra_mdl")
        inter_blk = _make_block(self.inter_cfg, "inter_mdl")
        for blk in (intra_blk, inter_blk):
            if getattr(blk, "out_dim", n) != n:
                assert self.linear_layer_after_inter_intra, (
                    "RNN dual-path blocks change the feature dim; "
                    "linear_layer_after_inter_intra must be enabled "
                    "(`sepformer.py:1330-1346`)"
                )

        intra = jnp.transpose(x, (0, 3, 2, 1)).reshape(b * s, k, n)
        intra = intra_blk(intra)
        if self.linear_layer_after_inter_intra:
            intra = Linear(
                getattr(intra_blk, "out_dim", n), self.out_channels,
                name="intra_linear",
            )(jnp.swapaxes(intra, -1, -2)).swapaxes(-1, -2)
        intra = jnp.transpose(intra.reshape(b, s, k, n), (0, 3, 2, 1))
        if self.norm == "ln":
            intra = GroupNorm1_4d(self.out_channels, name="intra_norm")(intra)
        elif self.norm == "gln":
            intra = GlobalLayerNorm4(self.out_channels, name="intra_norm")(intra)
        if self.skip_around_intra:
            intra = intra + x

        inter = jnp.transpose(intra, (0, 2, 3, 1)).reshape(b * k, s, n)
        inter = inter_blk(inter)
        if self.linear_layer_after_inter_intra:
            inter = Linear(
                getattr(inter_blk, "out_dim", n), self.out_channels,
                name="inter_linear",
            )(jnp.swapaxes(inter, -1, -2)).swapaxes(-1, -2)
        inter = jnp.transpose(inter.reshape(b, k, s, n), (0, 3, 1, 2))
        if self.norm == "ln":
            inter = GroupNorm1_4d(self.out_channels, name="inter_norm")(inter)
        elif self.norm == "gln":
            inter = GlobalLayerNorm4(self.out_channels, name="inter_norm")(inter)
        return inter + intra


class _Encoder(nn.Module):
    """Conv+ReLU encoder with child 'conv1d' (`sepformer.py:673-730`)."""

    k: int
    n: int

    @nn.compact
    def __call__(self, x):
        return jax.nn.relu(
            Conv1d(1, self.n, self.k, stride=self.k // 2, use_bias=False,
                   name="conv1d")(x)
        )


class _MaskNet(nn.Module):
    """Dual_Path_Model (`sepformer.py:1412-1568`). (B,N,L) -> (spks,B,N,L)."""

    n_channels: int
    chunksize: int
    numlayers: int
    norm: str
    extralinear: bool
    extraskip: bool
    numspks: int
    intra_cfg: dict
    inter_cfg: dict

    @nn.compact
    def __call__(self, x):
        n = self.n_channels
        x = GroupNorm1(n, name="norm")(x)
        x = Conv1d(n, n, 1, use_bias=False, name="conv1d")(x)
        x, gap = _segmentation(x, self.chunksize)
        for i in range(self.numlayers):
            x = DualComputationBlock(
                n, self.intra_cfg, self.inter_cfg, norm=self.norm,
                skip_around_intra=self.extraskip,
                linear_layer_after_inter_intra=self.extralinear,
                name=f"dual_mdl_{i}",
            )(x)
        x = PReLU(name="prelu")(x)
        x = Conv2d1x1(n, n * self.numspks, name="conv2d")(x)
        b = x.shape[0]
        k, s = x.shape[2], x.shape[3]
        x = x.reshape(b * self.numspks, n, k, s)
        x = _over_add(x, gap)
        gate_in = jnp.tanh(Conv1d(n, n, 1, name="output_0")(x))
        gate = jax.nn.sigmoid(Conv1d(n, n, 1, name="output_gate_0")(x))
        x = gate_in * gate
        x = Conv1d(n, n, 1, use_bias=False, name="end_conv1x1")(x)
        x = x.reshape(b, self.numspks, n, -1)
        x = jax.nn.relu(x)
        return jnp.swapaxes(x, 0, 1)  # (spks, B, N, L)


class SepFormer(nn.Module):
    """SepformerWrapper (`sepformer.py:1667-1831`). Input (B, T) or (B, 1, T),
    output (B, spks, T)."""

    encoder_kernel_size: int = 16
    encoder_in_nchannels: int = 1
    encoder_out_nchannels: int = 256
    masknet_chunksize: int = 250
    masknet_numlayers: int = 2
    masknet_norm: str = "ln"
    masknet_useextralinearlayer: bool = False
    masknet_extraskipconnection: bool = True
    masknet_numspks: int = 2
    intra_numlayers: int = 8
    inter_numlayers: int = 8
    intra_nhead: int = 8
    inter_nhead: int = 8
    intra_dffn: int = 1024
    inter_dffn: int = 1024
    intra_use_positional: bool = True
    inter_use_positional: bool = True
    intra_norm_before: bool = True
    inter_norm_before: bool = True
    # dual-path block family: 'transformer' (the published SepFormer),
    # 'rnn' (SBRNNBlock), 'dptnet' (DPTNetBlock), 'pytorch'
    # (PytorchTransformerBlock), or 'fast' (FastTransformerBlock)
    intra_block_type: str = "transformer"
    inter_block_type: str = "transformer"
    rnn_hidden: int = 256
    # run each encoder's layer stack as one lax.scan over stacked params
    # (identical math; see stack_sepformer_params for checkpoint conversion)
    scan_layers: bool = False

    def _block_cfg(self, which: str) -> dict:
        kind = getattr(self, f"{which}_block_type")
        n = self.encoder_out_nchannels
        if kind == "transformer":
            return dict(
                block_type=kind,
                num_layers=getattr(self, f"{which}_numlayers"), d_model=n,
                nhead=getattr(self, f"{which}_nhead"),
                d_ffn=getattr(self, f"{which}_dffn"),
                use_positional_encoding=getattr(self, f"{which}_use_positional"),
                norm_before=getattr(self, f"{which}_norm_before"),
                scan_layers=self.scan_layers,
            )
        if kind == "rnn":
            return dict(
                block_type=kind, input_size=n,
                hidden_channels=self.rnn_hidden,
                num_layers=getattr(self, f"{which}_numlayers"),
            )
        if kind in ("pytorch", "fast"):
            return dict(
                block_type=kind, out_channels=n,
                num_layers=getattr(self, f"{which}_numlayers"),
                nhead=getattr(self, f"{which}_nhead"),
                d_ffn=getattr(self, f"{which}_dffn"),
            )
        return dict(block_type=kind, d_model=n,
                    nhead=getattr(self, f"{which}_nhead"))

    @nn.compact
    def __call__(self, mix):
        if mix.ndim == 3:
            mix = mix[:, 0, :]
        t_origin = mix.shape[-1]
        n = self.encoder_out_nchannels
        spks = self.masknet_numspks

        mix_w = _Encoder(self.encoder_kernel_size, n, name="encoder")(
            mix[:, None, :]
        )

        est_mask = _MaskNet(
            n_channels=n,
            chunksize=self.masknet_chunksize,
            numlayers=self.masknet_numlayers,
            norm=self.masknet_norm,
            extralinear=self.masknet_useextralinearlayer,
            extraskip=self.masknet_extraskipconnection,
            numspks=spks,
            intra_cfg=self._block_cfg("intra"),
            inter_cfg=self._block_cfg("inter"),
            name="masknet",
        )(mix_w)
        sep_h = mix_w[None] * est_mask  # (spks, B, N, L)

        dec = ConvTranspose1d(
            n, self.encoder_in_nchannels, self.encoder_kernel_size,
            stride=self.encoder_kernel_size // 2, use_bias=False, name="decoder",
        )
        outs = [dec(sep_h[i])[:, 0, :] for i in range(spks)]
        est = jnp.stack(outs, axis=-1)  # (B, T_est, spks)
        t_est = est.shape[1]
        if t_origin > t_est:
            est = jnp.pad(est, ((0, 0), (0, t_origin - t_est), (0, 0)))
        else:
            est = est[:, :t_origin, :]
        return jnp.swapaxes(est, 1, 2)
