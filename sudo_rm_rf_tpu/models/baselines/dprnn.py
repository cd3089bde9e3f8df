"""DPRNN baseline (dual-path BiLSTM over segmented chunks).

Behavioral spec from `sudo_rm_rf/dnn/models/dprnn.py`:
  * Encoder: Conv1d(1->E, win, stride=win//2, bias-free) + ReLU (`:86-107`)
  * enc GroupNorm(1), BF_module separator: 1x1 bottleneck (bias-free) ->
    segmentation into 50%-overlapped chunks (`:263-290`) -> `layer` dual-path
    (intra=BiLSTM, inter=BiLSTM) blocks with GroupNorm residuals (`:172-236`)
    -> PReLU + 1x1 Conv2d to nspk*N -> overlap-add merge (`:292-307`) ->
    gated tanh/sigmoid output (`:317-343`)
  * mask 1x1 (bias-free) -> ReLU -> Linear decoder + overlap_and_add
    (`:109-133`, `:535-563`)

The LSTM is implemented with torch's parameter layout (weight_ih_l0 etc.,
gate order i,f,g,o) via lax.scan; bidirectional runs the same scan on the
reversed sequence. Scans are the idiomatic XLA lowering for RNNs — this
baseline exists for parity, not peak TPU throughput (that's the SuDoRM-RF
family's job).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import ops
from sudo_rm_rf_tpu.models.layers import Conv1d, PReLU
from sudo_rm_rf_tpu.models.sudormrf import GroupNorm1
from sudo_rm_rf_tpu.models.groupcomm_sudormrf import Linear


class Conv2d1x1(nn.Module):
    """torch nn.Conv2d(in, out, 1): pointwise linear over the channel dim of
    a (B, C, H, W) tensor, with Conv2d param shapes."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        bound = 1.0 / math.sqrt(self.in_channels)
        uni = lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound)
        w = self.param("weight", uni, (self.out_channels, self.in_channels, 1, 1))
        b = self.param("bias", uni, (self.out_channels,))
        out = jnp.einsum("bchw,oc->bohw", x, w[:, :, 0, 0])
        return out + b[None, :, None, None]


def _lstm_scan(x, w_ih, w_hh, b_ih, b_hh, reverse=False):
    """One torch-layout LSTM direction over (B, T, C). Returns (B, T, H)."""
    hidden = w_hh.shape[1]

    def cell(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c = f * c + i * jnp.tanh(g)
        h = o * jnp.tanh(c)
        return (h, c), h

    # hoist the input projection out of the scan: one big MXU matmul
    xproj = jnp.einsum("btc,gc->btg", x, w_ih) + b_ih + b_hh
    xs = jnp.swapaxes(xproj, 0, 1)  # (T, B, 4H)
    if reverse:
        xs = xs[::-1]
    b = x.shape[0]
    init = (
        jnp.zeros((b, hidden), x.dtype),
        jnp.zeros((b, hidden), x.dtype),
    )
    _, hs = jax.lax.scan(cell, init, xs)
    if reverse:
        hs = hs[::-1]
    return jnp.swapaxes(hs, 0, 1)


class TorchLSTM(nn.Module):
    """torch nn.LSTM(batch_first=True) parameter layout, any num_layers."""

    input_size: int
    hidden_size: int
    bidirectional: bool = False
    num_layers: int = 1

    @nn.compact
    def __call__(self, x):
        h = self.hidden_size
        ndir = 2 if self.bidirectional else 1
        bound = 1.0 / math.sqrt(h)
        uni = lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound)
        for layer in range(self.num_layers):
            i = self.input_size if layer == 0 else h * ndir
            outs = []
            for sfx in [""] + (["_reverse"] if self.bidirectional else []):
                w_ih = self.param(f"weight_ih_l{layer}{sfx}", uni, (4 * h, i))
                w_hh = self.param(f"weight_hh_l{layer}{sfx}", uni, (4 * h, h))
                b_ih = self.param(f"bias_ih_l{layer}{sfx}", uni, (4 * h,))
                b_hh = self.param(f"bias_hh_l{layer}{sfx}", uni, (4 * h,))
                outs.append(
                    _lstm_scan(x, w_ih, w_hh, b_ih, b_hh, reverse=bool(sfx))
                )
            x = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        return x


class SingleRNN(nn.Module):
    """BiLSTM + linear projection back to input size (`dprnn.py:136-168`)."""

    input_size: int
    hidden_size: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x):
        y = TorchLSTM(
            self.input_size, self.hidden_size, self.bidirectional, name="rnn"
        )(x)
        ndir = 2 if self.bidirectional else 1
        y = Linear(self.hidden_size * ndir, self.input_size, name="proj")(
            jnp.swapaxes(y, -1, -2)
        )
        return jnp.swapaxes(y, -1, -2)


class DPRNNCore(nn.Module):
    """Stacked dual-path blocks over (B, N, dim1, dim2) (`dprnn.py:172-236`)."""

    input_size: int
    hidden_size: int
    output_size: int
    num_layers: int = 1
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x):
        b, n, dim1, dim2 = x.shape
        out = x
        for i in range(self.num_layers):
            # intra-chunk (rows): sequence along dim1, batched over dim2
            row_in = jnp.transpose(out, (0, 3, 2, 1)).reshape(b * dim2, dim1, n)
            row = SingleRNN(
                self.input_size, self.hidden_size, True, name=f"row_rnn_{i}"
            )(row_in)
            row = jnp.transpose(row.reshape(b, dim2, dim1, n), (0, 3, 2, 1))
            row = GroupNorm1(self.input_size, name=f"row_norm_{i}")(row)
            out = out + row

            # inter-chunk (cols): sequence along dim2, batched over dim1
            col_in = jnp.transpose(out, (0, 2, 3, 1)).reshape(b * dim1, dim2, n)
            col = SingleRNN(
                self.input_size, self.hidden_size, self.bidirectional,
                name=f"col_rnn_{i}",
            )(col_in)
            col = jnp.transpose(col.reshape(b, dim1, dim2, n), (0, 3, 1, 2))
            col = GroupNorm1(self.input_size, name=f"col_norm_{i}")(col)
            out = out + col

        out = PReLU(name="output_0")(out)
        return Conv2d1x1(self.input_size, self.output_size, name="output_1")(out)


def _pad_segment(x, segment_size):
    """(B, N, T) -> padded (`dprnn.py:263-276`); returns (padded, rest)."""
    b, n, t = x.shape
    stride = segment_size // 2
    rest = segment_size - (stride + t % segment_size) % segment_size
    if rest > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, rest)))
    x = jnp.pad(x, ((0, 0), (0, 0), (stride, stride)))
    return x, rest


def split_feature(x, segment_size):
    """(B, N, T) -> (B, N, segment_size, K) 50%-overlap chunks (`:278-290`)."""
    x, rest = _pad_segment(x, segment_size)
    b, n, t = x.shape
    stride = segment_size // 2
    seg1 = x[:, :, :-stride].reshape(b, n, -1, segment_size)
    seg2 = x[:, :, stride:].reshape(b, n, -1, segment_size)
    segs = jnp.concatenate([seg1, seg2], axis=3).reshape(b, n, -1, segment_size)
    return jnp.swapaxes(segs, 2, 3), rest


def merge_feature(x, rest):
    """Inverse of split_feature: (B, N, segment_size, K) -> (B, N, T) (`:292-307`)."""
    b, n, segment_size, _ = x.shape
    stride = segment_size // 2
    x = jnp.swapaxes(x, 2, 3).reshape(b, n, -1, segment_size * 2)
    x1 = x[:, :, :, :segment_size].reshape(b, n, -1)[:, :, stride:]
    x2 = x[:, :, :, segment_size:].reshape(b, n, -1)[:, :, :-stride]
    out = x1 + x2
    if rest > 0:
        out = out[:, :, :-rest]
    return out


class BFModule(nn.Module):
    """Separator: bottleneck -> split -> DPRNN -> merge -> gated output
    (`dprnn.py:240-346`)."""

    input_dim: int
    feature_dim: int
    hidden_dim: int
    num_spk: int = 2
    layer: int = 4
    segment_size: int = 100
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        feat = Conv1d(self.input_dim, self.feature_dim, 1, use_bias=False, name="BN")(x)
        segs, rest = split_feature(feat, self.segment_size)
        out = DPRNNCore(
            self.feature_dim,
            self.hidden_dim,
            self.feature_dim * self.num_spk,
            num_layers=self.layer,
            bidirectional=self.bidirectional,
            name="DPRNN",
        )(segs)
        out = out.reshape(b * self.num_spk, self.feature_dim, self.segment_size, -1)
        out = merge_feature(out, rest)  # (B*nspk, N, T)

        gate_in = Conv1d(self.feature_dim, self.feature_dim, 1, name="output_0")(out)
        gate = Conv1d(self.feature_dim, self.feature_dim, 1, name="output_gate_0")(out)
        bf = jnp.tanh(gate_in) * jax.nn.sigmoid(gate)
        bf = jnp.swapaxes(bf, 1, 2).reshape(b, self.num_spk, -1, self.feature_dim)
        return bf  # (B, nspk, T, N)


class Encoder(nn.Module):
    """Conv1d + ReLU front end (`dprnn.py:86-107`)."""

    win: int
    enc_dim: int

    @nn.compact
    def __call__(self, x):  # (B, 1, T)
        return jax.nn.relu(
            Conv1d(
                1, self.enc_dim, self.win, stride=self.win // 2, use_bias=False,
                name="conv1d_U",
            )(x)
        )


class Decoder(nn.Module):
    """Linear basis decoder + overlap-add (`dprnn.py:109-133`)."""

    enc_dim: int
    win: int

    @nn.compact
    def __call__(self, mixture_w, est_mask):
        source_w = mixture_w[:, None, :, :] * est_mask  # (B, C, E, L)
        source_w = jnp.swapaxes(source_w, 2, 3)  # (B, C, L, E)
        est = Linear(
            self.enc_dim, self.win, use_bias=False, name="basis_signals"
        )(jnp.swapaxes(source_w, -1, -2))
        est = jnp.swapaxes(est, -1, -2)  # (B, C, L, W)
        return ops.overlap_and_add(est, self.win // 2)


class DPRNN(nn.Module):
    """FaSNet_base wrapper (`dprnn.py:350-563`). Input (B, T) or (B, 1, T)."""

    enc_dim: int = 256
    feature_dim: int = 64
    hidden_dim: int = 128
    layer: int = 6
    segment_size: int = 250
    nspk: int = 2
    win_len: int = 2

    @nn.compact
    def __call__(self, x):
        if x.ndim == 3:
            x = x[:, 0, :]
        b = x.shape[0]
        mixture_w = Encoder(self.win_len, self.enc_dim, name="encoder")(
            x[:, None, :]
        )  # (B, E, L)

        score = GroupNorm1(self.enc_dim, name="enc_LN")(mixture_w)
        score = BFModule(
            self.enc_dim, self.feature_dim, self.hidden_dim, self.nspk,
            self.layer, self.segment_size, name="separator",
        )(score)  # (B, nspk, T, N)
        score = jnp.swapaxes(
            score.reshape(b * self.nspk, -1, self.feature_dim), 1, 2
        )
        score = Conv1d(
            self.feature_dim, self.enc_dim, 1, use_bias=False, name="mask_conv1x1"
        )(score)
        est_mask = jax.nn.relu(score.reshape(b, self.nspk, self.enc_dim, -1))
        return Decoder(self.enc_dim, self.win_len, name="decoder")(
            mixture_w, est_mask
        )
