"""Demucs baseline (Wave-U-Net-style encoder/decoder with BiLSTM bottleneck).

Behavioral spec from `sudo_rm_rf/dnn/models/demucs.py`:
  * forward pads the (B, T) mixture by a hardcoded (7210, 7210) (`:248`)
  * depth x encoder layers: Conv1d(k=8, s=4, VALID) + ReLU + optional
    rewrite 1x1 + GLU (`:159-171`); channels grow by `growth`
  * optional linear-upsample ("Wave-U-Net") mode with decimation downsample
    and a final 1x1 over concat (`:75-90`, `:148-150`, `:276-284`)
  * 2-layer BiLSTM bottleneck + Linear (`:45-58`)
  * decoder (deepest first): add center-trimmed skip, rewrite conv(context=3)
    + GLU, ConvTranspose1d(k=8, s=4), ReLU except the output layer
    (`:173-202`, `:263-275`)
  * output center-trimmed to the input length (`:286-287`)
  * fresh-init weight rescaling toward std `rescale` (`:61-72`)
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu.models.layers import Conv1d, ConvTranspose1d
from sudo_rm_rf_tpu.models.groupcomm_sudormrf import Linear
from sudo_rm_rf_tpu.models.baselines.dprnn import TorchLSTM


def center_trim(x, length: int):
    delta = x.shape[-1] - length
    if delta < 0:
        raise ValueError(f"tensor must be larger than reference, delta={delta}")
    if delta:
        return x[..., delta // 2 : -(delta - delta // 2)]
    return x


def glu(x, axis=1):
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def linear_upsample(x, stride: int):
    """Linear interpolation x`stride` (`demucs.py:75-83`): output length
    (T-1)*stride."""
    b, c, t = x.shape
    w = jnp.arange(stride, dtype=x.dtype) / stride
    left = x[..., :-1, None] * (1 - w)
    right = x[..., 1:, None] * w
    return (left + right).reshape(b, c, -1)


class BLSTM(nn.Module):
    dim: int
    layers: int = 1

    @nn.compact
    def __call__(self, x):  # (B, C, T)
        y = jnp.swapaxes(x, 1, 2)  # (B, T, C)
        y = TorchLSTM(
            self.dim, self.dim, bidirectional=True, num_layers=self.layers,
            name="lstm",
        )(y)
        y = Linear(2 * self.dim, self.dim, name="linear")(jnp.swapaxes(y, 1, 2))
        return y


class Demucs(nn.Module):
    """Input (B, T) or (B, 1, T) -> (B, sources, T)."""

    sources: int = 2
    audio_channels: int = 1
    channels: int = 80
    depth: int = 6
    rewrite: bool = True
    glu: bool = True
    upsample: bool = False
    kernel_size: int = 8
    stride: int = 4
    growth: float = 2.0
    lstm_layers: int = 2
    context: int = 3

    @nn.compact
    def __call__(self, mix):
        if mix.ndim == 3:
            mix = mix[:, 0, :]
        in_len = mix.shape[-1]
        x = jnp.pad(mix[:, None, :], ((0, 0), (0, 0), (7210, 7210)))

        ch_scale = 2 if self.glu else 1
        act = glu if self.glu else jax.nn.relu
        dec_stride = 1 if self.upsample else self.stride

        # plan channel counts exactly like the reference loop
        enc_specs, dec_specs = [], []
        in_ch, ch = self.audio_channels, self.channels
        for index in range(self.depth):
            enc_specs.append((in_ch, ch))
            if index > 0:
                out_ch = in_ch
            elif self.upsample:
                out_ch = self.channels
            else:
                out_ch = self.sources * self.audio_channels
            dec_specs.append((ch, out_ch, index > 0))
            in_ch, ch = ch, int(self.growth * ch)

        saved = [x]
        for i, (cin, cout) in enumerate(enc_specs):
            x = Conv1d(
                cin, cout, self.kernel_size, stride=dec_stride if self.upsample else self.stride,
                name=f"encoder_{i}_0",
            )(x)
            x = jax.nn.relu(x)
            if self.rewrite:
                x = Conv1d(cout, ch_scale * cout, 1, name=f"encoder_{i}_2")(x)
                x = act(x)
            saved.append(x)
            if self.upsample:
                x = x[:, :, :: self.stride]

        if self.lstm_layers:
            x = BLSTM(enc_specs[-1][1], self.lstm_layers, name="lstm")(x)

        # decoder list index d corresponds to construction index
        # depth-1-d (the reference builds with insert(0, ...))
        for d in range(self.depth):
            index = self.depth - 1 - d
            cin, cout, has_relu = dec_specs[index]
            if self.upsample:
                x = linear_upsample(x, self.stride)
            skip = center_trim(saved.pop(-1), x.shape[-1])
            x = x + skip
            j = 0
            if self.rewrite:
                x = Conv1d(cin, ch_scale * cin, self.context, name=f"decoder_{d}_{j}")(x)
                x = act(x)
                j += 2
            if self.upsample:
                x = Conv1d(cin, cout, self.kernel_size, name=f"decoder_{d}_{j}")(x)
            else:
                x = ConvTranspose1d(
                    cin, cout, self.kernel_size, stride=self.stride,
                    name=f"decoder_{d}_{j}",
                )(x)
            if has_relu:
                x = jax.nn.relu(x)

        if self.upsample:
            skip = center_trim(saved.pop(-1), x.shape[-1])
            x = jnp.concatenate([x, skip], axis=1)
            x = Conv1d(
                self.channels + self.audio_channels,
                self.sources * self.audio_channels,
                1,
                name="final",
            )(x)

        x = x.reshape(x.shape[0], self.sources, x.shape[-1])
        return center_trim(x, in_len)
