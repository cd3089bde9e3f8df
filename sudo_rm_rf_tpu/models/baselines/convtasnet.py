"""ConvTasNet baseline (Luo & Mesgarani).

Behavioral spec from `sudo_rm_rf/dnn/models/original_convtasnet.py`:
  * encoder Conv1d(1->N, win, stride=win//2, bias-free) (`:41-42`)
  * TCN separator: GroupNorm(1)/cLN -> 1x1 bottleneck -> stack x layer
    DepthConv1d blocks with dilation 2^i, residual + skip paths
    (`:432-506`); causal mode uses cumulative LN and left-only padding
    (`:396-421`)
  * sigmoid masks (B, num_spk, N, L) on encoder output (`:226-229`)
  * shared ConvTranspose1d decoder applied per masked source (`:53-54`,
    `:231-236`)
  * pad: rest to a window multiple plus stride on both ends, cropped back
    (`:196-214`, `:237-239`)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import ops
from sudo_rm_rf_tpu.models.layers import Conv1d, ConvTranspose1d, PReLU
from sudo_rm_rf_tpu.models.sudormrf import GroupNorm1


class CumulativeLN(nn.Module):
    """torch cLN with (1, C, 1) params (`original_convtasnet.py:244-287`)."""

    channels: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        gain = self.param("gain", nn.initializers.ones, (1, self.channels, 1))
        bias = self.param("bias", nn.initializers.zeros, (1, self.channels, 1))
        return ops.norm.cumulative_ln(
            x, gain.reshape(-1), bias.reshape(-1), eps=self.eps
        )


class DepthConv1d(nn.Module):
    """1x1 -> PReLU -> norm -> depthwise dilated -> PReLU -> norm ->
    (residual 1x1, skip 1x1) (`original_convtasnet.py:386-429`)."""

    input_channel: int
    hidden_channel: int
    kernel: int
    padding: int
    dilation: int = 1
    skip: bool = True
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        y = Conv1d(self.input_channel, self.hidden_channel, 1, name="conv1d")(x)
        y = PReLU(name="nonlinearity1")(y)
        norm_cls = CumulativeLN if self.causal else GroupNorm1
        y = norm_cls(self.hidden_channel, name="reg1")(y)

        pad = (self.kernel - 1) * self.dilation if self.causal else self.padding
        y = Conv1d(
            self.hidden_channel,
            self.hidden_channel,
            self.kernel,
            dilation=self.dilation,
            groups=self.hidden_channel,
            padding=pad,
            name="dconv1d",
        )(y)
        if self.causal:
            y = y[:, :, :-pad]
        y = PReLU(name="nonlinearity2")(y)
        y = norm_cls(self.hidden_channel, name="reg2")(y)

        residual = Conv1d(self.hidden_channel, self.input_channel, 1, name="res_out")(y)
        if self.skip:
            skip = Conv1d(
                self.hidden_channel, self.input_channel, 1, name="skip_out"
            )(y)
            return residual, skip
        return residual


class TCN(nn.Module):
    """Dilated temporal conv network (`original_convtasnet.py:432-506`)."""

    input_dim: int
    output_dim: int
    bn_dim: int
    hidden_dim: int
    layer: int = 8
    stack: int = 3
    kernel: int = 3
    skip: bool = True
    causal: bool = False
    dilated: bool = True

    @nn.compact
    def __call__(self, x):
        norm_cls = CumulativeLN if self.causal else GroupNorm1
        y = norm_cls(self.input_dim, name="LN")(x)
        y = Conv1d(self.input_dim, self.bn_dim, 1, name="BN")(y)

        skip_sum = 0.0
        idx = 0
        for _ in range(self.stack):
            for i in range(self.layer):
                dil = 2**i if self.dilated else 1
                pad = dil if self.dilated else 1
                block = DepthConv1d(
                    self.bn_dim,
                    self.hidden_dim,
                    self.kernel,
                    padding=pad,
                    dilation=dil,
                    skip=self.skip,
                    causal=self.causal,
                    name=f"TCN_{idx}",
                )
                if self.skip:
                    residual, skip = block(y)
                    y = y + residual
                    skip_sum = skip_sum + skip
                else:
                    y = y + block(y)
                idx += 1

        out_in = skip_sum if self.skip else y
        out = PReLU(name="output_0")(out_in)
        return Conv1d(self.bn_dim, self.output_dim, 1, name="output_1")(out)


class ConvTasNet(nn.Module):
    """TasNet front/back + TCN separator. Input (B,[1,]T) -> (B, num_spk, T)."""

    enc_dim: int = 512
    feature_dim: int = 128
    sr: int = 8000
    win: float = 2  # milliseconds
    layer: int = 8
    stack: int = 3
    kernel: int = 3
    num_spk: int = 2
    causal: bool = False

    @property
    def win_samples(self) -> int:
        return int(self.sr * self.win / 1000)

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:
            x = x[:, None, :]
        win = self.win_samples
        stride = win // 2
        b, _, nsample = x.shape

        rest = win - (stride + nsample % win) % win
        if rest > 0:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, rest)))
        x = jnp.pad(x, ((0, 0), (0, 0), (stride, stride)))

        enc = Conv1d(1, self.enc_dim, win, stride=stride, use_bias=False,
                     name="encoder")(x)
        masks = TCN(
            self.enc_dim,
            self.enc_dim * self.num_spk,
            self.feature_dim,
            self.feature_dim * 4,
            layer=self.layer,
            stack=self.stack,
            kernel=self.kernel,
            causal=self.causal,
            name="TCN",
        )(enc)
        masks = jax.nn.sigmoid(masks).reshape(b, self.num_spk, self.enc_dim, -1)
        masked = enc[:, None, :, :] * masks  # (B, S, N, L)

        dec_in = masked.reshape(b * self.num_spk, self.enc_dim, -1)
        out = ConvTranspose1d(
            self.enc_dim, 1, win, stride=stride, use_bias=False, name="decoder"
        )(dec_in)
        out = out[:, :, stride : -(rest + stride)]
        return out.reshape(b, self.num_spk, -1)
