"""Original SuDoRM-RF v1 (the "softmax" variant).

Behavioral spec from `sudo_rm_rf/dnn/models/sudormrf.py`:
  * all norms are ``nn.GroupNorm(1, C, eps=1e-8)`` — numerically the same
    global layer norm as the improved variant's GlobLN, but the torch params
    are named weight/bias (ref :30,:55,:71,:116,:221,:253)
  * PReLU activations are per-channel ``nn.PReLU(nOut)`` (ref :31,:72)
  * encoder = Conv1d(1->N, k=L, stride=L//2, pad=L//2, bias) + ReLU (ref :212-218)
  * UBlock = proj + depthwise ladder + reverse upsample-add +
    NormAct -> ConvNorm(in->out) -> NormAct(out + x) (ref :123-182)
  * optional reshape conv if out_channels != enc_num_basis (ref :233-236, :268-270)
  * mask head = Conv2d(1->S, kernel (N+1,1), pad (N-N//2,0)) over (B,1,N,T),
    softmax over sources (sigmoid if S==1) (ref :239-242, :272-277)
  * decoder = grouped ConvTranspose1d(S*N->S, groups=S, bias) (ref :245-252)
  * an unused-in-forward ``ln_mask_in`` GroupNorm exists in checkpoints (ref :253)
  * pad input to a multiple of lcm(L//2 * 2^D / gcd(L//2, 2^D)) (ref :206-209)
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from sudo_rm_rf_tpu import ops
from sudo_rm_rf_tpu.models.layers import Conv1d, ConvTranspose1d, PReLU


class GroupNorm1(nn.Module):
    """torch nn.GroupNorm(1, C): global LN with torch-named params."""

    channels: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return ops.glob_ln(x, weight, bias, eps=self.eps)


class ConvNormAct(nn.Module):
    """Conv1d -> GroupNorm(1) -> per-channel PReLU (`sudormrf.py:13-36`)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2
        x = Conv1d(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=pad,
            groups=self.groups,
            name="conv",
        )(x)
        x = GroupNorm1(self.out_channels, name="norm")(x)
        return PReLU(num_parameters=self.out_channels, name="act")(x)


class ConvNorm(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2
        x = Conv1d(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=pad,
            groups=self.groups,
            name="conv",
        )(x)
        return GroupNorm1(self.out_channels, name="norm")(x)


class NormAct(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        x = GroupNorm1(self.channels, name="norm")(x)
        return PReLU(num_parameters=self.channels, name="act")(x)


class DilatedConvNorm(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        pad = ((self.kernel_size - 1) // 2) * self.dilation
        x = Conv1d(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=pad,
            dilation=self.dilation,
            groups=self.groups,
            name="conv",
        )(x)
        return GroupNorm1(self.out_channels, name="norm")(x)


class UBlock(nn.Module):
    """REDUCE -> SPLIT -> TRANSFORM -> MERGE block (`sudormrf.py:123-182`)."""

    out_channels: int = 128
    in_channels: int = 512
    upsampling_depth: int = 4

    @nn.compact
    def __call__(self, x):
        y = ConvNormAct(self.out_channels, self.in_channels, 1, name="proj_1x1")(x)

        pyramid = []
        cur = DilatedConvNorm(
            self.in_channels,
            self.in_channels,
            kernel_size=5,
            stride=1,
            groups=self.in_channels,
            name="spp_dw_0",
        )(y)
        pyramid.append(cur)
        for k in range(1, self.upsampling_depth):
            cur = DilatedConvNorm(
                self.in_channels,
                self.in_channels,
                kernel_size=5,
                stride=2,
                groups=self.in_channels,
                name=f"spp_dw_{k}",
            )(cur)
            pyramid.append(cur)

        acc = pyramid[-1]
        for k in range(self.upsampling_depth - 2, -1, -1):
            acc = pyramid[k] + ops.upsample_nearest_2x(acc)

        expanded = ConvNorm(self.in_channels, self.out_channels, 1, name="conv_1x1_exp")(
            NormAct(self.in_channels, name="final_norm")(acc)
        )
        return NormAct(self.out_channels, name="module_act")(expanded + x)


class MaskConv2d(nn.Module):
    """The v1 softmax mask head: Conv2d(1 -> S, kernel (N+1, 1)) over (B,1,N,T)
    with 'same-ish' height padding (N - N//2) (`sudormrf.py:239-242`)."""

    num_sources: int
    enc_num_basis: int

    @nn.compact
    def __call__(self, x):
        n = self.enc_num_basis
        kh = n + 1
        fan_in = 1 * kh * 1
        bound = 1.0 / math.sqrt(fan_in)
        w = self.param(
            "weight",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (self.num_sources, 1, kh, 1),
        )
        b = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / math.sqrt(fan_in), 1.0 / math.sqrt(fan_in)
            ),
            (self.num_sources,),
        )
        pad_h = n - n // 2
        out = lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=[(pad_h, pad_h), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out + b[None, :, None, None]


class SuDORMRFv1(nn.Module):
    """SuDoRM-RF v1 separator. Input (B, 1, T) mixture, output (B, S, T)."""

    out_channels: int = 128
    in_channels: int = 512
    num_blocks: int = 16
    upsampling_depth: int = 4
    enc_kernel_size: int = 21
    enc_num_basis: int = 512
    num_sources: int = 2

    @property
    def lcm(self) -> int:
        half = self.enc_kernel_size // 2
        depth = 2**self.upsampling_depth
        return abs(half * depth) // math.gcd(half, depth)

    @nn.compact
    def __call__(self, input_wav):
        if input_wav.ndim == 2:
            input_wav = input_wav[:, None, :]
        in_len = input_wav.shape[-1]
        x = ops.pad_to_multiple(input_wav, self.lcm)

        x = Conv1d(
            1,
            self.enc_num_basis,
            self.enc_kernel_size,
            stride=self.enc_kernel_size // 2,
            padding=self.enc_kernel_size // 2,
            name="encoder_0",
        )(x)
        x = jax.nn.relu(x)
        s = x

        x = GroupNorm1(self.enc_num_basis, name="ln")(x)
        x = Conv1d(self.enc_num_basis, self.out_channels, 1, name="l1")(x)

        for i in range(self.num_blocks):
            x = UBlock(
                out_channels=self.out_channels,
                in_channels=self.in_channels,
                upsampling_depth=self.upsampling_depth,
                name=f"sm_{i}",
            )(x)

        if self.out_channels != self.enc_num_basis:
            x = Conv1d(
                self.out_channels, self.enc_num_basis, 1, name="reshape_before_masks"
            )(x)

        x = MaskConv2d(self.num_sources, self.enc_num_basis, name="m")(x[:, None, :, :])
        if self.num_sources == 1:
            x = jax.nn.sigmoid(x)
        else:
            x = jax.nn.softmax(x, axis=1)
        x = x * s[:, None, :, :]

        b = x.shape[0]
        est = ConvTranspose1d(
            self.enc_num_basis * self.num_sources,
            self.num_sources,
            self.enc_kernel_size,
            stride=self.enc_kernel_size // 2,
            padding=self.enc_kernel_size // 2,
            output_padding=(self.enc_kernel_size // 2) - 1,
            groups=self.num_sources,
            name="decoder",
        )(x.reshape(b, -1, x.shape[-1]))
        return ops.unpad_to_length(est, in_len)
