"""Shared flax layer library for the SuDoRM-RF family.

Parameter names intentionally mirror torch (`weight`, `bias`, `gamma`,
`beta`) and submodule names mirror the reference attribute names
(`conv`, `norm`, `act`) so that torch checkpoints convert by renaming only.
Reference building blocks: `sudo_rm_rf/dnn/models/improved_sudormrf.py:50-160`.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import ops


def _kaiming_uniform_conv(key, shape, dtype=jnp.float32):
    """torch's default Conv1d weight init: kaiming_uniform(a=sqrt(5)).

    shape = (out, in/groups, k); fan_in = in/groups * k. With a=sqrt(5) the
    gain is sqrt(1/3) and bound = sqrt(3)*gain/sqrt(fan_in) = 1/sqrt(fan_in).
    """
    fan_in = shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_conv_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_conv(key, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform on a conv weight (out, in/g, k).

    Used by the reference for encoder/decoder fronts
    (`improved_sudormrf.py:252,280`). torch computes fan_in/fan_out with the
    receptive-field multiplier.
    """
    receptive = shape[2]
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv1d(nn.Module):
    """nn.Conv1d with torch param layout (weight: (out, in/g, k))."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_init: Callable = _kaiming_uniform_conv

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            self.weight_init,
            (self.out_channels, self.in_channels // self.groups, self.kernel_size),
        )
        b = None
        if self.use_bias:
            fan_in = (self.in_channels // self.groups) * self.kernel_size
            b = self.param("bias", _torch_conv_bias_init(fan_in), (self.out_channels,))
        return ops.conv1d(
            x,
            w,
            b,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )


class ConvTranspose1d(nn.Module):
    """nn.ConvTranspose1d with torch param layout (weight: (in, out/g, k))."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    groups: int = 1
    use_bias: bool = True
    weight_init: Callable = _kaiming_uniform_conv

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            self.weight_init,
            (self.in_channels, self.out_channels // self.groups, self.kernel_size),
        )
        b = None
        if self.use_bias:
            fan_in = (self.out_channels // self.groups) * self.kernel_size
            b = self.param("bias", _torch_conv_bias_init(fan_in), (self.out_channels,))
        return ops.conv_transpose1d(
            x,
            w,
            b,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
            groups=self.groups,
        )


class PReLU(nn.Module):
    """torch.nn.PReLU: scalar slope by default, or per-channel.

    The improved family uses the scalar variant (`improved_sudormrf.py:68`),
    v1 uses per-channel `nn.PReLU(nOut)` (`sudormrf.py:31`). Param named
    `weight` to match torch.
    """

    num_parameters: int = 1
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "weight",
            lambda key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (self.num_parameters,),
        )
        if self.num_parameters == 1:
            slope = a[0]
        else:
            # per-channel: broadcast along dim 1 of (N, C, T)
            slope = a.reshape((1, -1) + (1,) * (x.ndim - 2))
        return jnp.where(x >= 0, x, slope * x)


class GlobLN(nn.Module):
    """Global layer norm module (params gamma/beta, torch-compatible)."""

    channels: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        return ops.glob_ln(x, gamma, beta, eps=self.eps)


class ConvNormAct(nn.Module):
    """Conv1d -> GlobLN -> PReLU (`improved_sudormrf.py:50-73`)."""

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
        x = GlobLN(self.out_channels, name="norm")(x)
        return PReLU(name="act")(x)


class ConvNorm(nn.Module):
    """Conv1d -> GlobLN (`improved_sudormrf.py:76-96`)."""

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
        return GlobLN(self.out_channels, name="norm")(x)


class NormAct(nn.Module):
    """GlobLN -> PReLU (`improved_sudormrf.py:99-114`)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        x = GlobLN(self.channels, name="norm")(x)
        return PReLU(name="act")(x)


class DilatedConvNorm(nn.Module):
    """(Possibly dilated/strided/grouped) Conv1d -> GlobLN
    (`improved_sudormrf.py:138-159`)."""

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
        return GlobLN(self.out_channels, name="norm")(x)
