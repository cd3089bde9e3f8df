"""Causal SuDoRM-RF v3 — streaming-capable, normalization-free variant.

Behavioral spec from `sudo_rm_rf/dnn/models/causal_improved_sudormrf_v3.py`:
  * causality via *weight masking*: every conv with kernel >= 3 zeroes its
    last k//2 taps at apply time (ref :12-32) — expressed here as a pure
    parameter transform inside the conv call, so the mask costs nothing
    after constant folding under jit
  * NF-net-style skip-init instead of norms: each block output is
    ``res_conv(u) * skipinit_gain * alpha + residual`` with a scalar
    learnable ``skipinit_gain`` initialized to 0 and ``alpha = beta = 1``
    (ref :64-117, :165-177)
  * encoder kernel = 2L-1, stride L//2 (ref :150-156); no GlobLN anywhere;
    no encoder-skip mask product — PReLU'd mask IS the representation
    (ref :193-211); plain dense transposed-conv decoder (ref :184-192)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import ops
from sudo_rm_rf_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    PReLU,
    _kaiming_uniform_conv,
    _torch_conv_bias_init,
    xavier_uniform_conv,
)


def _causal_mask(kernel_size: int, dtype=jnp.float32):
    """Ones with the last k//2 taps zeroed (ref :21-27)."""
    mask = jnp.ones((kernel_size,), dtype)
    if kernel_size >= 3:
        future = kernel_size // 2
        mask = mask.at[-future:].set(0.0)
    return mask


class CausalConv1d(nn.Module):
    """Conv1d whose weight is causally masked at apply time (ref :12-32)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    weight_init: nn.initializers.Initializer = _kaiming_uniform_conv

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            self.weight_init,
            (self.out_channels, self.in_channels // self.groups, self.kernel_size),
        )
        w = w * _causal_mask(self.kernel_size, w.dtype)[None, None, :]
        b = None
        if self.use_bias:
            fan_in = (self.in_channels // self.groups) * self.kernel_size
            b = self.param("bias", _torch_conv_bias_init(fan_in), (self.out_channels,))
        return ops.conv1d(
            x, w, b, stride=self.stride, padding=self.padding, groups=self.groups
        )


class ConvAct(nn.Module):
    """Causally-masked conv + scalar PReLU; no norm (ref :34-54)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = CausalConv1d(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=(self.kernel_size - 1) // 2,
            groups=self.groups,
            name="conv",
        )(x)
        return PReLU(name="act")(x)


class CausalUConvBlock(nn.Module):
    """Norm-free U-ConvBlock with skip-init residual scaling (ref :57-117)."""

    out_channels: int = 128
    in_channels: int = 512
    upsampling_depth: int = 4
    alpha: float = 1.0
    beta: float = 1.0

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvAct(self.out_channels, self.in_channels, 1, name="proj_1x1")(
            x / self.beta
        )

        pyramid = []
        cur = ConvAct(
            self.in_channels,
            self.in_channels,
            kernel_size=21,
            stride=1,
            groups=self.in_channels,
            name="spp_dw_0",
        )(y)
        pyramid.append(cur)
        for k in range(1, self.upsampling_depth):
            cur = ConvAct(
                self.in_channels,
                self.in_channels,
                kernel_size=21,
                stride=2,
                groups=self.in_channels,
                name=f"spp_dw_{k}",
            )(cur)
            pyramid.append(cur)

        acc = pyramid[-1]
        for k in range(self.upsampling_depth - 2, -1, -1):
            acc = pyramid[k] + ops.upsample_nearest_2x(acc)

        out = CausalConv1d(self.in_channels, self.out_channels, 1, name="res_conv")(acc)
        gain = self.param("skipinit_gain", nn.initializers.zeros, ())
        return out * gain * self.alpha + residual


class CausalSuDORMRF(nn.Module):
    """Causal SuDoRM-RF v3. Input (B, C_audio, T), output (B, S*C_audio, T)."""

    in_audio_channels: int = 1
    out_channels: int = 128
    in_channels: int = 512
    num_blocks: int = 16
    upsampling_depth: int = 4
    enc_kernel_size: int = 21
    enc_num_basis: int = 512
    num_sources: int = 2

    @property
    def n_least_samples_req(self) -> int:
        return (self.enc_kernel_size // 2) * 2**self.upsampling_depth

    @nn.compact
    def __call__(self, input_wav):
        if input_wav.ndim == 2:
            input_wav = input_wav[:, None, :]
        assert self.enc_kernel_size % 2, "encoder kernel must be odd"
        in_len = input_wav.shape[-1]
        x = ops.pad_to_multiple(input_wav, self.n_least_samples_req)

        x = CausalConv1d(
            self.in_audio_channels,
            self.enc_num_basis,
            self.enc_kernel_size * 2 - 1,
            stride=self.enc_kernel_size // 2,
            padding=(self.enc_kernel_size * 2 - 1) // 2,
            use_bias=False,
            weight_init=xavier_uniform_conv,
            name="encoder",
        )(x)

        x = CausalConv1d(self.enc_num_basis, self.out_channels, 1, name="bottleneck")(x)

        for i in range(self.num_blocks):
            x = CausalUConvBlock(
                out_channels=self.out_channels,
                in_channels=self.in_channels,
                upsampling_depth=self.upsampling_depth,
                name=f"sm_{i}",
            )(x)

        x = PReLU(name="mask_net_0")(x)
        x = CausalConv1d(
            self.out_channels,
            self.num_sources * self.enc_num_basis * self.in_audio_channels,
            1,
            name="mask_net_1",
        )(x)
        b = x.shape[0]
        x = x.reshape(
            b, self.num_sources * self.in_audio_channels, self.enc_num_basis, -1
        )
        x = PReLU(name="mask_nl_class")(x)

        est = ConvTranspose1d(
            self.enc_num_basis * self.num_sources * self.in_audio_channels,
            self.num_sources * self.in_audio_channels,
            self.enc_kernel_size,
            stride=self.enc_kernel_size // 2,
            padding=self.enc_kernel_size // 2,
            output_padding=(self.enc_kernel_size // 2) - 1,
            use_bias=False,
            weight_init=xavier_uniform_conv,
            name="decoder",
        )(x.reshape(b, -1, x.shape[-1]))
        return ops.unpad_to_length(est, in_len)
