"""Two-step TDCN baselines: plain TDCN and ResidualTN.

Behavioral spec from `sudo_rm_rf/dnn/models/two_step_tdcn.py`:
  * TDCN (`:16-119`): ReLU conv front end -> GlobalLayerNorm (eps=1e-7!) ->
    1x1 -> R*X dilated depthwise TCN blocks (dilation 2^d) -> optional
    reshape -> GlobalLayerNorm -> Conv2d softmax/sigmoid mask head with a
    leading ReLU -> grouped transposed-conv back end. No input padding or
    output cropping in forward.
  * ResidualTN (`:316-470`): same skeleton with BatchNorm1d norms at the
    trunk, CepstralNorm (per-channel over time) inside blocks, and hardcoded
    long-range residual connections into layers {8,11,16,19,24,27} mixed by
    1x1 denses over CepstralNorm'd earlier outputs (`:361-392`, `:427-455`).
    Requires R*X >= 28 (the published config is X=8, R=4).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu.models.layers import Conv1d, ConvTranspose1d, PReLU
from sudo_rm_rf_tpu.models.sudormrf import MaskConv2d


class GlobalLayerNorm(nn.Module):
    """(1,C,1)-param global LN with eps=10e-8 (`two_step_tdcn.py:256-285`)."""

    channels: int
    eps: float = 10e-8

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (1, self.channels, 1))
        beta = self.param("beta", nn.initializers.zeros, (1, self.channels, 1))
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        return gamma * (x - mean) * jax.lax.rsqrt(var + self.eps) + beta


class CepstralNorm(nn.Module):
    """Per-channel LN over time, eps=10e-8 (`two_step_tdcn.py:288-313`)."""

    channels: int
    eps: float = 10e-8

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (1, self.channels, 1))
        beta = self.param("beta", nn.initializers.zeros, (1, self.channels, 1))
        mean = jnp.mean(x, axis=2, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=2, keepdims=True)
        return gamma * (x - mean) * jax.lax.rsqrt(var + self.eps) + beta


class BatchNorm1dEval(nn.Module):
    """torch nn.BatchNorm1d in eval mode: running stats from the checkpoint.

    (Training-mode batch statistics are intentionally not implemented — this
    baseline exists for inference/benchmark parity.)
    """

    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.channels,))
        var = self.param("running_var", nn.initializers.ones, (self.channels,))
        inv = jax.lax.rsqrt(var + self.eps)[None, :, None]
        return (x - mean[None, :, None]) * inv * weight[None, :, None] + bias[
            None, :, None
        ]


class _TCNBlock(nn.Module):
    """1x1 -> PReLU -> norm -> dilated depthwise -> PReLU -> norm -> 1x1,
    residual (`two_step_tdcn.py:19-40`)."""

    b: int
    h: int
    p: int
    d: int
    cepstral: bool = False

    @nn.compact
    def __call__(self, x):
        norm_cls = CepstralNorm if self.cepstral else GlobalLayerNorm
        y = Conv1d(self.b, self.h, 1, name="m_0")(x)
        y = PReLU(name="m_1")(y)
        y = norm_cls(self.h, name="m_2")(y)
        y = Conv1d(
            self.h, self.h, self.p, padding=(self.d * (self.p - 1)) // 2,
            dilation=self.d, groups=self.h, name="m_3",
        )(y)
        y = PReLU(name="m_4")(y)
        y = norm_cls(self.h, name="m_5")(y)
        y = Conv1d(self.h, self.b, 1, name="m_6")(y)
        return x + y


class TDCN(nn.Module):
    """Input (B, 1, T) -> (B, S, T') with T' from the transposed conv."""

    N: int = 256
    L: int = 21
    B: int = 256
    H: int = 512
    P: int = 3
    X: int = 8
    R: int = 4
    S: int = 2

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:
            x = x[:, None, :]
        x = Conv1d(1, self.N, self.L, stride=self.L // 2, padding=self.L // 2,
                   name="fe_0")(x)
        x = jax.nn.relu(x)
        s = x

        x = GlobalLayerNorm(self.N, name="ln")(x)
        x = Conv1d(self.N, self.B, 1, name="l1")(x)
        idx = 0
        for _ in range(self.R):
            for d in range(self.X):
                x = _TCNBlock(self.B, self.H, self.P, 2**d, name=f"sm_{idx}")(x)
                idx += 1

        if self.B != self.N:
            x = Conv1d(self.B, self.N, 1, name="reshape_before_masks")(x)
        x = GlobalLayerNorm(self.N, name="ln_mask_in")(x)

        x = MaskConv2d(self.S, self.N, name="m")(x[:, None, :, :])
        x = jax.nn.relu(x)
        if self.S == 1:
            x = jax.nn.sigmoid(x)
        else:
            x = jax.nn.softmax(x, axis=1)
        x = x * s[:, None, :, :]

        b = x.shape[0]
        return ConvTranspose1d(
            self.N * self.S, self.S, self.L, stride=self.L // 2,
            padding=self.L // 2, output_padding=(self.L // 2) - 1,
            groups=self.S, name="be",
        )(x.reshape(b, -1, x.shape[-1]))


class ResidualTN(nn.Module):
    """TDCN with long-range normalized residual mixes (`:316-470`)."""

    N: int = 256
    L: int = 21
    B: int = 256
    H: int = 512
    P: int = 3
    X: int = 8
    R: int = 4
    S: int = 2

    @property
    def residual_to_from(self):
        table = [[] for _ in range(self.R * self.X)]
        table[8] = [-1]
        table[16] = [-1, 8]
        table[24] = [-1, 8, 16]
        table[11] = [3]
        table[19] = [3, 11]
        table[27] = [3, 11, 19]
        return table

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:
            x = x[:, None, :]
        table = self.residual_to_from

        # replicate the reference's registration order for the shared
        # CepstralNorms (one per distinct residual source, `:385-392`)
        prev_connections = {}
        k = 0
        for res_from in table:
            for res_ind in res_from:
                if res_ind not in prev_connections:
                    prev_connections[res_ind] = k
                    k += 1
        layer_to_dense = {}
        j = 0
        for i, conns in enumerate(table):
            if conns:
                layer_to_dense[i] = j
                j += 1

        x = Conv1d(1, self.N, self.L, stride=self.L // 2, padding=self.L // 2,
                   name="fe_0")(x)
        x = jax.nn.relu(x)
        s = x

        x = BatchNorm1dEval(self.N, name="ln")(x)
        x = Conv1d(self.N, self.B, 1, name="l1")(x)
        separation_input = x

        # shared norms: one instance per distinct residual source, reused
        # across every layer that consumes that source (ref :385-392)
        shared_norms = {
            src: CepstralNorm(self.B, name=f"residual_norms_{k}")
            for src, k in prev_connections.items()
        }

        layer_outputs = {}
        for l in range(self.R * self.X):
            d = 2 ** (l % self.X)
            conns = table[l]
            if conns:
                pieces = []
                for res_ind in conns:
                    src = separation_input if res_ind == -1 else layer_outputs[res_ind]
                    pieces.append(shared_norms[res_ind](src))
                residuals = pieces[0] if len(pieces) == 1 else jnp.concatenate(
                    pieces, axis=1
                )
                mixed = Conv1d(
                    len(conns) * self.B, self.B, 1,
                    name=f"residual_denses_{layer_to_dense[l]}",
                )(residuals)
                x = _TCNBlock(
                    self.B, self.H, self.P, d, cepstral=True, name=f"sm_{l}"
                )(x + mixed)
            else:
                x = _TCNBlock(
                    self.B, self.H, self.P, d, cepstral=True, name=f"sm_{l}"
                )(x)
            if l in (8, 16, 24, 3, 11, 19):
                layer_outputs[l] = x

        if self.B != self.N:
            x = Conv1d(self.B, self.N, 1, name="reshape_before_masks")(x)
        x = BatchNorm1dEval(self.N, name="ln_mask_in")(x)

        x = MaskConv2d(self.S, self.N, name="m")(x[:, None, :, :])
        x = jax.nn.relu(x)
        if self.S == 1:
            x = jax.nn.sigmoid(x)
        else:
            x = jax.nn.softmax(x, axis=1)
        x = x * s[:, None, :, :]

        b = x.shape[0]
        return ConvTranspose1d(
            self.N * self.S, self.S, self.L, stride=self.L // 2,
            padding=self.L // 2, output_padding=(self.L // 2) - 1,
            groups=self.S, name="be",
        )(x.reshape(b, -1, x.shape[-1]))
