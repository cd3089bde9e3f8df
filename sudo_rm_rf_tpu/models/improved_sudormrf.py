"""Improved SuDoRM-RF (the "relu" variant) — flagship model.

Behavioral spec from the reference `sudo_rm_rf/dnn/models/improved_sudormrf.py`:
  * encoder: bias-free Conv1d(1 -> N, k=L, stride=L//2, pad=L//2), xavier init
    (ref :247-252)
  * GlobLN + 1x1 bottleneck N -> C (ref :255-259)
  * num_blocks x U-ConvBlock (ref :162-220)
  * mask head: PReLU -> 1x1 conv C -> S*N, reshape, ReLU, multiply with the
    *pre-norm* encoder features (ref :268-269, :295-298)
  * decoder: dense ConvTranspose1d(S*N -> S, k=L, stride=L//2, pad=L//2,
    output_padding=L//2-1), bias-free, xavier init (ref :272-280)
  * pad input length to a multiple of (L//2 * 2**depth), crop output back
    (ref :244, :303-318)

The TPU-native departure: padding arithmetic is static (trace-time), the
U-ConvBlock has an interchangeable fused-Pallas implementation, and all
convs lower onto MXU/VPU via XLA with optional bf16 compute.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import ops
from sudo_rm_rf_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    ConvNormAct,
    DilatedConvNorm,
    GlobLN,
    NormAct,
    PReLU,
    xavier_uniform_conv,
)


class UConvBlock(nn.Module):
    """Successive downsampling/upsampling multi-resolution block.

    Ref `improved_sudormrf.py:162-220`: 1x1 proj C->Cin, a depthwise ladder of
    `depth` levels (level 0 stride 1, k=5; levels 1.. stride 2, k=5), then a
    reverse pass adding nearest-x2-upsampled deeper levels into shallower
    ones, GlobLN+PReLU, and a 1x1 conv back to C with a residual.
    """

    out_channels: int = 128
    in_channels: int = 512
    upsampling_depth: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvNormAct(self.out_channels, self.in_channels, 1, name="proj_1x1")(x)

        pyramid: List[jax.Array] = []
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

        expanded = NormAct(self.in_channels, name="final_norm")(acc)
        out = Conv1d(self.in_channels, self.out_channels, 1, name="res_conv")(expanded)
        return out + residual


class _ConvParams(nn.Module):
    """Param shell: registers Conv1d-compatible params and returns them."""

    out_channels: int
    in_channels: int
    kernel_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        from sudo_rm_rf_tpu.models.layers import (
            _kaiming_uniform_conv,
            _torch_conv_bias_init,
        )

        w = self.param(
            "weight",
            _kaiming_uniform_conv,
            (self.out_channels, self.in_channels, self.kernel_size),
        )
        b = None
        if self.use_bias:
            fan_in = self.in_channels * self.kernel_size
            b = self.param(
                "bias", _torch_conv_bias_init(fan_in), (self.out_channels,)
            )
        return w, b


class _GlobLNParams(nn.Module):
    channels: int

    @nn.compact
    def __call__(self):
        return (
            self.param("gamma", nn.initializers.ones, (self.channels,)),
            self.param("beta", nn.initializers.zeros, (self.channels,)),
        )


class _PReLUParams(nn.Module):
    @nn.compact
    def __call__(self):
        return self.param(
            "weight", lambda k, s: jnp.full(s, 0.25, jnp.float32), (1,)
        )


class _NormActParams(nn.Module):
    channels: int

    @nn.compact
    def __call__(self):
        g, b = _GlobLNParams(self.channels, name="norm")()
        return g, b, _PReLUParams(name="act")()


class _ConvNormActParams(nn.Module):
    in_channels: int
    out_channels: int
    depthwise: bool = False
    with_act: bool = True

    @nn.compact
    def __call__(self):
        w, b = _ConvParams(
            self.out_channels,
            1 if self.depthwise else self.in_channels,
            5 if self.depthwise else 1,
            name="conv",
        )()
        g, be = _GlobLNParams(self.out_channels, name="norm")()
        slope = _PReLUParams(name="act")() if self.with_act else None
        return w, b, g, be, slope


def _channel_constrain(mesh):
    """(B, C, T) channel-dim sharding constraint over mesh axes, or None."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sudo_rm_rf_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    sh = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))

    def constrain(v):
        return jax.lax.with_sharding_constraint(v, sh)

    return constrain


def register_uconv_kp(out_channels: int, in_channels: int, depth: int) -> dict:
    """Register UConvBlock-named param shells on the CALLING module and
    return them as the kernel-param dict (`ops.pallas.uconv` kp layout).

    Must be called from inside an ``@nn.compact`` ``__call__`` — the shells
    (proj_1x1 / spp_dw_k / final_norm / res_conv) attach to whatever module
    is currently compacting, so the param tree is byte-identical to a plain
    UConvBlock at the same path.
    """
    pw, pb, pg, pbe, pslope = _ConvNormActParams(
        out_channels, in_channels, name="proj_1x1"
    )()
    dw_w, dw_b, dw_g, dw_be = [], [], [], []
    for k in range(depth):
        w, b, g, be, _ = _ConvNormActParams(
            in_channels, in_channels, depthwise=True,
            with_act=False, name=f"spp_dw_{k}",
        )()
        dw_w.append(w[:, 0, :])
        dw_b.append(b)
        dw_g.append(g)
        dw_be.append(be)
    fg, fbe, fslope = _NormActParams(in_channels, name="final_norm")()
    rw, rb = _ConvParams(out_channels, in_channels, 1, name="res_conv")()

    return {
        "proj_w": pw[:, :, 0], "proj_b": pb, "proj_g": pg,
        "proj_beta": pbe, "proj_slope": pslope[0],
        "dw_w": jnp.stack(dw_w), "dw_b": jnp.stack(dw_b),
        "dw_g": jnp.stack(dw_g), "dw_beta": jnp.stack(dw_be),
        "final_g": fg, "final_beta": fbe, "final_slope": fslope[0],
        "res_w": rw[:, :, 0], "res_b": rb,
    }


class UConvBlockFMA(nn.Module):
    """UConvBlock computed via the shifted-FMA + folded-GlobLN formulation
    (ops.pallas.uconv.uconv_block_fma; ~1.7x the conv lowering on TPU,
    differentiable). Param tree is IDENTICAL to UConvBlock — the submodules
    here are param shells with the same names."""

    out_channels: int = 128
    in_channels: int = 512
    upsampling_depth: int = 4
    # optional Mesh: channel-dim sharding constraints -> GSPMD compute
    # tensor parallelism over the 'model' axis (fwd AND bwd; the constraint
    # is differentiable). None = no constraint.
    tp_mesh: object = None

    @nn.compact
    def __call__(self, x):
        from sudo_rm_rf_tpu.ops.pallas.uconv import uconv_block_fma

        kp = register_uconv_kp(
            self.out_channels, self.in_channels, self.upsampling_depth
        )
        return uconv_block_fma(x, kp, self.upsampling_depth,
                               constrain=_channel_constrain(self.tp_mesh))


class SuDORMRFImproved(nn.Module):
    """Improved SuDoRM-RF separator. Input (B, 1, T) mixture, output (B, S, T).

    block_impl: 'xla' (plain convs) or 'fma' (shifted-FMA + folded-norm
    blocks — same params and numerics, ~1.7x faster on TPU, used for
    training too since it is differentiable).
    """

    out_channels: int = 128
    in_channels: int = 512
    num_blocks: int = 16
    upsampling_depth: int = 4
    enc_kernel_size: int = 21
    enc_num_basis: int = 512
    num_sources: int = 2
    block_impl: str = "xla"
    # compute tensor parallelism (requires block_impl='fma'): see
    # UConvBlockFMA.tp_mesh
    tp_mesh: object = None
    # rematerialize block activations in backward (jax.checkpoint): trades
    # ~1 extra forward for O(num_blocks) less activation memory — lets
    # U36/4096-class configs train at batch sizes where the reference OOMs
    # (BASELINE.md rows 3/6).
    remat_blocks: bool = False

    @property
    def n_least_samples_req(self) -> int:
        return (self.enc_kernel_size // 2) * 2**self.upsampling_depth

    @nn.compact
    def __call__(self, input_wav):
        if input_wav.ndim == 2:  # allow (B, T)
            input_wav = input_wav[:, None, :]
        in_len = input_wav.shape[-1]
        x = ops.pad_to_multiple(input_wav, self.n_least_samples_req)

        x = Conv1d(
            1,
            self.enc_num_basis,
            self.enc_kernel_size,
            stride=self.enc_kernel_size // 2,
            padding=self.enc_kernel_size // 2,
            use_bias=False,
            weight_init=xavier_uniform_conv,
            name="encoder",
        )(x)
        s = x  # pre-norm encoder features, reused at the mask product

        x = GlobLN(self.enc_num_basis, name="ln")(x)
        x = Conv1d(self.enc_num_basis, self.out_channels, 1, name="bottleneck")(x)

        block_cls = UConvBlockFMA if self.block_impl == "fma" else UConvBlock
        if self.tp_mesh is not None and self.block_impl != "fma":
            raise ValueError("tp_mesh requires block_impl='fma'")
        block_kw = (
            {"tp_mesh": self.tp_mesh} if self.block_impl == "fma" else {}
        )
        if self.remat_blocks:
            block_cls = nn.remat(block_cls)
        for i in range(self.num_blocks):
            x = block_cls(
                out_channels=self.out_channels,
                in_channels=self.in_channels,
                upsampling_depth=self.upsampling_depth,
                name=f"sm_{i}",
                **block_kw,
            )(x)

        x = PReLU(name="mask_net_0")(x)
        x = Conv1d(
            self.out_channels,
            self.num_sources * self.enc_num_basis,
            1,
            name="mask_net_1",
        )(x)
        b = x.shape[0]
        x = x.reshape(b, self.num_sources, self.enc_num_basis, -1)
        x = jax.nn.relu(x)
        x = x * s[:, None, :, :]

        x = x.reshape(b, self.num_sources * self.enc_num_basis, -1)
        est = ConvTranspose1d(
            self.enc_num_basis * self.num_sources,
            self.num_sources,
            self.enc_kernel_size,
            stride=self.enc_kernel_size // 2,
            padding=self.enc_kernel_size // 2,
            output_padding=(self.enc_kernel_size // 2) - 1,
            use_bias=False,
            weight_init=xavier_uniform_conv,
            name="decoder",
        )(x)
        return ops.unpad_to_length(est, in_len)
