"""Fast serving forward for the Improved SuDoRM-RF, over a standard flax
param tree.

Same math as `SuDORMRFImproved.__call__`, with:
  * every 1x1 conv expressed as an explicit MXU einsum;
  * each U-ConvBlock executed by the fused Pallas kernel
    (ops/pallas/uconv.py) keeping the pyramid in VMEM — or the XLA
    reference with ``use_pallas=False``;
  * optional bf16 compute (params/activations) with fp32 normalization
    statistics.

Forward-only (serving / eval / benchmark); training differentiates the flax
module. Numerical parity with `SuDORMRFImproved.apply` is covered by tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import ops
from sudo_rm_rf_tpu.ops.pallas.uconv import (
    fused_uconv_block,
    params_from_flax,
    uconv_block_fma,
    uconv_block_reference,
)


@functools.partial(
    jax.jit,
    static_argnames=("num_blocks", "upsampling_depth", "enc_kernel_size",
                     "num_sources", "use_pallas", "interpret", "impl"),
)
def improved_forward_fast(
    params: dict,
    input_wav: jax.Array,
    num_blocks: int = 16,
    upsampling_depth: int = 5,
    enc_kernel_size: int = 21,
    num_sources: int = 2,
    use_pallas: bool = True,
    interpret: bool = False,
    impl: str = None,
) -> jax.Array:
    """params: the flax 'params' tree of SuDORMRFImproved. x: (B, 1|-, T)."""
    if input_wav.ndim == 2:
        input_wav = input_wav[:, None, :]
    in_len = input_wav.shape[-1]
    multiple = (enc_kernel_size // 2) * 2**upsampling_depth
    x = ops.pad_to_multiple(input_wav, multiple)

    enc_num_basis = params["encoder"]["weight"].shape[0]

    x = ops.conv1d(
        x, params["encoder"]["weight"], stride=enc_kernel_size // 2,
        padding=enc_kernel_size // 2,
    )
    s = x
    x = ops.glob_ln(x, params["ln"]["gamma"], params["ln"]["beta"])
    x = (
        jnp.einsum("on,bnt->bot", params["bottleneck"]["weight"][:, :, 0], x)
        + params["bottleneck"]["bias"][None, :, None]
    )

    if impl is None:
        impl = "pallas" if use_pallas else "xla"
    for i in range(num_blocks):
        kp = params_from_flax(params[f"sm_{i}"])
        if impl == "pallas":
            x = fused_uconv_block(x, kp, depth=upsampling_depth,
                                  interpret=interpret)
        elif impl == "fma":
            x = uconv_block_fma(x, kp, upsampling_depth)
        else:
            x = uconv_block_reference(x, kp, upsampling_depth)

    slope = params["mask_net_0"]["weight"][0]
    x = jnp.where(x >= 0, x, slope * x)
    x = (
        jnp.einsum("oc,bct->bot", params["mask_net_1"]["weight"][:, :, 0], x)
        + params["mask_net_1"]["bias"][None, :, None]
    )
    b = x.shape[0]
    x = x.reshape(b, num_sources, enc_num_basis, -1)
    x = jax.nn.relu(x)
    x = x * s[:, None, :, :]

    est = ops.conv_transpose1d(
        x.reshape(b, num_sources * enc_num_basis, -1),
        params["decoder"]["weight"],
        stride=enc_kernel_size // 2,
        padding=enc_kernel_size // 2,
        output_padding=(enc_kernel_size // 2) - 1,
    )
    return ops.unpad_to_length(est, in_len)


def _tac_fast(p, x):
    """TAC over (B, G, N, T) with the flax TAC's param subtree
    (groupcomm_sudormrf.py TAC), as explicit einsums."""
    b, g, n, t = x.shape

    def lin(sub, v):
        return jnp.einsum("...ct,oc->...ot", v, sub["weight"]) + sub["bias"][
            ..., :, None
        ]

    def prelu(sub, v):
        return jnp.where(v >= 0, v, sub["weight"][0] * v)

    y = prelu(p["TAC_input_1"], lin(p["TAC_input_0"], x))
    mean = jnp.mean(y, axis=1)
    mean = prelu(p["TAC_mean_1"], lin(p["TAC_mean_0"], mean))
    h = y.shape[2]
    mean = jnp.broadcast_to(mean[:, None], (b, g, h, t))
    cat = jnp.concatenate([y, mean], axis=2)
    out = prelu(p["TAC_output_1"], lin(p["TAC_output_0"], cat))
    out = ops.glob_ln(
        out.reshape(b * g, n, t), p["TAC_norm"]["gamma"], p["TAC_norm"]["beta"]
    )
    return x + out.reshape(b, g, n, t)


@functools.partial(
    jax.jit,
    static_argnames=("num_blocks", "upsampling_depth", "enc_kernel_size",
                     "num_sources", "group_size", "in_audio_channels", "impl"),
)
def groupcomm_forward_fast(
    params: dict,
    input_wav: jax.Array,
    num_blocks: int = 16,
    upsampling_depth: int = 5,
    enc_kernel_size: int = 21,
    num_sources: int = 2,
    group_size: int = 16,
    in_audio_channels: int = 1,
    impl: str = "fma",
) -> jax.Array:
    """Fast serving forward for GroupCommSuDORMRF over its flax param tree.

    The group fold (B, C, T) -> (B*G, C/G, T) runs each shared small
    U-ConvBlock through the FMA formulation; TAC linears are einsums.
    Parity with GroupCommSuDORMRF.apply is tested.
    """
    if input_wav.ndim == 2:
        input_wav = input_wav[:, None, :]
    in_len = input_wav.shape[-1]
    multiple = (enc_kernel_size // 2) * 2**upsampling_depth
    x = ops.pad_to_multiple(input_wav, multiple)

    enc_num_basis = params["encoder"]["weight"].shape[0]
    out_channels = params["bottleneck"]["weight"].shape[0]

    x = ops.conv1d(
        x, params["encoder"]["weight"], stride=enc_kernel_size // 2,
        padding=enc_kernel_size // 2,
    )
    s = x
    x = ops.glob_ln(x, params["ln"]["gamma"], params["ln"]["beta"])
    x = ops.conv1d(
        x, params["bottleneck"]["weight"], params["bottleneck"]["bias"]
    )

    b = x.shape[0]
    g = group_size
    for i in range(num_blocks):
        bp = params[f"sm_{i}"]
        t = x.shape[-1]
        y = _tac_fast(bp["TAC"], x.reshape(b, g, out_channels // g, t))
        y = y.reshape(b * g, out_channels // g, t)
        kp = params_from_flax(bp["UBlock"])
        if impl == "pallas":
            # the folded (B*G) batch keeps per-program VMEM tiny (C/G chans)
            y = fused_uconv_block(y, kp, depth=upsampling_depth)
        elif impl == "fma":
            y = uconv_block_fma(y, kp, upsampling_depth)
        else:
            y = uconv_block_reference(y, kp, upsampling_depth)
        x = y.reshape(b, out_channels, t)

    slope = params["mask_net_0"]["weight"][0]
    x = jnp.where(x >= 0, x, slope * x)
    x = ops.conv1d(
        x, params["mask_net_1"]["weight"], params["mask_net_1"]["bias"]
    )
    x = x.reshape(b, num_sources * in_audio_channels, enc_num_basis, -1)
    x = jax.nn.relu(x)
    x = x * s[:, None, :, :]

    est = ops.conv_transpose1d(
        x.reshape(b, -1, x.shape[-1]),
        params["decoder"]["weight"],
        stride=enc_kernel_size // 2,
        padding=enc_kernel_size // 2,
        output_padding=(enc_kernel_size // 2) - 1,
    )
    return ops.unpad_to_length(est, in_len)
