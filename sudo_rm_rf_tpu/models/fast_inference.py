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
