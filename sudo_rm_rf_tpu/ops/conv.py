"""1-D convolutions with PyTorch nn.Conv1d / nn.ConvTranspose1d semantics.

The whole SuDoRM-RF family is built from three conv flavours (reference
`sudo_rm_rf/dnn/models/improved_sudormrf.py:50-160`):

* dense 1x1 convs (bottleneck / projections / mask head)  -> MXU matmuls
* depthwise k=5 convs, stride 1 or 2 (the resampling ladder) -> VPU
* a dense transposed conv decoder (`improved_sudormrf.py:272-279`)

We express all of them through `lax.conv_general_dilated` with layout
``(N, C, T)`` / weight ``(O, I/g, K)`` — identical to torch's layout — so the
checkpoint converter can map torch tensors with zero transposition for
forward convs and a single flip+swap for transposed convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# torch layout: input (N, C_in, T), weight (C_out, C_in / groups, K).
_DIMSPEC = ("NCH", "OIH", "NCH")


def conv1d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    precision=None,
) -> jax.Array:
    """torch.nn.functional.conv1d equivalent.

    Args:
      x: (N, C_in, T) input.
      weight: (C_out, C_in // groups, K) kernel, torch layout.
      bias: optional (C_out,).
    Returns:
      (N, C_out, T_out) with T_out = floor((T + 2p - d(K-1) - 1)/stride) + 1.
    """
    out = lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMSPEC,
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def conv_transpose1d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    groups: int = 1,
    precision=None,
) -> jax.Array:
    """torch.nn.functional.conv_transpose1d equivalent.

    TPU-first formulation: one MXU matmul producing per-frame kernel
    contributions, then a vectorized overlap-add of ceil(K/stride) shifted
    chunk planes. This avoids ``lhs_dilation`` convs entirely (which the
    axon TPU backend miscompiles, and which XLA lowers poorly anyway) and
    turns the SuDoRM-RF decoder (K=21, stride=10) into a single
    (T x C_in) @ (C_in x S*K) matmul — exactly where the FLOPs want to be.

    Args:
      x: (N, C_in, T) input.
      weight: (C_in, C_out // groups, K) kernel, torch ConvTranspose1d layout.
      bias: optional (C_out,).
    Returns:
      (N, C_out, T_out), T_out = (T-1)*stride - 2*padding + K + output_padding.
    """
    n, c_in, t = x.shape
    cin_g = c_in // groups
    o_g, k = weight.shape[1], weight.shape[2]
    c_out = groups * o_g

    wg = weight.reshape(groups, cin_g, o_g, k)
    xg = x.reshape(n, groups, cin_g, t)
    # frame contributions: f[n,g,o,t,j] = sum_c x[n,g,c,t] * w[g,c,o,j]
    f = jnp.einsum(
        "ngct,gcoj->ngotj",
        xg,
        wg,
        precision=precision,
        preferred_element_type=x.dtype,
    ).reshape(n, c_out, t, k)

    # overlap-add: kernel tap j of frame t lands at position t*stride + j.
    # Split j into chunks of width `stride`; chunk c of every frame tiles the
    # output contiguously starting at offset c*stride.
    nchunks = -(-k // stride)
    f = jnp.pad(f, ((0, 0), (0, 0), (0, 0), (0, nchunks * stride - k)))
    f = f.reshape(n, c_out, t, nchunks, stride)
    full_len = (t + nchunks - 1) * stride
    out = jnp.zeros((n, c_out, full_len), f.dtype)
    for c in range(nchunks):
        chunk = f[:, :, :, c, :].reshape(n, c_out, t * stride)
        out = lax.dynamic_update_slice(
            out,
            lax.dynamic_slice(out, (0, 0, c * stride), (n, c_out, t * stride)) + chunk,
            (0, 0, c * stride),
        )

    t_out = (t - 1) * stride - 2 * padding + k + output_padding
    deficit = padding + t_out - full_len
    if deficit > 0:  # e.g. k == stride with output_padding > 0
        out = jnp.pad(out, ((0, 0), (0, 0), (0, deficit)))
    out = lax.slice(out, (0, 0, padding), (n, c_out, padding + t_out))
    if bias is not None:
        out = out + bias[None, :, None]
    return out
