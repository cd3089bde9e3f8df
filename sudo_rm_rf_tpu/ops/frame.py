"""Framing ops: overlap-add reconstruction.

Reference semantics: `sudo_rm_rf/dnn/models/dprnn.py:24-64` (index_add over
subframes). Here it is expressed as ceil(L/step) shifted chunk-plane adds —
the same vectorized formulation as ops.conv.conv_transpose1d, no scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def overlap_and_add(signal: jax.Array, frame_step: int) -> jax.Array:
    """[..., frames, frame_length] -> [..., (frames-1)*step + frame_length]."""
    *outer, frames, frame_length = signal.shape
    nchunks = -(-frame_length // frame_step)
    pad = nchunks * frame_step - frame_length
    x = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(0, pad)])
    x = x.reshape(*outer, frames, nchunks, frame_step)
    full_len = (frames + nchunks - 1) * frame_step
    out = jnp.zeros((*outer, full_len), signal.dtype)
    flat = frames * frame_step
    for c in range(nchunks):
        chunk = x[..., :, c, :].reshape(*outer, flat)
        idx = (len(outer)) * (0,) + (c * frame_step,)
        cur = lax.dynamic_slice(out, idx, (*outer, flat))
        out = lax.dynamic_update_slice(out, cur + chunk, idx)
    return out[..., : (frames - 1) * frame_step + frame_length]
