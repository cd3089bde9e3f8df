"""Time-axis resampling ops for the U-ConvBlock ladder.

The reference upsamples with `torch.nn.Upsample(scale_factor=2)` (nearest)
(`improved_sudormrf.py:190-194`): every frame is repeated twice. Lengths in
the ladder are always even (guaranteed by the front-end padding), so nearest
x2 is an exact inverse of the stride-2 downsampling grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor x2 upsampling along the trailing (time) dim.

    (..., T) -> (..., 2T), x[..., 2t] == x[..., 2t+1] == input[..., t].
    """
    return jnp.repeat(x, 2, axis=-1)


def upsample_nearest(x: jax.Array, factor: int) -> jax.Array:
    """Nearest-neighbor integer-factor upsampling along the trailing dim."""
    return jnp.repeat(x, factor, axis=-1)
