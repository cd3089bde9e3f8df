"""Length padding helpers.

The reference pads inputs to a model-specific multiple before the encoder and
crops the decoder output back (`improved_sudormrf.py:303-318`; LCM variant
`sudormrf.py:206-209,283-293`). Under XLA we insist on *static* shapes: these
helpers take Python-int lengths at trace time, so each distinct input length
compiles its own graph (eval uses bucketed lengths; training uses one fixed
length).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def padded_length(input_length: int, multiple: int) -> int:
    """Smallest multiple of `multiple` that is >= max(input_length, multiple).

    Matches `SuDORMRF.pad_to_appropriate_length` arithmetic
    (`improved_sudormrf.py:303-310`).
    """
    if input_length < multiple:
        return multiple
    res = 1 if input_length % multiple else 0
    return (input_length // multiple + res) * multiple


def pad_to_multiple(x: jax.Array, multiple: int) -> jax.Array:
    """Zero-pad the trailing (time) dim up to `padded_length`."""
    target = padded_length(x.shape[-1], multiple)
    pad = target - x.shape[-1]
    if pad == 0:
        return x
    cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, cfg)


def unpad_to_length(x: jax.Array, length: int) -> jax.Array:
    """Crop the trailing dim back to the original length."""
    return x[..., :length]
