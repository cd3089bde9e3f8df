"""Streaming (block-online) separation for the causal SuDoRM-RF.

The reference's causal v3 masks future taps to be streamable
(`causal_improved_sudormrf_v3.py:21-27`) but ships no streaming runtime.
This one processes fixed-size hops as they arrive: each step runs the jitted
model over [left context | new hop] (one static shape = one compile) and
emits only the new hop's samples. Because the model is causal, emitted
samples never change once produced, and with enough context the streamed
output equals the offline forward (verified by tests).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class StreamingSeparator:
    """Block-online separation with a rolling left-context buffer.

    The causal model is causal up to a BOUNDED LOOKAHEAD: its (unmasked)
    transposed-conv decoder reads one future encoder frame
    (`causal_improved_sudormrf_v3.py:184-192`), i.e. up to enc_kernel_size//2
    input samples ahead. Streaming therefore emits with `lookahead_samples`
    of latency; with that (plus grid-aligned context), streamed output
    EQUALS the offline forward (tested).

    Args:
      model: causal flax module (B, C, T) -> (B, S, T).
      params: model params.
      hop_samples: samples consumed/emitted per step.
      context_samples: left context before each hop; must cover the model's
        receptive field AND be a multiple of its padding granule
        (enc_kernel_size//2 * 2**depth) so conv grids align.
      lookahead_samples: output latency; >= enc_kernel_size//2. Defaults to
        one padding granule.
    """

    def __init__(
        self,
        model,
        params,
        hop_samples: int,
        context_samples: int,
        num_sources: int = 2,
        lookahead_samples: Optional[int] = None,
        forward_fn=None,
    ):
        self.params = params
        self.hop = int(hop_samples)
        self.context = int(context_samples)
        self.num_sources = num_sources
        if lookahead_samples is None:
            granule = getattr(model, "n_least_samples_req", None)
            lookahead_samples = int(granule) if granule else self.hop
        self.lookahead = int(lookahead_samples)
        if self.lookahead > self.context:
            raise ValueError("lookahead must not exceed the context")
        apply_fn = forward_fn or (lambda p, v: model.apply({"params": p}, v))
        self._window = self.context + self.hop

        la, hop, w = self.lookahead, self.hop, self._window

        @jax.jit
        def step(params, window):  # (1, 1, context+hop)
            est = apply_fn(params, window)
            return est[:, :, w - la - hop : w - la]

        self._step = step
        self.reset()

    def reset(self):
        self._buffer = np.zeros(self._window, np.float32)
        self._filled = 0

    def push(self, hop_audio: np.ndarray) -> np.ndarray:
        """Feed exactly hop_samples new samples; returns (S, hop) estimates
        for the span ending `lookahead` samples behind the newest input."""
        hop_audio = np.asarray(hop_audio, np.float32).reshape(-1)
        if hop_audio.shape[0] != self.hop:
            raise ValueError(
                f"push expects exactly {self.hop} samples, got {hop_audio.shape[0]}"
            )
        self._buffer = np.roll(self._buffer, -self.hop)
        self._buffer[-self.hop :] = hop_audio
        self._filled = min(self._filled + self.hop, self._window)
        out = self._step(self.params, jnp.asarray(self._buffer[None, None, :]))
        return np.asarray(out)[0]

    def separate_stream(self, mixture: np.ndarray) -> np.ndarray:
        """Convenience: stream a full recording hop-by-hop -> (S, T).

        Feeds ceil(lookahead/hop) extra silent hops to flush the latency,
        then realigns, so the result is directly comparable to the offline
        forward.
        """
        mixture = np.asarray(mixture, np.float32).reshape(-1)
        t = mixture.shape[0]
        n_hops = -(-t // self.hop)
        n_extra = -(-self.lookahead // self.hop)
        padded = np.zeros((n_hops + n_extra) * self.hop, np.float32)
        padded[:t] = mixture
        self.reset()
        outs = [
            self.push(padded[i * self.hop : (i + 1) * self.hop])
            for i in range(n_hops + n_extra)
        ]
        # emission i covers input span [i*hop - lookahead, (i+1)*hop - lookahead)
        full = np.concatenate(outs, axis=-1)
        return full[:, self.lookahead : self.lookahead + t]
