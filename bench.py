"""Headline benchmark: real-time separation factor on one TPU chip.

Measures forward throughput of Improved SuDoRM-RF U16/Bases512 on 4 s @ 8 kHz
mixtures (the BASELINE.md headline row: 53.3 ex/s fwd GPU bs4 on a 2080 Ti
== 213.2 audio-sec/sec) and prints ONE JSON line.

vs_baseline is the ratio against that 2080 Ti number; the BASELINE.json
north star is >= 50 audio-sec/sec/chip (value >= 50).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sudo_rm_rf_tpu import models

    batch = 4
    seconds = 4.0
    sr = 8000
    t = int(seconds * sr)

    model = models.SuDORMRFImproved(
        out_channels=256,
        in_channels=512,
        num_blocks=16,
        upsampling_depth=5,
        enc_kernel_size=21,
        enc_num_basis=512,
        num_sources=2,
    )
    x = jax.random.normal(jax.random.key(1), (batch, 1, t), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]

    # serving path: shifted-FMA ladder with folded GlobLN (impl='fma') —
    # ~1.7x the plain conv lowering at identical fp32 numerics
    # (models/fast_inference.py, parity-tested)
    from sudo_rm_rf_tpu.models.fast_inference import improved_forward_fast

    def forward(p, v):
        return improved_forward_fast(
            p, v, num_blocks=16, upsampling_depth=5, enc_kernel_size=21,
            num_sources=2, impl="fma",
        )

    # Timing methodology: the axon relay makes block_until_ready unreliable
    # (returns before execution) and bulk device_get extremely slow, so we
    # run n data-dependent forwards inside ONE jitted while-loop (runtime n,
    # single compile) ending in a scalar readback, and difference two n
    # values to cancel the fixed dispatch/readback overhead.
    def chain(p, x0, n):
        def body(i, carry):
            y = forward(p, carry)
            return jnp.sum(y, axis=1, keepdims=True) * 0.1 + x0 * 0.9

        return jnp.sum(jax.lax.fori_loop(0, n, body, x0))

    chainj = jax.jit(chain)
    float(chainj(params, x, 1))  # compile + warm

    def timed(n, reps=3):
        best = float("inf")
        for _ in range(reps):
            start = time.perf_counter()
            float(chainj(params, x, n))
            best = min(best, time.perf_counter() - start)
        return best

    n_lo, n_hi = 1, 101
    per_fwd = (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo)
    audio_sec_per_sec = batch * seconds / per_fwd
    baseline = 213.2  # 2080 Ti fwd bs4 (BASELINE.md derived)
    print(
        json.dumps(
            {
                "metric": "fwd_realtime_factor_u16_bases512_bs4",
                "value": round(audio_sec_per_sec, 2),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(audio_sec_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
