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
        out_channels=128,
        in_channels=512,
        num_blocks=16,
        upsampling_depth=5,
        enc_kernel_size=21,
        enc_num_basis=512,
        num_sources=2,
    )
    x = jax.random.normal(jax.random.key(1), (batch, 1, t), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    # warmup / compile
    fwd(params, x).block_until_ready()

    n_iters = 20
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(n_iters):
            out = fwd(params, x)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - start) / n_iters)

    audio_sec_per_sec = batch * seconds / best
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
