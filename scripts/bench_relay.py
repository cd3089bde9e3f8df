"""End-to-end dispatch-path bench for relay-fed training (round 3).

The round-3 flagship run measured 830 s steady-state epochs (2,500 steps +
6,000 device-resident val examples) while the pure on-device step is
20.2 ms — i.e. through the axon relay the CLI still pays ~10x in dispatch
overhead (scheduling stalls + H2D). This harness isolates the dispatch path
exactly as the CLI runs it (`train/experiment.py::_flush` -> chained
`Trainer.train_steps`) with the loader taken out (pre-built host chunks),
and sweeps the three levers:

  * chain_steps  — steps per dispatch (fewer dispatches, bigger uploads)
  * upload_dtype — bf16 host->device transfers (half the H2D bytes;
                   the step upcasts on-device, only the transfer quantizes)
  * max_inflight — bounded dispatch queue (relay degrades with deep queues)

Usage: python scripts/bench_relay.py [--steps 200] [--bs 8]
Prints one JSON row per config: end-to-end ms/step incl. host stack+upload.
"""

from __future__ import annotations

import argparse
import json
import resource
import time

import jax
import jax.numpy as jnp
import numpy as np

from sudo_rm_rf_tpu import models
from sudo_rm_rf_tpu.train import Trainer, TrainerConfig

SR, SECS = 8000, 4.0
T = int(SR * SECS)
U16 = dict(out_channels=256, in_channels=512, num_blocks=16,
           upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
           num_sources=2)


def run_config(model, *, bs, steps, chain, upload_dtype, max_inflight,
               compute_dtype="bfloat16"):
    trainer = Trainer(
        model,
        TrainerConfig(
            learning_rate=1e-3,
            compute_dtype=compute_dtype,
            upload_dtype=upload_dtype,
        ),
    )
    state = trainer.init_state(jax.random.key(0), jnp.zeros((bs, 1, T)))
    key = jax.random.key(1)

    rng = np.random.default_rng(0)
    n_chunks = max(steps // chain, 1)
    # distinct host buffers per chunk, exactly like the CLI's per-chunk
    # np.stack output (reusing one buffer would hide the host-side
    # stack/cast cost and the queue's buffer pinning)
    chunks = [
        rng.standard_normal((chain, bs, 2, T), dtype=np.float32)
        for _ in range(min(n_chunks, 4))
    ]

    # warm-up: compile the chained program
    state, m, key = trainer.train_steps(state, chunks[0], key)
    jax.block_until_ready(m["loss"])

    inflight = []
    t0 = time.time()
    for i in range(n_chunks):
        state, metrics, key = trainer.train_steps(
            state, chunks[i % len(chunks)], key
        )
        inflight.append(metrics["loss"])
        if max_inflight > 0 and len(inflight) > max_inflight:
            jax.block_until_ready(inflight.pop(0))
    jax.block_until_ready(state.step)
    secs = time.time() - t0
    n = n_chunks * chain
    return {
        "chain": chain,
        "upload_dtype": upload_dtype or "float32",
        "max_inflight": max_inflight,
        "ms_per_step": round(secs / n * 1e3, 2),
        "ex_per_sec": round(n * bs / secs, 1),
        "rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024**2, 2
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--chains", type=int, nargs="+", default=[25, 50, 100])
    args = ap.parse_args()

    model = models.SuDORMRFImproved(**U16, block_impl="xla")

    # baseline: round-3 shipped config (chain 25, fp32 uploads, unbounded)
    configs = [dict(chain=25, upload_dtype=None, max_inflight=0)]
    for chain in args.chains:
        configs.append(dict(chain=chain, upload_dtype=None, max_inflight=2))
        configs.append(
            dict(chain=chain, upload_dtype="bfloat16", max_inflight=2)
        )

    for cfg in configs:
        row = run_config(model, bs=args.bs, steps=args.steps, **cfg)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
