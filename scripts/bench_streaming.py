"""Streaming (block-online) serving latency for the causal SuDoRM-RF.

The reference's causal v3 is *streamable by construction* (future taps
masked, `causal_improved_sudormrf_v3.py:21-27`) but ships no streaming
runtime or latency numbers. This measures ours (`inference/streaming.py`):
per-hop step time of the jitted [context | hop] window forward, the
real-time factor of ONE stream (hop duration / step time), and the batched
variant (many concurrent streams stepped as one batch — the serving shape
for a fleet of live calls).

Timing uses the chained on-device loop (utils/benchmark.timed_loop), i.e.
device step time — the relay's per-call host dispatch is excluded, as for
every other row in BENCHMARKS.md.

Usage:
    python scripts/bench_streaming.py [--hop 160] [--context 3200]
                                      [--streams 1 16]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

SR = 8000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hop", type=int, default=160,
                    help="samples per step (160 = 20 ms @ 8 kHz)")
    ap.add_argument("--context", type=int, default=3200,
                    help="left context samples (multiple of the granule)")
    ap.add_argument("--streams", type=int, nargs="+", default=[1, 16])
    ap.add_argument("--n_hi", type=int, default=51)
    args = ap.parse_args()

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.utils.benchmark import timed_loop

    model = models.get_model("causal")
    granule = model.n_least_samples_req
    if args.context % granule:
        raise SystemExit(f"--context must be a multiple of the model "
                         f"granule ({granule})")
    window = args.context + args.hop
    x1 = jax.random.normal(jax.random.key(0), (1, 1, window), jnp.float32)
    params = model.init(jax.random.key(1), x1)["params"]

    for n in args.streams:
        x = jax.random.normal(jax.random.key(2), (n, 1, window), jnp.float32)

        def step(c):
            est = model.apply({"params": params}, c)
            return jnp.sum(est, axis=1, keepdims=True) * 0.1 + c * 0.9

        secs = timed_loop(step, x, n_hi=args.n_hi)
        hop_ms = 1e3 * args.hop / SR
        step_ms = secs * 1e3
        print(json.dumps({
            "streams": n,
            "hop_ms": round(hop_ms, 1),
            "context_ms": round(1e3 * args.context / SR, 1),
            "step_ms": round(step_ms, 3),
            "per_stream_rtf": round(n * hop_ms / step_ms, 1),
            "granule": granule,
        }), flush=True)


if __name__ == "__main__":
    main()
