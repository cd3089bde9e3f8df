"""Compute/memory benchmark harness.

TPU port of `sudo_rm_rf/utils/extract_model_performance.py:25-298` +
`performance_results_parser.py`: per (model, measure) forward/backward
timing, parameter counts, analytical FLOPs from XLA cost analysis (replacing
thop GMACs), and device memory stats.

Timing methodology: n data-dependent iterations inside one jitted
while-loop with a scalar readback, differencing two n values — see
bench.py; plain block_until_ready timing is unreliable through the axon
relay (documented in .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def flops_of(fn: Callable, *args) -> Optional[float]:
    """Analytical FLOPs from XLA's cost analysis (thop replacement)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


def device_memory_stats() -> Dict[str, float]:
    """Per-device live memory (GB) where the backend exposes it."""
    stats = {}
    for dev in jax.devices():
        try:
            ms = dev.memory_stats()
            stats[str(dev)] = {
                "bytes_in_use_gb": ms.get("bytes_in_use", 0) / 2**30,
                "peak_bytes_in_use_gb": ms.get("peak_bytes_in_use", 0) / 2**30,
            }
        except Exception:
            stats[str(dev)] = {}
    return stats


def timed_loop(step_fn: Callable, init_carry, n_lo: int = 1, n_hi: int = 51,
               reps: int = 3) -> float:
    """Seconds per step_fn application, measured as a chained on-device loop.

    step_fn: carry -> carry (pure, jittable). Returns marginal seconds/iter.
    """

    def chain(carry, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step_fn(c), carry)

    chainj = jax.jit(chain)

    def run(n):
        out = chainj(init_carry, n)
        # force a scalar readback of one leaf
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf))

    run(n_lo)  # compile + warm

    def best_time(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(n)
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_time(n_hi) - best_time(n_lo)) / (n_hi - n_lo)


def benchmark_model(
    model,
    batch_size: int = 1,
    timelength: float = 4.0,
    fs: int = 8000,
    measure: str = "forward",
    n_hi: int = 21,
) -> Dict:
    """One (model, measure) row of the reference's results table."""
    t = int(timelength * fs)
    x = jax.random.normal(jax.random.key(1), (batch_size, 1, t), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]

    result = {
        "batch_size": batch_size,
        "timelength": timelength,
        "n_params_m": count_params(params) / 1e6,
        "measure": measure,
    }

    if measure == "forward":
        def step(carry):
            y = model.apply({"params": params}, carry)
            return jnp.sum(y, axis=1, keepdims=True) * 0.1 + x * 0.9

        secs = timed_loop(step, x, n_hi=n_hi)
        fl = flops_of(lambda p, v: model.apply({"params": p}, v), params, x)
    else:  # backward: loss grad + sgd-style update as the timed unit
        from sudo_rm_rf_tpu.losses import pit_neg_sdr_loss

        tgt = jax.random.normal(jax.random.key(2), (batch_size, 2, t))

        def loss(p, v):
            return pit_neg_sdr_loss(model.apply({"params": p}, v), tgt)

        def step(carry):
            grads = jax.grad(loss)(carry, x)
            return jax.tree.map(lambda a, g: a - 1e-9 * g, carry, grads)

        secs = timed_loop(step, params, n_hi=max(n_hi // 2, 2))
        fl = flops_of(lambda p: jax.grad(loss)(p, x), params)

    result["secs_per_batch"] = secs
    result["examples_per_sec"] = batch_size / secs
    result["audio_sec_per_sec"] = batch_size * timelength / secs
    if fl:
        result["gflops_per_batch"] = fl / 1e9
    result["memory"] = device_memory_stats()
    return result


# the reference's benchmarked model zoo (`extract_model_performance.py:75-121`)
def reference_model_zoo():
    from sudo_rm_rf_tpu import models

    def sudo(blocks):
        return models.SuDORMRFImproved(
            out_channels=256, in_channels=512, num_blocks=blocks,
            upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
            num_sources=2,
        )

    return {
        "sudormrf_R4": lambda: sudo(4),
        "sudormrf_R8": lambda: sudo(8),
        "sudormrf_R16": lambda: sudo(16),
        "groupcomm_R16": lambda: models.GroupCommSuDORMRF(
            out_channels=256, in_channels=512, num_blocks=16,
            upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
            num_sources=2, group_size=16,
        ),
        "convtasnet": lambda: models.get_model("convtasnet"),
        "dprnn": lambda: models.get_model("dprnn"),
        "demucs": lambda: models.get_model("demucs"),
    }
