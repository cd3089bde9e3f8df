"""Input-pipeline benchmark: does the loader sustain the training step?

The reference's answer to input-bound training is torch DataLoader workers
over per-file reads (`libri2mix.py:202-207`). Ours is a threaded-prefetch
loader (`data/loader.py`) over either per-file joblib reads
(`data/hierarchical.py`) or the sharded O(1)-seek format (`data/shards.py`).
This script measures, on the real chip:

  1. step-only  — U16/512 fma train step at the max-throughput config
                  (bs8, bf16 compute) with a resident device batch: the
                  rate the input pipeline must sustain.
  2. hier+train — the same step fed by AugmentedOnlineMixingDataset
                  (per-file joblib reads + online mixing on the host).
  3. shard+train — the same step fed by ShardedDataset after packing the
                  epoch into shard files (raw float32, one pread/record).

"Done" = (2) and (3) within a few percent of (1): the pipeline does not
appear in the step time. Prints one JSON row per mode.

Usage:
    python scripts/bench_ingestion.py --corpus .artifacts/corpus/train \
        [--steps 60] [--batch_size 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sudo_rm_rf_tpu.config import ModelConfig
from sudo_rm_rf_tpu.data.hierarchical import AugmentedOnlineMixingDataset
from sudo_rm_rf_tpu.data.shards import ShardedDataset, pack_dataset
from sudo_rm_rf_tpu.train import augment as augment_lib
from sudo_rm_rf_tpu.train.trainer import Trainer, TrainerConfig


def prepare_batch(key, batch):
    """WSJ0/WHAM remix recipe over the sources field (experiment.py:70-73)."""
    sources = batch[-1] if isinstance(batch, (tuple, list)) else batch
    mixture, new_sources = augment_lib.online_remix_sources(key, sources)
    return mixture[:, None, :], new_sources


def run_steps(trainer, state, batches, key):
    """Consume `batches` (host or device) through train_step; returns (state, dt)."""
    t0 = time.perf_counter()
    loss = None
    for i, batch in enumerate(batches):
        key, sub = jax.random.split(key)
        state, loss = trainer.train_step(state, batch, sub)
    jax.block_until_ready(loss)
    return state, time.perf_counter() - t0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--timelength", type=float, default=4.0)
    p.add_argument("--fs", type=int, default=8000)
    p.add_argument("--shard_dir", default=None,
                   help="where to write shards (default: <corpus>/../shards)")
    p.add_argument("--loader_only", action="store_true",
                   help="measure host-side loader batch rates only (no "
                        "device step; runs anywhere, e.g. while the chip "
                        "is busy training)")
    args = p.parse_args(argv)

    bs, steps = args.batch_size, args.steps
    n_samples = (steps + 5) * bs
    T = int(args.fs * args.timelength)

    ds = AugmentedOnlineMixingDataset(
        input_dataset_p=[args.corpus], datasets_priors=[1.0],
        n_sources=2, n_samples=n_samples, sample_rate=args.fs,
        selected_timelength=args.timelength, fixed_seed=17,
    )

    rows = []

    if args.loader_only:
        for mode, make_gen in _loader_modes(ds, args, n_samples):
            gen = make_gen(bs)
            it = iter(gen)
            for _ in range(4):  # warm the prefetch ring / page cache
                next(it)
            t0 = time.perf_counter()
            for _ in range(steps):
                next(it)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "mode": mode, "batch_size": bs,
                "batches_per_s": round(steps / dt, 1),
                "ms_per_batch": round(1e3 * dt / steps, 2),
            }))
        return

    model = ModelConfig(model_type="relu", out_channels=128, in_channels=512,
                        num_blocks=16, enc_num_basis=512, num_sources=2,
                        block_impl="fma").build()
    trainer = Trainer(model, TrainerConfig(compute_dtype="bfloat16"),
                      prepare_batch=prepare_batch)
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key, jax.numpy.zeros((bs, 1, T)))

    # 1. step-only: one resident device batch, reused.
    dev_batch = jax.device_put(
        jax.numpy.asarray(np.stack([ds[i][1] for i in range(bs)]))
    )
    state, _ = run_steps(trainer, state, [dev_batch] * 8, key)  # warmup+compile
    state, dt = run_steps(trainer, state, [dev_batch] * steps, key)
    step_only = steps / dt
    rows.append({"mode": "step_only", "steps_per_s": round(step_only, 2),
                 "ms_per_step": round(1e3 * dt / steps, 2)})

    # 2. per-file hierarchical loader feeding the step.
    gen = ds.get_generator(batch_size=bs, num_workers=8, shuffle=False)
    it = iter(gen)
    warm = [next(it) for _ in range(4)]
    state, _ = run_steps(trainer, state, warm, key)
    state, dt = run_steps(
        trainer, state, (next(it) for _ in range(steps)), key
    )
    rows.append({"mode": "hier_files+train",
                 "steps_per_s": round(steps / dt, 2),
                 "ms_per_step": round(1e3 * dt / steps, 2),
                 "overhead_vs_step_only_pct":
                     round(100 * (step_only * dt / steps - 1), 1)})

    # 3. sharded format feeding the step.
    shard_dir = args.shard_dir or os.path.join(
        os.path.dirname(os.path.abspath(args.corpus)), "shards")
    index = os.path.join(shard_dir, "bench.index.json")
    if not os.path.exists(index):
        t0 = time.perf_counter()
        index = pack_dataset(
            _Stacked(ds, n_samples), shard_dir, name="bench",
        )
        print(f"packed {n_samples} records in "
              f"{time.perf_counter() - t0:.1f}s -> {shard_dir}", file=sys.stderr)
    sds = ShardedDataset(index)
    sgen = sds.get_generator(batch_size=bs, num_workers=8, shuffle=False)
    sit = iter(sgen)
    warm = [b for _, b in zip(range(4), sit)]
    state, _ = run_steps(trainer, state, warm, key)
    state, dt = run_steps(
        trainer, state, (next(sit) for _ in range(steps)), key
    )
    rows.append({"mode": "shards+train",
                 "steps_per_s": round(steps / dt, 2),
                 "ms_per_step": round(1e3 * dt / steps, 2),
                 "overhead_vs_step_only_pct":
                     round(100 * (step_only * dt / steps - 1), 1)})

    for r in rows:
        r["batch_size"] = bs
        print(json.dumps(r))


def _loader_modes(ds, args, n_samples):
    """(name, make_generator) pairs for the two ingestion backends."""

    def hier(bs):
        return ds.get_generator(batch_size=bs, num_workers=8, shuffle=False)

    def shards(bs):
        shard_dir = args.shard_dir or os.path.join(
            os.path.dirname(os.path.abspath(args.corpus)), "shards")
        index = os.path.join(shard_dir, "bench.index.json")
        if not os.path.exists(index):
            t0 = time.perf_counter()
            index = pack_dataset(_Stacked(ds, n_samples), shard_dir,
                                 name="bench")
            print(f"packed {n_samples} records in "
                  f"{time.perf_counter() - t0:.1f}s -> {shard_dir}",
                  file=sys.stderr)
        return ShardedDataset(index).get_generator(
            batch_size=bs, num_workers=8, shuffle=False)

    return [("hier_files", hier), ("shards", shards)]


class _Stacked:
    """Adapter: hierarchical dataset items (tuple of S source arrays) ->
    single (S, T) record for shard packing."""

    def __init__(self, ds, n):
        self.ds, self.n = ds, n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (self.ds[i][1].astype(np.float32),)


if __name__ == "__main__":
    main()
