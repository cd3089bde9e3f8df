"""Long-recording serving bench: overlap-add vs exact sequence engine.

Measures wall-clock to separate one long mixture (default 60 s @ 8 kHz)
with the flagship Improved U16/512 on the current device set:

  * `OverlapAddSeparator` (COLA chunking, per-chunk PIT realignment)
  * `SequenceParallelSeparator` (exact single pass; on one chip this is a
    1-shard degenerate mesh — the point of comparison is that exactness
    costs no throughput; on a pod slice the time axis splits n ways)

Chained-run discipline as everywhere else: jitted work is timed over
`--reps` repetitions after a warmup separation, host-side blending
included (it is part of what a user gets).

Usage: python scripts/bench_longform.py [--seconds 60] [--reps 3] [--gc]
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("-fs", type=int, default=8000)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--gc", action="store_true",
                   help="bench the GroupComm R16/512 config instead")
    p.add_argument("--compute_dtype", default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny config for CI smoke (not a benchmark)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.inference import (
        OverlapAddSeparator,
        SequenceParallelSeparator,
        make_seq_mesh,
    )
    from sudo_rm_rf_tpu.models.fast_inference import (
        groupcomm_forward_fast,
        improved_forward_fast,
    )

    if args.tiny:
        dims = dict(out_channels=16, in_channels=32, num_blocks=2,
                    upsampling_depth=3, enc_kernel_size=17, enc_num_basis=16)
    else:
        dims = dict(out_channels=256, in_channels=512, num_blocks=16,
                    upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512)
    if args.gc:
        model_type = "groupcomm_v2"
        hp = dict(num_sources=2, group_size=16 if not args.tiny else 4, **dims)
        model = models.get_model(model_type, **hp)

        def fast(params, v):
            return groupcomm_forward_fast(
                params, v, num_blocks=hp["num_blocks"],
                upsampling_depth=hp["upsampling_depth"],
                enc_kernel_size=hp["enc_kernel_size"], num_sources=2,
                group_size=hp["group_size"],
                compute_dtype=args.compute_dtype,
            )
    else:
        model_type = "relu"
        hp = dict(num_sources=2, **dims)
        model = models.get_model(model_type, **hp)

        def fast(params, v):
            return improved_forward_fast(
                params, v, num_blocks=hp["num_blocks"],
                upsampling_depth=hp["upsampling_depth"],
                enc_kernel_size=hp["enc_kernel_size"], num_sources=2,
                impl="fma", compute_dtype=args.compute_dtype,
            )

    init_t = (hp["enc_kernel_size"] // 2) * 2 ** hp["upsampling_depth"] * 10
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, init_t)))["params"]
    t = int(args.seconds * args.fs)
    mixture = np.random.default_rng(0).standard_normal(t).astype(np.float32)

    ola = OverlapAddSeparator(
        model, params, chunk_samples=4 * args.fs, num_sources=2,
        batch_chunks=8, forward_fn=fast,
    )
    seq = SequenceParallelSeparator(
        params, mesh=make_seq_mesh(),
        num_blocks=hp["num_blocks"], upsampling_depth=hp["upsampling_depth"],
        enc_kernel_size=hp["enc_kernel_size"], num_sources=2,
        model_type=model_type, group_size=hp.get("group_size", 16),
        compute_dtype=args.compute_dtype,
    )

    rows = {}
    for name, sep in (("overlap_add", ola), ("seq_parallel", seq)):
        est = sep.separate(mixture)  # warmup/compile
        assert np.isfinite(est).all()
        t0 = time.perf_counter()
        for _ in range(args.reps):
            est = sep.separate(mixture)
        dt = (time.perf_counter() - t0) / args.reps
        rows[name] = {
            "seconds_per_recording": round(dt, 4),
            "audio_sec_per_sec": round(args.seconds / dt, 1),
        }
        print(json.dumps({"engine": name, "model": model_type,
                          "recording_s": args.seconds,
                          "n_devices": len(jax.devices()), **rows[name]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
