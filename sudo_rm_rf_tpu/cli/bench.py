"""`sudo-tpu-bench`: the performance-measurement CLI.

TPU equivalent of `utils/run_performance_measures.sh` +
`extract_model_performance.py`: sweeps models x measures, printing one JSON
row per combination (machine-readable, like performance_results_parser).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="Benchmark model compute/memory")
    p.add_argument("--models", nargs="+", default=["sudormrf_R16"],
                   help="names from the reference zoo, or 'all'")
    p.add_argument("--measures", nargs="+", default=["forward"],
                   choices=["forward", "backward"])
    p.add_argument("--batch_sizes", nargs="+", type=int, default=[1, 4])
    p.add_argument("--timelength", type=float, default=4.0)
    p.add_argument("-fs", type=int, default=8000)
    p.add_argument("--path", default="serving", choices=["serving", "apply"],
                   help="forward to time: the model's fastest parity-tested "
                        "serving path (default) or plain flax apply")
    p.add_argument("--dtype", default=None,
                   help="compute dtype for forward rows (e.g. bfloat16)")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of one forward here "
                        "(view with tensorboard/xprof)")
    args = p.parse_args(argv)

    from sudo_rm_rf_tpu.utils.benchmark import benchmark_model, reference_model_zoo

    zoo = reference_model_zoo()
    names = list(zoo) if args.models == ["all"] else args.models
    for name in names:
        if name not in zoo:
            print(f"unknown model {name}; have {sorted(zoo)}", file=sys.stderr)
            return 1
        model = zoo[name]()
        for measure in args.measures:
            for bs in args.batch_sizes:
                row = benchmark_model(
                    model, batch_size=bs, timelength=args.timelength,
                    fs=args.fs, measure=measure, path=args.path,
                    dtype=args.dtype,
                )
                row["model"] = name
                print(json.dumps(row, default=str))
        if args.profile_dir:
            _trace_one(model, args)
    return 0


def _trace_one(model, args):
    """jax.profiler trace of one jitted forward (the reference's offline
    profiling hook, `extract_model_performance.py:209-243` analog)."""
    import jax
    import jax.numpy as jnp

    t = int(args.timelength * args.fs)
    x = jax.random.normal(jax.random.key(1), (args.batch_sizes[-1], 1, t))
    params = model.init(jax.random.key(0), x)["params"]
    fwd = jax.jit(lambda p, v: model.apply({"params": p}, v))
    fwd(params, x)  # compile outside the trace
    with jax.profiler.trace(args.profile_dir):
        fwd(params, x).block_until_ready()
    print(json.dumps({"profile_trace": args.profile_dir}))


if __name__ == "__main__":
    sys.exit(main())
