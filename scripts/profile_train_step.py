"""Profile one U16/512 training step and attribute fwd vs bwd cost.

The round-3 sweep (scripts/bench_training.py) shows the whole step is
fwd+bwd (optimizer/augment/clamp free), with bwd ~7x the serving forward —
far above the ~2x FLOPs would predict, i.e. the VJP graph is
bandwidth-bound on materialized intermediates. This script times isolated
pieces to locate the traffic:

  * forward only (serving fast path, and under-value_and_grad forward)
  * grad of blocks-only (encoder/decoder/matmuls stop_gradient'd)
  * grad with norm-fold constants stop_gradient'd (cheap-stats backward)
  * remat per block (jax.checkpoint: recompute instead of materialize)

Usage: python scripts/profile_train_step.py [--bs 4] [--profile_dir DIR]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from sudo_rm_rf_tpu import models
from sudo_rm_rf_tpu.utils.benchmark import timed_loop

SR, SECS = 8000, 4.0
T = int(SR * SECS)
U16 = dict(out_channels=256, in_channels=512, num_blocks=16,
           upsampling_depth=5, enc_kernel_size=21, enc_num_basis=512,
           num_sources=2)


def bench(name, fn, carry, n_hi=11):
    secs = timed_loop(fn, carry, n_hi=n_hi)
    print(json.dumps({"what": name, "ms": round(secs * 1e3, 2)}), flush=True)
    return secs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--profile_dir", default=None)
    args = ap.parse_args()

    bs = args.bs
    x = jax.random.normal(jax.random.key(1), (bs, 1, T), jnp.float32)
    tgt = jax.random.normal(jax.random.key(2), (bs, 2, T), jnp.float32)

    for impl, remat in (("fma", False), ("fma", True), ("xla", False),
                        ("xla", True)):
        model = models.SuDORMRFImproved(**U16, block_impl=impl,
                                        remat_blocks=remat)
        params = model.init(jax.random.key(0), x)["params"]

        def fwd(p, xx):
            pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
            return model.apply({"params": pb},
                               xx.astype(jnp.bfloat16)).astype(jnp.float32)

        def loss(p, xx, t):
            est = fwd(p, xx)
            e = est - t
            return jnp.mean(jnp.sum(e * e, axis=-1))

        tag = impl + ("_remat" if remat else "")
        bench(f"fwd_{tag}", lambda c: (c[0], c[1] + 1e-6 * fwd(c[0], c[1])[:, :1]),
              (params, x))
        bench(
            f"fwdbwd_{tag}",
            lambda c: (
                jax.tree.map(
                    lambda a, g: a - 0.0 * g, c[0],
                    jax.grad(loss)(c[0], c[1], c[2])),
                c[1], c[2]),
            (params, x, tgt),
        )
        if remat or impl != "fma":
            continue

        # grad wrt BLOCK params only (encoder/decoder/bottleneck/mask frozen;
        # grad-wrt-subset prunes their weight-cotangent matmuls)
        def loss_blocks_only(pb_blocks, p, xx, t):
            return loss({**p, **pb_blocks}, xx, t)

        blocks = {k: v for k, v in params.items() if k.startswith("sm_")}
        bench(
            "fwdbwd_blocks_only",
            lambda c: (
                jax.tree.map(lambda a, g: a - 0.0 * g, c[0],
                             jax.grad(loss_blocks_only)(c[0], c[1], c[2], c[3])),
                c[1], c[2], c[3]),
            (blocks, params, x, tgt),
        )

    if args.profile_dir:
        model = models.SuDORMRFImproved(**U16, block_impl="fma")
        params = model.init(jax.random.key(0), x)["params"]

        def loss(p, xx, t):
            pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
            est = model.apply({"params": pb},
                              xx.astype(jnp.bfloat16)).astype(jnp.float32)
            e = est - t
            return jnp.mean(jnp.sum(e * e, axis=-1))

        g = jax.jit(jax.grad(loss))
        g(params, x, tgt)  # compile
        with jax.profiler.trace(args.profile_dir):
            for _ in range(3):
                r = g(params, x, tgt)
            jax.block_until_ready(r)
        print(json.dumps({"profile_dir": args.profile_dir}))


if __name__ == "__main__":
    main()
