"""Quality cross-check: a trained checkpoint vs the torch reference.

The strongest zero-egress evidence for the north star's quality half
(BASELINE.json wants SI-SDRi parity on published checkpoints, which are
unreachable): take a checkpoint TRAINED BY THIS FRAMEWORK, export it into
the reference's torch GroupComm/Improved architecture
(`convert.params_to_state_dict`), and evaluate BOTH frameworks on the same
fixed-seed mixtures. If the SI-SDRi agree to <0.01 dB, checkpoint
interchange preserves separation quality in both directions — the same
property the published-checkpoint test would establish.

Usage:
    python scripts/quality_crosscheck.py \
        --checkpoint .artifacts/ckpt/gc_r16_synth/best_... \
        --corpus .artifacts/corpus/test --model_type groupcomm_v2 \
        --n_samples 32 [--mixture_consistency uniform]

Prints one JSON line: jax/torch mean SI-SDRi, |delta|, output fidelity dB.
"""

from __future__ import annotations

import argparse
import glob as _glob
import json
import sys

sys.modules.setdefault("glob2", _glob)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--model_type", default="groupcomm_v2")
    p.add_argument("--n_samples", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("-fs", type=int, default=8000)
    p.add_argument("--timelength", type=float, default=4.0)
    p.add_argument("--mixture_consistency", default=None)
    p.add_argument("--reference_root", default="/root/reference")
    p.add_argument("--force_cpu", action="store_true")
    p.add_argument("--out_channels", type=int, default=256)
    p.add_argument("--in_channels", type=int, default=512)
    p.add_argument("--num_blocks", type=int, default=16)
    p.add_argument("--upsampling_depth", type=int, default=5)
    p.add_argument("--enc_kernel_size", type=int, default=21)
    p.add_argument("--enc_num_basis", type=int, default=512)
    p.add_argument("--num_sources", type=int, default=2)
    p.add_argument("--group_size", type=int, default=16)
    args = p.parse_args(argv)

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from sudo_rm_rf_tpu import losses, models
    from sudo_rm_rf_tpu.cli.export import _build_torch_model
    from sudo_rm_rf_tpu.convert import params_to_state_dict
    from sudo_rm_rf_tpu.convert.flax_checkpoint import (
        load_params_from_checkpoint,
    )
    from sudo_rm_rf_tpu.data.setup import create_augmented_loader

    hp = dict(
        out_channels=args.out_channels, in_channels=args.in_channels,
        num_blocks=args.num_blocks, upsampling_depth=args.upsampling_depth,
        enc_kernel_size=args.enc_kernel_size,
        enc_num_basis=args.enc_num_basis, num_sources=args.num_sources,
    )
    if args.model_type == "groupcomm_v2":
        hp["group_size"] = args.group_size
    model = models.get_model(args.model_type, **hp)
    t = int(args.fs * args.timelength)
    template = model.init(jax.random.key(0), jnp.zeros((1, 1, t)))["params"]
    params = load_params_from_checkpoint(args.checkpoint, template)

    if args.reference_root not in sys.path:
        sys.path.insert(0, args.reference_root)
    tm = _build_torch_model(args.model_type, hp).eval()
    tm.load_state_dict(
        params_to_state_dict(params, target_keys=tm.state_dict().keys(),
                             to_torch=True),
        strict=True,
    )

    ds = create_augmented_loader(
        {
            "test_dataset_paths": [args.corpus],
            "n_test": args.n_samples,
            "fs": args.fs,
            "audio_timelength": args.timelength,
            "n_sources": args.num_sources,
        },
        split="test",
    )
    loader = ds.get_generator(batch_size=args.batch_size, shuffle=False,
                              num_workers=2)

    sisdri = losses.PermInvariantSISDR(
        n_sources=args.num_sources, zero_mean=True, backward_loss=False,
        improvement=True, return_individual_results=True,
    )

    @jax.jit
    def forward(params, mixture):
        mean = jnp.mean(mixture, axis=-1, keepdims=True)
        std = jnp.std(mixture, axis=-1, keepdims=True, ddof=1)
        xn = (mixture - mean) / (std + 1e-9)
        est = model.apply({"params": params}, xn)
        if args.mixture_consistency:
            est = losses.mixture_consistency(est, xn, args.mixture_consistency)
        return est * std + mean

    jx, tx, fid_num, fid_den = [], [], 0.0, 0.0
    for mix, targets in loader:
        mixture = np.asarray(mix)[:, None, :]
        targets = np.asarray(targets)

        est_j = np.asarray(forward(params, jnp.asarray(mixture)))

        with torch.no_grad():
            m = torch.from_numpy(mixture)
            mean = m.mean(-1, keepdim=True)
            std = m.std(-1, keepdim=True)
            xn = (m - mean) / (std + 1e-9)
            est_t = tm(xn)
            if args.mixture_consistency:
                import sudo_rm_rf.dnn.experiments.utils.mixture_consistency \
                    as ref_mc

                est_t = ref_mc.apply(est_t, xn)
            est_t = (est_t * std + mean).numpy()

        jx += np.asarray(
            sisdri(jnp.asarray(est_j), jnp.asarray(targets),
                   initial_mixtures=jnp.asarray(mixture))
        ).tolist()
        tx += np.asarray(
            sisdri(jnp.asarray(est_t), jnp.asarray(targets),
                   initial_mixtures=jnp.asarray(mixture))
        ).tolist()
        fid_num += float((est_t**2).sum())
        fid_den += float(((est_t - est_j) ** 2).sum())

    fidelity_db = 10 * np.log10(fid_num / max(fid_den, 1e-30))
    out = {
        "jax_sisdri_mean": round(float(np.mean(jx)), 4),
        "torch_sisdri_mean": round(float(np.mean(tx)), 4),
        "abs_delta_db": round(abs(float(np.mean(jx)) - float(np.mean(tx))), 5),
        "output_fidelity_db": round(float(fidelity_db), 1),
        "n_examples": len(jx),
        "checkpoint": args.checkpoint,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
