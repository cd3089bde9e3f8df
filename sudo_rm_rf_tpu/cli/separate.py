"""`sudo-tpu-separate`: separate wav files with a checkpoint.

Supports both this framework's msgpack checkpoints and the published torch
``.pt`` checkpoints (whole pickled module or state_dict) via the converter —
the reference's README inference recipe (`README.md:75-115`) as one command:

    sudo-tpu-separate --checkpoint Improved_Sudormrf_U16_Bases512_WSJ02mix.pt \
        --model_type relu --input mix1.wav mix2.wav --out_dir ./separated
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="Separate audio files")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model_type", default="relu")
    p.add_argument("--input", nargs="+", required=True)
    p.add_argument("--out_dir", default="./separated")
    p.add_argument("-fs", type=int, default=8000)
    p.add_argument("--chunk_seconds", type=float, default=4.0)
    p.add_argument("--batch_chunks", type=int, default=8)
    p.add_argument("--num_sources", type=int, default=2)
    p.add_argument("--mixture_consistency", default=None,
                   choices=[None, "uniform", "magsq"])
    p.add_argument("--mode", default="overlap_add",
                   choices=["overlap_add", "seq_parallel"],
                   help="overlap_add: COLA chunking (any model); "
                        "seq_parallel: exact single-pass time sharding over "
                        "all devices (model_type relu)")
    p.add_argument("--reference_root", default=None,
                   help="path that makes a whole-pickled torch module loadable")
    # model hyperparams (needed for bare state_dicts / msgpack checkpoints)
    p.add_argument("--out_channels", type=int, default=128)
    p.add_argument("--in_channels", type=int, default=512)
    p.add_argument("--num_blocks", type=int, default=16)
    p.add_argument("--upsampling_depth", type=int, default=5)
    p.add_argument("--enc_kernel_size", type=int, default=21)
    p.add_argument("--enc_num_basis", type=int, default=512)
    p.add_argument("--group_size", type=int, default=16)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.inference import separate_file

    hp = dict(
        out_channels=args.out_channels, in_channels=args.in_channels,
        num_blocks=args.num_blocks, upsampling_depth=args.upsampling_depth,
        enc_kernel_size=args.enc_kernel_size, enc_num_basis=args.enc_num_basis,
        num_sources=args.num_sources,
    )
    if args.model_type == "groupcomm_v2":
        hp["group_size"] = args.group_size

    if args.checkpoint.endswith(".pt"):
        from sudo_rm_rf_tpu.convert import load_pt_file, state_dict_to_params

        sd, attrs = load_pt_file(args.checkpoint, reference_root=args.reference_root)
        hp.update(attrs)
        model = models.get_model(args.model_type, **hp)
        chunk = int(args.chunk_seconds * args.fs)
        shapes = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 1, chunk))
        )
        params = state_dict_to_params(
            sd, shapes["params"], ignore_unused=("ln_mask_in",)
        )
    else:
        from sudo_rm_rf_tpu.convert.flax_checkpoint import (
            load_params_from_checkpoint,
        )

        model = models.get_model(args.model_type, **hp)
        chunk = int(args.chunk_seconds * args.fs)
        params = model.init(jax.random.key(0), jnp.zeros((1, 1, chunk)))["params"]
        params = load_params_from_checkpoint(args.checkpoint, params)

    if args.mode == "seq_parallel":
        if args.model_type not in ("relu", "groupcomm_v2"):
            p.error("--mode seq_parallel supports model_type 'relu' or "
                    "'groupcomm_v2'")
        import os

        import numpy as np
        from scipy.io import wavfile

        from sudo_rm_rf_tpu.data.base import read_wav
        from sudo_rm_rf_tpu.inference import SequenceParallelSeparator

        sep = SequenceParallelSeparator(
            params,
            num_blocks=hp["num_blocks"],
            upsampling_depth=hp["upsampling_depth"],
            enc_kernel_size=hp["enc_kernel_size"],
            num_sources=args.num_sources,
            mixture_consistency=args.mixture_consistency,
            model_type=args.model_type,
            group_size=hp.get("group_size", args.group_size),
        )
        os.makedirs(args.out_dir, exist_ok=True)
        for path in args.input:
            sr, wav = read_wav(path)
            if sr != args.fs:
                raise ValueError(f"{path}: sample rate {sr} != {args.fs}")
            est = sep.separate(wav)
            stem = os.path.splitext(os.path.basename(path))[0]
            outs = []
            for s in range(est.shape[0]):
                out = est[s]
                peak = np.abs(out).max()
                if peak > 1.0:
                    out = out / peak
                op = os.path.join(args.out_dir, f"{stem}_s{s + 1}.wav")
                wavfile.write(op, args.fs, (out * 32767).astype(np.int16))
                outs.append(op)
            print(f"{path} -> {outs}")
        return 0

    for path in args.input:
        outs = separate_file(
            model, params, path, args.out_dir, fs=args.fs,
            chunk_seconds=args.chunk_seconds, num_sources=args.num_sources,
            batch_chunks=args.batch_chunks,
            mixture_consistency=args.mixture_consistency,
        )
        print(f"{path} -> {outs}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
