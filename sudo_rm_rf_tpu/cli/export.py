"""`sudo-tpu-export`: export a trained checkpoint to a torch state_dict .pt.

The inverse of the README ingestion recipe: models trained by this
framework become consumable by the reference's torch ecosystem
(`README.md:75-115` loads .pt checkpoints). With ``--reference_root`` the
key mapping is taken exactly from the destination torch architecture and
the export is verified by a strict ``load_state_dict``:

    sudo-tpu-export --checkpoint ckpt/best_val_SISDRi_... \
        --model_type groupcomm_v2 --out gc_model.pt \
        --reference_root /path/to/sudo_rm_rf
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="Export a checkpoint to torch .pt")
    p.add_argument("--checkpoint", required=True,
                   help="msgpack checkpoint (bare params or TrainState)")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--model_type", default="relu")
    p.add_argument("--reference_root", default=None,
                   help="reference repo path: exact key mapping + strict "
                        "load verification against the torch model")
    p.add_argument("--out_channels", type=int, default=128)
    p.add_argument("--in_channels", type=int, default=512)
    p.add_argument("--num_blocks", type=int, default=16)
    p.add_argument("--upsampling_depth", type=int, default=5)
    p.add_argument("--enc_kernel_size", type=int, default=21)
    p.add_argument("--enc_num_basis", type=int, default=512)
    p.add_argument("--num_sources", type=int, default=2)
    p.add_argument("--group_size", type=int, default=16)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch

    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.convert import params_to_state_dict
    from sudo_rm_rf_tpu.convert.flax_checkpoint import (
        load_params_from_checkpoint,
    )

    hp = dict(
        out_channels=args.out_channels, in_channels=args.in_channels,
        num_blocks=args.num_blocks, upsampling_depth=args.upsampling_depth,
        enc_kernel_size=args.enc_kernel_size,
        enc_num_basis=args.enc_num_basis, num_sources=args.num_sources,
    )
    if args.model_type == "groupcomm_v2":
        hp["group_size"] = args.group_size
    model = models.get_model(args.model_type, **hp)
    template = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 1, 32000))
    )["params"]
    template = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), template
    )
    params = load_params_from_checkpoint(args.checkpoint, template)

    torch_model = None
    target_keys = None
    if args.reference_root:
        import glob as _glob

        sys.modules.setdefault("glob2", _glob)
        if args.reference_root not in sys.path:
            sys.path.insert(0, args.reference_root)
        torch_model = _build_torch_model(args.model_type, hp)
        target_keys = torch_model.state_dict().keys()

    sd = params_to_state_dict(params, target_keys=target_keys, to_torch=True)
    if torch_model is not None:
        torch_model.load_state_dict(sd, strict=True)  # verification
        print(f"strict load into torch {type(torch_model).__name__}: ok")
    torch.save(sd, args.out)
    print(f"{args.checkpoint} -> {args.out} ({len(sd)} tensors)")
    return 0


def _build_torch_model(model_type: str, hp: dict):
    """Construct the matching reference torch model for key mapping."""
    if model_type == "groupcomm_v2":
        from sudo_rm_rf.dnn.models import groupcomm_sudormrf_v2 as ref

        return ref.GroupCommSudoRmRf(in_audio_channels=1, **hp)
    if model_type == "softmax":
        from sudo_rm_rf.dnn.models import sudormrf as ref

        return ref.SuDORMRF(**hp)
    from sudo_rm_rf.dnn.models import improved_sudormrf as ref

    return ref.SuDORMRF(**hp)


if __name__ == "__main__":
    sys.exit(main())
