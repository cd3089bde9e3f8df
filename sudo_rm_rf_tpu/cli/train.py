"""`sudo-tpu-train`: the training CLI (replaces the reference's run_*.py zoo).

Examples
--------
Train Improved U16/512 on WHAM sep_clean (the README's best recipe,
`run_improved_sudormrf.py`):

    sudo-tpu-train --train WHAM --val WHAM --separation_task sep_clean \
        --model_type relu --out_channels 128 --in_channels 512 \
        --num_blocks 16 --upsampling_depth 5 --enc_num_basis 512 \
        -lr 0.001 --divide_lr_by 3 --patience 49 --zero_pad_audio \
        --wham_root /mnt/data/wham

FUSS universal separation (`run_fuss_separation.py`):

    sudo-tpu-train --train FUSS --val FUSS --model_type groupcomm_v2 \
        --max_num_sources 4 --mixture_consistency uniform -fs 16000
"""

from __future__ import annotations

import os
import sys


def main(argv=None):
    from sudo_rm_rf_tpu.cli.args import args_to_config, build_parser

    args = build_parser().parse_args(argv)
    config = args_to_config(args)

    # dataset root overrides flow through hparams into data.setup
    hparams = config.hparams()
    for name in ("wham", "whamr", "fuss", "libri2mix", "musdb"):
        root = getattr(args, f"{name}_root")
        if root:
            os.environ[f"SUDO_TPU_{name.upper()}_ROOT"] = root
            if name == "musdb":  # one flag covers both rate variants
                os.environ["SUDO_TPU_MUSDB8K_ROOT"] = root

    from sudo_rm_rf_tpu.parallel import maybe_distributed_initialize
    from sudo_rm_rf_tpu.train.experiment import run_experiment
    from sudo_rm_rf_tpu.utils import ExperimentLogger

    maybe_distributed_initialize()

    logger = ExperimentLogger(
        args.experiment_logs_path, config.experiment_name,
        tags=list(config.tags), use_comet=args.use_comet,
        comet_project=args.project_name,
    )
    run_experiment(config, logger=logger, resume=args.resume,
                   log_audio_every=args.log_audio_every)
    return 0


if __name__ == "__main__":
    sys.exit(main())
