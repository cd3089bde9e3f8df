"""`sudo-tpu-evaluate`: evaluate a checkpoint on a dataset split.

TPU equivalent of `sudo_rm_rf/utils/simple_whamr_evaluation.py:55-178`:
loads a pretrained model (torch .pt via the converter, or a framework
msgpack checkpoint), standardizes each mixture, separates, applies optional
mixture consistency, and reports mean/median SI-SDR and SI-SDRi per sample
(pickled + printed), using the stabilized metric for robustness.
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate separation quality")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model_type", default="relu")
    p.add_argument("--dataset", default="WHAMR",
                   choices=["WHAM", "WHAMR", "LIBRI2MIX", "FUSS",
                            "AUGMENTED"])
    p.add_argument("--dataset_paths", nargs="+", default=[],
                   help="hierarchical corpus roots (AUGMENTED only)")
    p.add_argument("--split", default="test")
    p.add_argument("--separation_task", default="sep_clean")
    p.add_argument("-fs", type=int, default=8000)
    p.add_argument("--timelength", type=float, default=4.0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--n_samples", type=int, default=0)
    p.add_argument("--min_or_max", default="min")
    p.add_argument("--mixture_consistency", default=None,
                   choices=[None, "uniform", "magsq"])
    p.add_argument("--full_length_mode", default="overlap_add",
                   choices=["overlap_add", "seq_parallel"],
                   help="whole-utterance engine: COLA chunking (any model) "
                        "or exact time-sharded single pass (relu / "
                        "groupcomm_v2)")
    p.add_argument("--full_length", action="store_true",
                   help="evaluate whole utterances through the overlap-add "
                        "runtime (one compiled chunk shape) instead of "
                        "fixed-length crops — the reference's timelength=-1 "
                        "mode without per-length recompiles")
    p.add_argument("--bss_filter_taps", type=int, default=512,
                   help="BSS-eval distortion-filter length: 512 = the "
                        "museval/mir_eval convention (literature-comparable "
                        "absolute SDR/SIR/SAR); 1 = scalar-gain closed form "
                        "(cheapest; ranking matches)")
    p.add_argument("--out_pickle", default=None)
    p.add_argument("--reference_root", default=None)
    p.add_argument("--root_dirpath", default=None)
    # model hyperparams
    p.add_argument("--out_channels", type=int, default=256)
    p.add_argument("--in_channels", type=int, default=512)
    p.add_argument("--num_blocks", type=int, default=16)
    p.add_argument("--upsampling_depth", type=int, default=5)
    p.add_argument("--enc_kernel_size", type=int, default=21)
    p.add_argument("--enc_num_basis", type=int, default=512)
    p.add_argument("--num_sources", type=int, default=2)
    p.add_argument("--group_size", type=int, default=16)
    p.add_argument("--n_heads", type=int, default=4)
    p.add_argument("--att_dims", type=int, default=256)
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sudo_rm_rf_tpu import losses, models
    from sudo_rm_rf_tpu.data.setup import create_loader_for_simple_dataset

    hp = dict(
        out_channels=args.out_channels, in_channels=args.in_channels,
        num_blocks=args.num_blocks, upsampling_depth=args.upsampling_depth,
        enc_kernel_size=args.enc_kernel_size, enc_num_basis=args.enc_num_basis,
        num_sources=args.num_sources,
    )
    if args.model_type == "groupcomm_v2":
        hp["group_size"] = args.group_size
    if args.model_type.startswith("attention"):
        hp["n_heads"] = args.n_heads
        hp["att_dims"] = args.att_dims

    t = int(args.fs * args.timelength)
    if args.checkpoint.endswith(".pt"):
        from sudo_rm_rf_tpu.convert import load_pt_file, state_dict_to_params

        sd, attrs = load_pt_file(args.checkpoint, reference_root=args.reference_root)
        hp.update(attrs)
        model = models.get_model(args.model_type, **hp)
        shapes = jax.eval_shape(model.init, jax.random.key(0), jnp.zeros((1, 1, t)))
        params = state_dict_to_params(sd, shapes["params"],
                                      ignore_unused=("ln_mask_in",))
    else:
        from sudo_rm_rf_tpu.convert.flax_checkpoint import (
            load_params_from_checkpoint,
        )

        model = models.get_model(args.model_type, **hp)
        params = model.init(jax.random.key(0), jnp.zeros((1, 1, t)))["params"]
        params = load_params_from_checkpoint(args.checkpoint, params)

    if args.dataset == "AUGMENTED":
        # evaluate on a hierarchical online-mixing corpus (fixed seed:
        # the mixtures are deterministic, so results are comparable
        # across checkpoints)
        from sudo_rm_rf_tpu.data.setup import create_augmented_loader

        if not args.dataset_paths:
            raise SystemExit("--dataset_paths is required with AUGMENTED")
        dataset = create_augmented_loader(
            {
                f"{args.split}_dataset_paths": list(args.dataset_paths),
                f"n_{args.split}": args.n_samples or 1000,
                "fs": args.fs,
                "audio_timelength": args.timelength,
                "n_sources": args.num_sources,
            },
            split=args.split,
        )
    else:
        dataset = create_loader_for_simple_dataset(
            dataset_name=args.dataset, separation_task=args.separation_task,
            data_split=args.split, sample_rate=args.fs,
            min_or_max=args.min_or_max, zero_pad=True,
            timelength=-1.0 if args.full_length else args.timelength,
            n_samples=args.n_samples, root_dirpath=args.root_dirpath,
        )
    loader = dataset.get_generator(
        batch_size=1 if args.full_length else args.batch_size,
        shuffle=False, num_workers=2,
    )

    sisdr = losses.PermInvariantSISDR(
        n_sources=args.num_sources, zero_mean=True, backward_loss=False,
        return_individual_results=True,
    )
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
        # mean/std are (B, 1, 1): broadcast over (B, S, T)
        return est * std + mean

    ola = None
    if args.full_length:
        if args.full_length_mode == "seq_parallel":
            from sudo_rm_rf_tpu.inference import SequenceParallelSeparator

            seq_types = ("relu", "groupcomm_v2", "causal", "attention",
                         "attention_v2")
            if args.model_type not in seq_types:
                p.error("--full_length_mode seq_parallel supports "
                        f"model_type in {seq_types} (attention_v3 falls "
                        "back to overlap_add)")
            ola = SequenceParallelSeparator(
                params,
                num_blocks=hp["num_blocks"],
                upsampling_depth=hp["upsampling_depth"],
                enc_kernel_size=hp["enc_kernel_size"],
                num_sources=hp["num_sources"],
                mixture_consistency=args.mixture_consistency,
                model_type=args.model_type,
                group_size=hp.get("group_size", args.group_size),
                n_heads=args.n_heads,
            )
        else:
            from sudo_rm_rf_tpu.inference import OverlapAddSeparator

            ola = OverlapAddSeparator(
                model, params, chunk_samples=int(args.timelength * args.fs),
                num_sources=args.num_sources,
                mixture_consistency=args.mixture_consistency,
            )

    results = {"si_sdr": [], "si_sdri": [], "sdr": [], "sdri": [], "sir": [],
               "sar": []}
    for batch in loader:
        if isinstance(batch, (tuple, list)):
            mixture, targets = np.asarray(batch[0]), batch[-1]
            if mixture.ndim == 2:
                mixture = mixture[:, None, :]
            elif mixture.shape[1] > 1:
                if args.dataset != "WHAMR":
                    # a multi-channel axis here would be a genuine (B, C, T)
                    # mixture, not a source stack — refuse rather than
                    # silently summing channels into mono
                    raise SystemExit(
                        f"{args.dataset} yielded a (B, {mixture.shape[1]}, T) "
                        "first tensor; only WHAMR input-source stacks are "
                        "summed to mono here"
                    )
                # WHAMR (B, S, T) input-source stack (reverberant s1/s2 +
                # noise): the eval input is the sum of the stack
                # (`run_improved_sudormrf_reverb.py:205-208`; the forward
                # standardizes it)
                mixture = mixture.sum(axis=1, keepdims=True)
        else:
            targets = batch
            mixture = np.asarray(batch).sum(1, keepdims=True)
        targets = np.asarray(targets)[:, : args.num_sources]
        if ola is not None:
            est = jnp.asarray(ola.separate(np.asarray(mixture)[0, 0])[None])
        else:
            est = forward(params, jnp.asarray(mixture))
        results["si_sdr"] += np.asarray(sisdr(est, jnp.asarray(targets))).tolist()
        results["si_sdri"] += np.asarray(
            sisdri(est, jnp.asarray(targets), initial_mixtures=jnp.asarray(mixture))
        ).tolist()
        # BSS-eval SDR/SIR/SAR (+SDR improvement), the asteroid get_metrics
        # row set (`simple_whamr_evaluation.py:153-171`); per-sample means
        # over sources, like asteroid's average_over setting
        bss = losses.bss_eval_improvement(
            est, jnp.asarray(targets), jnp.asarray(mixture),
            filter_taps=args.bss_filter_taps,
        )
        for ours, theirs in (("sdr", "sdr"), ("sdri", "sdr_i"),
                             ("sir", "sir"), ("sar", "sar")):
            results[ours] += np.asarray(bss[theirs]).mean(-1).tolist()

    summary = {
        k + "_mean": float(np.mean(v)) for k, v in results.items() if v
    }
    summary.update(
        {k + "_median": float(np.median(v)) for k, v in results.items() if v}
    )
    summary["n_examples"] = len(results["si_sdr"])
    if results["sdr"]:
        summary["bss_eval_filter_taps"] = args.bss_filter_taps
        if args.bss_filter_taps < 512:
            # with short distortion filters absolute sdr/sir/sar are NOT
            # directly comparable to published museval tables (SI-SDR rows
            # are standard and comparable). Ranking/permutation match.
            summary["bss_eval_note"] = (
                f"sdr/sir/sar use length-{args.bss_filter_taps} distortion "
                "filters; museval uses 512 - do not compare absolutes "
                "against museval-based tables"
            )
    print(json.dumps(summary))
    if args.out_pickle:
        with open(args.out_pickle, "wb") as fh:
            pickle.dump(results, fh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
