#!/usr/bin/env python
"""Aggregate experiment logs into the README-style results tables.

Script equivalent of the reference's results notebooks
(`sudo_rm_rf/notebooks/*.ipynb`, which pull metrics from CometML): reads
one or more ExperimentLogger dirs (metrics.jsonl + hparams.json) and prints
a markdown table of the best validation metrics per experiment.

Usage: python scripts/results_table.py logs/exp_a logs/exp_b [--metric val_SISDRi]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load_experiment(log_dir: str):
    hparams = {}
    hp_path = os.path.join(log_dir, "hparams.json")
    if os.path.exists(hp_path):
        hparams = json.load(open(hp_path))
    rows = []
    metrics_path = os.path.join(log_dir, "metrics.jsonl")
    if os.path.exists(metrics_path):
        with open(metrics_path) as fh:
            rows = [json.loads(l) for l in fh if l.strip()]
    return hparams, rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("log_dirs", nargs="+")
    p.add_argument("--metric", default="val_SISDRi")
    p.add_argument("--higher_is_better", action="store_true", default=True)
    args = p.parse_args(argv)

    print(f"| experiment | model | params | best {args.metric} | epoch | last tr_loss |")
    print("|---|---|---|---|---|---|")
    for d in args.log_dirs:
        hparams, rows = load_experiment(d)
        vals = [(r.get(args.metric), r.get("step")) for r in rows
                if args.metric in r]
        tr = [r.get("tr_loss") for r in rows if "tr_loss" in r]
        if vals:
            best, step = max(vals) if args.higher_is_better else min(vals)
            best_s = f"{best:.2f}"
        else:
            best_s, step = "—", "—"
        tr_s = f"{tr[-1]:.3f}" if tr else "—"
        print(
            f"| {os.path.basename(d.rstrip('/'))} "
            f"| {hparams.get('model_type', '?')} "
            f"| U{hparams.get('num_blocks', '?')}/{hparams.get('enc_num_basis', '?')} "
            f"| {best_s} | {step} | {tr_s} |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
