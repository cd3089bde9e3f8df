"""Summarize a training run's metrics.jsonl into a markdown report.

Usage:
    python scripts/training_report.py --logs .artifacts/logs/gc_r16_synth \
        [--metric val_SISDRi] [--every 5]

Prints: per-epoch curve (subsampled), best epoch, milestones (epochs to
cross integer dB marks), and a JSON summary line for machine readers.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--logs", required=True)
    p.add_argument("--metric", default="val_SISDRi")
    p.add_argument("--train_metric", default="tr_loss")
    p.add_argument("--every", type=int, default=5,
                   help="print every Nth epoch in the curve table")
    args = p.parse_args(argv)

    path = os.path.join(args.logs, "metrics.jsonl")
    vals, tr = {}, {}
    with open(path) as fh:
        for line in fh:
            rec = json.loads(line)
            if args.metric in rec:
                vals[int(rec["step"])] = float(rec[args.metric])
            if args.train_metric in rec:
                tr[int(rec["step"])] = float(rec[args.train_metric])
    if not vals:
        raise SystemExit(f"no {args.metric} entries in {path}")

    epochs = sorted(vals)
    best_ep = max(epochs, key=lambda e: vals[e])

    print(f"## Training report: {os.path.basename(args.logs.rstrip('/'))}\n")
    print(f"| epoch | {args.train_metric} | {args.metric} |")
    print("|---|---|---|")
    shown = [e for e in epochs if (e + 1) % args.every == 0 or e in (0, epochs[-1], best_ep)]
    for e in sorted(set(shown)):
        t = f"{tr[e]:.3f}" if e in tr else "—"
        mark = " **(best)**" if e == best_ep else ""
        print(f"| {e + 1} | {t} | {vals[e]:.3f}{mark} |")

    lo = int(min(vals.values()))
    hi = int(max(vals.values()))
    milestones = {}
    for mark in range(lo + 1, hi + 1):
        for e in epochs:
            if vals[e] >= mark:
                milestones[mark] = e + 1
                break
    print("\nMilestones (first epoch reaching X dB): "
          + ", ".join(f"{m} dB @ ep{ep}" for m, ep in milestones.items()))
    summary = {
        "epochs": len(epochs),
        "best_epoch": best_ep + 1,
        f"best_{args.metric}": round(vals[best_ep], 3),
        f"final_{args.metric}": round(vals[epochs[-1]], 3),
    }
    print("\n" + json.dumps(summary))


if __name__ == "__main__":
    main()
