#!/usr/bin/env python
"""Render the consolidated results report (docs/RESULTS.md).

The script equivalent of the reference's analysis + how-to-use notebooks
(`sudo_rm_rf/notebooks/sudo_rm_rf_how_to_use.ipynb` and the results
notebooks that pull CometML metrics): gathers every benchmark round
(BENCH_r*.json at the repo root), every training-run artifact
(docs/runs/*/metrics.jsonl + hparams.json), and renders one README-style
markdown page — bench history, per-run learning curves with sparklines,
LR-schedule events, and the quick-start recipes.

Usage:
    python scripts/results_report.py [--out docs/RESULTS.md] [--repo .]

`results_table.py` remains the small per-experiment table tool; this one
is the whole-repo report.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

SPARK = "▁▂▃▄▅▆▇█"


def sparkline(values, width=40):
    """Unicode sparkline of a series, resampled to ``width`` points."""
    vals = [v for v in values if v is not None]
    if not vals:
        return ""
    if len(vals) > width:
        step = len(vals) / width
        vals = [vals[int(i * step)] for i in range(width)]
    lo, hi = min(vals), max(vals)
    span = (hi - lo) or 1.0
    return "".join(SPARK[int((v - lo) / span * (len(SPARK) - 1))] for v in vals)


def load_bench_rounds(repo):
    """BENCH_r*.json -> [(round, bench-json dict)] sorted by round."""
    rounds = []
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)", os.path.basename(path))
        try:
            rec = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        # the driver wraps bench.py stdout: the JSON line lives in "tail"
        line = None
        for cand in (rec.get("tail") or "").splitlines():
            cand = cand.strip()
            if cand.startswith("{") and '"metric"' in cand:
                line = cand
        if line is None:
            continue
        try:
            rounds.append((int(m.group(1)) if m else 0, json.loads(line)))
        except json.JSONDecodeError:
            continue
    return sorted(rounds)


def load_run(run_dir):
    """docs/runs/<name>/ -> dict with hparams, per-epoch rows, and summary."""
    out = {"name": os.path.basename(run_dir.rstrip("/")), "hparams": {},
           "rows": [], "dir": run_dir}
    hp = os.path.join(run_dir, "hparams.json")
    if os.path.exists(hp):
        out["hparams"] = json.load(open(hp))
    mpath = os.path.join(run_dir, "metrics.jsonl")
    per_epoch = {}
    if os.path.exists(mpath):
        with open(mpath) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                ep = rec.get("step", rec.get("epoch"))
                if ep is None:
                    continue
                per_epoch.setdefault(ep, {}).update(
                    {k: v for k, v in rec.items() if isinstance(v, (int, float))}
                )
    out["rows"] = [dict(epoch=ep, **vals) for ep, vals in sorted(per_epoch.items())]
    spath = os.path.join(run_dir, "summary.json")
    if os.path.exists(spath):
        out["summary"] = json.load(open(spath))
    return out


def render_convergence_run(run):
    """Short-convergence artifact (scripts/attention_convergence.py):
    summary.json + loss_curve.jsonl, no per-epoch metrics."""
    s = run["summary"]
    lines = [f"### {run['name']} (convergence run)", ""]
    ga = s.get("grad_accum", 1) or 1
    ga_txt = f" x grad_accum {ga} (effective bs{s.get('bs', 0) * ga})" \
        if ga > 1 else ""
    lines.append(
        f"{s.get('model')} — {s.get('steps')} real Trainer steps, "
        f"bs{s.get('bs')}{ga_txt}, {s.get('compute_dtype')}: mean loss "
        f"{s.get('first_mean_loss')} → {s.get('last_mean_loss')} "
        f"({'improved' if s.get('improved') else 'did NOT improve'}, "
        f"{s.get('wall_s')} s wall)")
    lines.append("")
    return lines


def render_generic_summary(run):
    """Any other artifact that ships a summary.json (e.g. the
    torch_training_parity crosscheck): list its scalar fields instead of
    forcing it through a renderer whose fields it doesn't have."""
    s = run["summary"]
    lines = [f"### {run['name']}", ""]
    for k, v in s.items():
        if isinstance(v, (int, float, str, bool)):
            lines.append(f"- {k}: {v}")
    if os.path.exists(os.path.join(run.get("dir", ""), "README.md")):
        lines += ["", f"(details: `docs/runs/{run['name']}/README.md`)"]
    lines.append("")
    return lines


def render_longform_run(run):
    """Long-form artifact (scripts/longform_run.py): per-engine quality +
    throughput on one long recording."""
    s = run["summary"]
    mins = s.get("recording_minutes")
    lines = [f"### {run['name']} (long-form separation run)", "",
             f"{s.get('model')} — one {mins}-minute recording @ "
             f"{s.get('fs')} Hz, {s.get('compute_dtype')}, "
             f"{s.get('n_devices')} device(s):", "",
             "| engine | SI-SDRi | s/recording | audio-s/s |",
             "|---|---|---|---|"]
    for name, row in s.get("engines", {}).items():
        lines.append(
            f"| {name} | {row.get('si_sdri_db')} dB | "
            f"{row.get('seconds_per_recording')} | "
            f"{row.get('audio_sec_per_sec')} |")
    lines.append("")
    return lines


def render_corpus_scaling(run_dir, repo):
    """Corpus-scaling study: best val/test per scale from the suffixed
    metric files (1x point = the flagship run artifact)."""
    def best(path):
        b = (-1e9, None)
        with open(path) as fh:
            for line in fh:
                rec = json.loads(line)
                v = rec.get("val_SISDRi")
                if v is not None and v > b[0]:
                    b = (v, rec.get("test_SISDRi"))
        return b

    points = []
    for tag, label in (("05x", "0.5x"), ("2x", "2x")):
        mpath = os.path.join(run_dir, f"metrics_{tag}.jsonl")
        if os.path.exists(mpath):
            points.append((label, *best(mpath)))
    flag = os.path.join(repo, "docs", "runs", "improved_u16_synth_full",
                        "metrics.jsonl")
    if os.path.exists(flag):
        points.insert(1 if points and points[0][0] == "0.5x" else 0,
                      ("1x", *best(flag)))
    if not points:
        return []
    lines = ["### corpus_scaling (data-bound plateau study)", "",
             "Flagship recipe, fixed step budget, train source-pool size "
             "swept (see `docs/runs/corpus_scaling/README.md`):", "",
             "| corpus scale | best val SI-SDRi | test @ best |",
             "|---|---|---|"]
    for label, v, t in points:
        lines.append(f"| {label} | {v:.2f} dB | "
                     f"{t:.2f} dB |" if t is not None else
                     f"| {label} | {v:.2f} dB | — |")
    lines.append("")
    return lines


def lr_decay_epochs(hparams, n_epochs):
    """Epochs (1-based) where the stepped schedule lr/divide^(ep//patience)
    steps down (`run_improved_sudormrf.py:179-186` semantics)."""
    pat = int(hparams.get("patience_epochs") or hparams.get("patience") or 0)
    div = float(hparams.get("divide_lr_by") or 1.0)
    if pat <= 0 or div == 1.0:
        return []
    return [e + 1 for e in range(1, n_epochs) if e % pat == 0]


def val_metric_key(rows):
    for key in ("val_SISDRi", "val_SISDR"):
        if rows and key in rows[-1]:
            return key
    for key in rows[-1] if rows else ():
        if key.startswith("val"):
            return key
    return None


def render_run(run):
    rows, hp = run["rows"], run["hparams"]
    lines = [f"### {run['name']}", ""]
    if hp:
        cfg = ", ".join(
            f"{k}={hp[k]}" for k in (
                "model_type", "batch_size", "learning_rate", "n_epochs",
                "patience_epochs", "divide_lr_by", "compute_dtype",
            ) if k in hp and hp[k] is not None
        )
        if cfg:
            lines.append(f"Config: `{cfg}`  ")
    if not rows:
        lines.append("_no metrics recorded_\n")
        return lines
    key = val_metric_key(rows)
    vals = [r.get(key) for r in rows]
    known = [(r["epoch"], r[key]) for r in rows if r.get(key) is not None]
    if key and known:
        best_ep, best = max(known, key=lambda t: t[1])
        lines.append(
            f"{len(rows)} epochs; best **{key} {best:.2f} dB** @ epoch "
            f"{best_ep}; final {known[-1][1]:.2f} dB  "
        )
        lines.append(f"`{sparkline(vals)}` ({key} per epoch)  ")
        decays = [e for e in lr_decay_epochs(hp, len(rows)) if e <= len(rows)]
        if decays:
            div = hp.get("divide_lr_by")
            lines.append(
                f"LR decay events (÷{div}): epochs {', '.join(map(str, decays))}  "
            )
        # milestone table: first epoch reaching each integer dB
        marks = []
        seen = set()
        for ep, v in known:
            m = int(v)
            if m not in seen and v >= m >= 1:
                seen.add(m)
                marks.append((m, ep))
        tail = ", ".join(f"{m} dB @ ep{ep}" for m, ep in marks[-4:])
        if tail:
            lines.append(f"Milestones: {tail}  ")
    # compact curve table: first + every ~20% + last
    idx = sorted({0, len(rows) - 1}
                 | {int(len(rows) * f) for f in (0.2, 0.4, 0.6, 0.8)})
    cols = [k for k in ("tr_loss", key) if k]
    lines += ["", "| epoch | " + " | ".join(cols) + " |",
              "|---|" + "---|" * len(cols)]
    for i in idx:
        r = rows[i]
        cells = [str(r["epoch"])]
        for k in cols:
            v = r.get(k)
            cells.append(f"{v:.3f}" if v is not None else "—")
        lines.append("| " + " | ".join(cells) + " |")
    lines.append("")
    return lines


def render(repo):
    lines = [
        "# Results",
        "",
        "_Generated by `scripts/results_report.py` — the consolidated",
        "results/analysis page (script equivalent of the reference's",
        "`sudo_rm_rf/notebooks/`). Re-run after training or benchmarking:_",
        "`python scripts/results_report.py`",
        "",
        "## Benchmark history (real TPU chip, one per round)",
        "",
    ]
    rounds = load_bench_rounds(repo)
    if rounds:
        lines += [
            "| round | metric | value | unit | vs reference GPU | config |",
            "|---|---|---|---|---|---|",
        ]
        for rnd, rec in rounds:
            lines.append(
                f"| r{rnd} | {rec.get('metric', '?')} | "
                f"{rec.get('value', '?')} | {rec.get('unit', '')} | "
                f"{rec.get('vs_baseline', '?')}x | {rec.get('config', '')} |"
            )
        last = rounds[-1][1]
        extras = {
            k: v for k, v in last.items()
            if k not in ("metric", "value", "unit", "vs_baseline", "config")
        }
        if extras:
            lines += ["", "Latest round detail: "
                      + ", ".join(f"{k}={v}" for k, v in extras.items())]
    else:
        lines.append("_no BENCH_r*.json found_")
    lines += ["", "## Training runs (docs/runs/*)", ""]
    run_dirs = sorted(
        glob.glob(os.path.join(repo, "docs", "runs", "*", ""))
        + glob.glob(os.path.join(repo, "docs", "runs", "*", "*", ""))
    )
    found = False
    for rd in run_dirs:
        if os.path.basename(rd.rstrip("/")) == "corpus_scaling":
            scaled = render_corpus_scaling(rd, repo)
            if scaled:
                found = True
                lines += scaled
            continue
        run = load_run(rd)
        if os.path.dirname(rd.rstrip("/")) != os.path.join(
                repo, "docs", "runs"):
            run["name"] = "/".join(rd.rstrip("/").split(os.sep)[-2:])
        if run["rows"] or run["hparams"]:
            found = True
            lines += render_run(run)
        elif run.get("summary", {}).get("engines"):
            found = True
            lines += render_longform_run(run)
        elif run.get("summary") and {"model", "steps"} <= set(run["summary"]):
            found = True
            lines += render_convergence_run(run)
        elif run.get("summary"):
            found = True
            lines += render_generic_summary(run)
    if not found:
        lines.append("_no run artifacts found_")
    lines += [
        "",
        "## How to use (quick recipes)",
        "",
        "```bash",
        "# train the headline config on WHAM sep_clean",
        "sudo-tpu-train --train WHAM --val WHAM --separation_task sep_clean \\",
        "    --model_type relu --out_channels 256 --num_blocks 16 \\",
        "    --block_impl xla --compute_dtype bfloat16 -bs 8 --device_data",
        "",
        "# separate a mixture with a converted reference checkpoint",
        "sudo-tpu-separate --checkpoint improved_sudormrf.pt mixture.wav",
        "",
        "# benchmark + evaluate",
        "python bench.py",
        "sudo-tpu-bench --model_type relu --batch_size 8",
        "```",
        "",
        "See `README.md` for the full model zoo and `BENCHMARKS.md` for the",
        "measured per-config performance tables.",
        "",
    ]
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--repo", default=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    p.add_argument("--out", default=None,
                   help="output path (default <repo>/docs/RESULTS.md)")
    args = p.parse_args(argv)
    text = render(args.repo)
    out = args.out or os.path.join(args.repo, "docs", "RESULTS.md")
    with open(out, "w") as fh:
        fh.write(text)
    print(f"wrote {out} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()
