"""The consolidated results report generator (scripts/results_report.py —
the script equivalent of the reference's `sudo_rm_rf/notebooks/`): renders
bench rounds + run artifacts into one markdown page."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    path = os.path.join(REPO, "scripts", "results_report.py")
    spec = importlib.util.spec_from_file_location("results_report", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["results_report"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_report_renders_synthetic_repo(tmp_path):
    rr = _load_module()
    # synthetic BENCH round (driver format: JSON line inside "tail")
    bench_line = json.dumps({
        "metric": "fwd_realtime_factor", "value": 123.4,
        "unit": "audio-sec/sec/chip", "vs_baseline": 4.2, "config": "bs8",
    })
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(
        {"n": 1, "tail": "warning line\n" + bench_line + "\n"}))
    # synthetic run artifact
    run = tmp_path / "docs" / "runs" / "exp_a"
    run.mkdir(parents=True)
    (run / "hparams.json").write_text(json.dumps({
        "model_type": "relu", "batch_size": 8, "learning_rate": 1e-3,
        "n_epochs": 6, "patience_epochs": 2, "divide_lr_by": 3.0,
    }))
    rows = [
        {"step": e, "tr_loss": -8.0 - e, "val_SISDRi": 9.0 + 0.5 * e}
        for e in range(6)
    ]
    (run / "metrics.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n")

    text = rr.render(str(tmp_path))
    assert "| r1 | fwd_realtime_factor | 123.4 |" in text
    assert "### exp_a" in text
    assert "best **val_SISDRi 11.50 dB** @ epoch 5" in text
    # stepped-schedule decay events: patience 2 over 6 epochs -> 3, 5
    assert "LR decay events" in text and "3, 5" in text
    assert "How to use" in text

    # main() writes the file
    out = tmp_path / "RESULTS.md"
    rr.main(["--repo", str(tmp_path), "--out", str(out)])
    assert out.read_text() == text


def test_report_handles_empty_repo(tmp_path):
    rr = _load_module()
    text = rr.render(str(tmp_path))
    assert "_no BENCH_r*.json found_" in text
    assert "_no run artifacts found_" in text


def test_sparkline_shape():
    rr = _load_module()
    s = rr.sparkline([1, 2, 3, 4], width=4)
    assert len(s) == 4 and s[0] == "▁" and s[-1] == "█"
    assert rr.sparkline([]) == ""
    # constant series must not divide by zero
    assert rr.sparkline([5, 5, 5]) == "▁▁▁"


def test_report_renders_actual_repo():
    """The real repo renders without raising and carries the round tables."""
    rr = _load_module()
    text = rr.render(REPO)
    assert "## Benchmark history" in text
    assert "## Training runs" in text
