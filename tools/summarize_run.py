"""Summarize completed training runs into RESULTS.json (the bench hook).

Reads each `runs/<name>/metrics.jsonl`, picks the best-fitness validation
record, and writes a compact summary to `RESULTS.json` at the repo root —
`bench.py` inlines it into the BENCH_r*.json line so the driver artifact
carries trained-model metrics (repeatability / homography correctness /
matching score / mAP), not just random-weight throughput.

  python tools/summarize_run.py [--runs runs] [--out RESULTS.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

KEEP = [
    "repeatability", "homography_correctness", "matching_score",
    "mAP50", "mAP", "precision", "recall", "fitness",
    "loss", "loss_det", "loss_desc", "loss_obj",
]


def summarize(run_dir: Path) -> dict | None:
    mf = run_dir / "metrics.jsonl"
    if not mf.exists():
        return None
    best, first, n_val = None, None, 0
    for line in mf.read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "validation/fitness" not in rec:
            continue
        n_val += 1
        if first is None:
            first = rec
        if best is None or rec["validation/fitness"] >= best["validation/fitness"]:
            best = rec
    if best is None:
        return None

    def pick(rec):
        return {k: round(float(rec[f"validation/{k}"]), 4)
                for k in KEEP if f"validation/{k}" in rec}

    out = {
        "best": pick(best),
        "best_step": int(best.get("step", -1)),
        "first_val": pick(first),
        "n_val_epochs": n_val,
    }
    # HPatches-protocol numbers, if the runner was pointed here
    # (python -m yolopoint_tpu.evaluation.hpatches_runner --json <run>/hpatches.json)
    hp = run_dir / "hpatches.json"
    if hp.exists():
        try:
            out["hpatches"] = json.loads(hp.read_text())
        except json.JSONDecodeError:
            pass
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", default="runs")
    ap.add_argument("--out", default="RESULTS.json")
    args = ap.parse_args(argv)

    root = Path(__file__).resolve().parent.parent
    out = {}
    runs_dir = root / args.runs
    if runs_dir.is_dir():
        for d in sorted(runs_dir.iterdir()):
            s = summarize(d)
            if s is not None:
                out[d.name] = s
    (root / args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
