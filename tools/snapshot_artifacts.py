"""Snapshot training-run evidence into the committed `artifacts/` tree.

`runs/` is gitignored (checkpoint churn + exports), which is how the
round-2 synth_r4 run artifacts were lost between builder sessions. This
tool copies the small-but-irreplaceable pieces of every run under
`runs/` into `artifacts/<run>/`, which IS tracked:

  - metrics.jsonl        (full training/validation curves)
  - config.yml           (exact config snapshot the run used)
  - done.json            (final fitness / epoch bookkeeping)
  - best_meta.json       (fitness/epoch of the served best checkpoint)
  - best/                (orbax best checkpoint, SLIMMED to weights only —
                          params / ema_params / batch_stats, no opt_state —
                          lets later rounds evaluate without retraining;
                          `load_run_variables` reads it directly)
  - pseudo_config.yml    (stage-3 snapshot written by tools/bootstrap.py)
  - export_summary.json  (count + point statistics of stage-2 .npz labels,
                          not the labels themselves)

Plus the repo-root RESULTS.json bench hook if present. Idempotent; run it
any time (e.g. mid-training) — newer files overwrite older snapshots.

  python tools/snapshot_artifacts.py [--runs runs] [--out artifacts]
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent

SMALL_FILES = ("metrics.jsonl", "config.yml", "done.json", "best_meta.json",
               "pseudo_config.yml", "hpatches.json")


def export_summary(exp_dir: Path) -> dict:
    files = sorted(exp_dir.glob("*.npz"))
    counts = []
    for f in files[:256]:
        try:
            counts.append(int(np.load(f)["pts"].shape[0]))
        except Exception:
            pass
    return {
        "n_files": len(files),
        "pts_per_image_mean": float(np.mean(counts)) if counts else 0.0,
        "pts_per_image_min": int(min(counts)) if counts else 0,
        "pts_per_image_max": int(max(counts)) if counts else 0,
        "sampled": len(counts),
    }


def snapshot_best(best: Path, dst_best: Path) -> None:
    """Weights-only mirror of an orbax `best/` checkpoint.

    The source best holds the full training payload (opt_state is ~3x the
    weights); the tracked snapshot keeps only what evaluation needs —
    params / ema_params / batch_stats / step — and REPLACES the destination
    (ocdbt blobs are content-hash-named, so copytree-over would accumulate
    orphans from superseded bests).
    """
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    payload = ckpt.restore(best)
    slim = {k: payload[k] for k in ("params", "ema_params", "batch_stats", "step")
            if payload.get(k) is not None}
    if dst_best.exists():
        shutil.rmtree(dst_best)
    ckpt.save(dst_best, slim)
    ckpt.wait_until_finished()


def snapshot(runs_dir: Path, out_dir: Path) -> list[str]:
    copied = []
    for run in sorted(p for p in runs_dir.iterdir() if p.is_dir()):
        dst = out_dir / run.name
        dst.mkdir(parents=True, exist_ok=True)
        for name in SMALL_FILES:
            src = run / name
            if src.exists():
                shutil.copy2(src, dst / name)
                copied.append(str(dst / name))
        best = run / "best"
        if best.is_dir() and (best / "_CHECKPOINT_METADATA").exists():
            snapshot_best(best, dst / "best")
            copied.append(str(dst / "best"))
        exp = run / "export"
        if exp.is_dir():
            summary = export_summary(exp)
            if summary["n_files"] > 0:  # never overwrite evidence with an
                (dst / "export_summary.json").write_text(  # empty stub
                    json.dumps(summary, indent=1))
                copied.append(str(dst / "export_summary.json"))
    return copied


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", default="runs")
    ap.add_argument("--out", default="artifacts")
    args = ap.parse_args(argv)
    runs_dir = ROOT / args.runs
    if not runs_dir.is_dir():
        print(f"[snapshot] no {runs_dir}, nothing to do")
        return
    copied = snapshot(runs_dir, ROOT / args.out)
    for c in copied:
        print(f"[snapshot] {c}")
    print(f"[snapshot] {len(copied)} artifacts -> {args.out}/")


if __name__ == "__main__":
    main()
