"""One-command synthetic bootstrap: the full MagicPoint->SuperPoint-style
training methodology the reference consumes but never ships
(`/root/reference/src/train.py:176-307` trains from pre-exported .npz
pseudo-labels; `/root/reference/src/export_homography.py:23-178` makes them).

Stages (each skipped automatically when its artifact already exists):
  1. joint synthetic-shapes pretraining      -> runs/<run>/best
  2. homographic-adaptation pseudo-labels    -> runs/<run>/export/*.npz
  3. retrain on pseudo-labels                -> runs/<run>_pseudo/best
  4. summarize both runs                     -> RESULTS.json (bench hook)

  python tools/bootstrap.py [--run synth_r2] [--fresh]

Stages run sequentially in subprocesses (single TPU chip: one process owns
the device at a time).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def sh(args: list[str]) -> None:
    print(f"[bootstrap] $ {' '.join(args)}", flush=True)
    subprocess.run(args, cwd=ROOT, check=True)


def stage1_done(run_dir: Path) -> bool:
    # `done.json` is written when the epoch loop completes (agent._train_loop);
    # fall back to best-checkpoint existence for runs from older builds
    return (run_dir / "done.json").exists() or (
        (run_dir / "best").is_dir() and (run_dir / "best_meta.json").exists()
    )


def stage2_done(run_dir: Path, n_expected: int) -> bool:
    exp = run_dir / "export"
    return exp.is_dir() and len(list(exp.glob("*.npz"))) >= n_expected


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="synth_r2")
    ap.add_argument("--runs_dir", default="runs")
    ap.add_argument("--config", default="configs/synthetic.yaml")
    ap.add_argument("--export_config", default="configs/synthetic_export.yaml")
    ap.add_argument("--pseudo_config", default="configs/synthetic_pseudo.yaml")
    ap.add_argument("--fresh", action="store_true",
                    help="rerun every stage even if artifacts exist")
    args = ap.parse_args(argv)

    run_dir = ROOT / args.runs_dir / args.run
    py = sys.executable

    # ---- stage 1: synthetic-shapes joint pretraining ----
    if args.fresh or not stage1_done(run_dir):
        cmd = [py, "-u", "-m", "yolopoint_tpu.training.cli",
               "--config", args.config, "--exper_name", args.run,
               "--output_dir", args.runs_dir]
        if run_dir.joinpath("ckpts").is_dir() and not args.fresh:
            cmd.append("--resume")
        sh(cmd)
    else:
        print(f"[bootstrap] stage 1 done ({run_dir}/best exists)", flush=True)

    # ---- stage 2: pseudo-label export (homographic adaptation) ----
    exp_cfg = json.loads(subprocess.run(
        [py, "-c",
         "import json,sys; from yolopoint_tpu.utils.config import load_config; "
         f"c=load_config({str(args.export_config)!r}); "
         "print(json.dumps(c.get('data',{}).get('length',{})))"],
        cwd=ROOT, check=True, capture_output=True, text=True).stdout)
    n_train = int(exp_cfg.get("train", 1024))
    if args.fresh or not stage2_done(run_dir, n_train):
        sh([py, "-u", "-m", "yolopoint_tpu.export.cli",
            "--config", args.export_config, "--action", "train",
            "--weights", str(run_dir / "best"),
            "--output", str(run_dir / "export")])
    else:
        print(f"[bootstrap] stage 2 done ({n_train} npz present)", flush=True)

    # ---- stage 3: retrain on pseudo-labels ----
    pseudo_run = f"{args.run}_pseudo"
    pseudo_dir = ROOT / args.runs_dir / pseudo_run
    if args.fresh or not stage1_done(pseudo_dir):
        # the pseudo config's generation.points_dir must point at THIS run's
        # stage-2 export (the yaml ships with a default run name) — rewrite
        # it into a snapshot config inside the run dir
        import yaml

        pseudo_cfg = yaml.safe_load(Path(args.pseudo_config).read_text())
        pseudo_cfg.setdefault("data", {}).setdefault("generation", {})[
            "points_dir"] = str(run_dir / "export")
        cfg_snapshot = run_dir / "pseudo_config.yml"
        cfg_snapshot.write_text(yaml.safe_dump(pseudo_cfg))
        sh([py, "-u", "-m", "yolopoint_tpu.training.cli",
            "--config", str(cfg_snapshot), "--exper_name", pseudo_run,
            "--output_dir", args.runs_dir,
            "--pretrained", str(run_dir / "best")])
    else:
        print(f"[bootstrap] stage 3 done ({pseudo_dir}/best exists)", flush=True)

    # ---- stage 3.5: HPatches-protocol eval of both trained models ----
    # (rep@top-300 3px, correctness@eps, matching score, match mAP — the
    # reference protocol, `/root/reference/src/evaluation_hpatches.py:395-758`)
    hp_data = ROOT / "datasets" / "hpatches_synth"
    if hp_data.is_dir():
        for d in (run_dir, pseudo_dir):
            out = d / "hpatches.json"
            if (args.fresh or not out.exists()) and (d / "best").is_dir():
                sh([py, "-u", "-m", "yolopoint_tpu.evaluation.hpatches_runner",
                    "--data", str(hp_data), "--weights", str(d / "best"),
                    "--json", str(out)])
    else:
        print(f"[bootstrap] no {hp_data}, skipping HPatches eval", flush=True)

    # ---- stage 4: summarize into RESULTS.json (bench hook) ----
    sh([py, "tools/summarize_run.py", "--runs", args.runs_dir])
    sh([py, "tools/snapshot_artifacts.py", "--runs", args.runs_dir])


if __name__ == "__main__":
    main()
