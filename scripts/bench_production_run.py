"""Production-scale soak: the full user experience at UBnormal scale.

Generates a synthetic dataset of the UBnormal order of magnitude (default
~250 train clips -> ~30k stride-8 train windows x5 transforms, ~60 stride-1
test clips -> ~290k window-scores) and runs the REAL CLIs exactly as a user
would: `cli.train --epochs N` (per-epoch validation, checkpointing, device
pipeline, bf16) then `cli.eval` (full scoring + aggregation + final AUC).
Reports per-stage wall-clock. The reference's equivalent is
train_COSKAD.py + eval_COSKAD.py on 2 GPUs (its UBnormal configs run
hundreds of epochs at batch 2048 on the same window counts).

    python scripts/bench_production_run.py [--epochs 10] [--train-clips 250]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import yaml

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def run_timed(label, cmd, env=None):
    print(f"[{label}] $ {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    p = subprocess.run(cmd, env=env, capture_output=True, text=True)
    dt = time.perf_counter() - t0
    tail = "\n".join(p.stdout.strip().splitlines()[-4:])
    print(tail, flush=True)
    if p.returncode != 0:
        print(p.stderr[-3000:], flush=True)
        raise SystemExit(f"{label} failed ({p.returncode})")
    print(f"[{label}] {dt:.1f}s", flush=True)
    return dt, p.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--train-clips", type=int, default=250)
    ap.add_argument("--test-clips", type=int, default=60)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--root", default="/tmp/coskad_prod")
    args = ap.parse_args()

    from fixtures import make_synthetic_dataset

    t0 = time.perf_counter()
    cfg_path = make_synthetic_dataset(
        args.root, n_train_clips=args.train_clips,
        n_test_clips=args.test_clips, n_frames=args.frames,
    )
    t_gen = time.perf_counter() - t0
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg.update(
        dataset_batch_size=2048,
        compute_dtype="bfloat16",
        device_pipeline=True,
        dir_name="prod",
    )
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    print(f"dataset: {args.train_clips} train / {args.test_clips} test clips "
          f"x {args.frames} frames [gen {t_gen:.1f}s]", flush=True)

    env = dict(os.environ, COSKAD_NATIVE="1")
    t_train, _ = run_timed("train", [
        sys.executable, "-u", "-m", "coskad_tpu.cli.train",
        "--config", cfg_path, "--epochs", str(args.epochs)], env)
    t_eval, out = run_timed("eval", [
        sys.executable, "-u", "-m", "coskad_tpu.cli.eval",
        "--config", cfg_path], env)
    auc = None
    for line in out.splitlines():
        if line.startswith("final AUC score:"):
            auc = float(line.split(":")[1])
    print(json.dumps({
        "epochs": args.epochs,
        "train_wall_s": round(t_train, 1),
        "train_s_per_epoch": round(t_train / args.epochs, 2),
        "eval_wall_s": round(t_eval, 1),
        "total_wall_s": round(t_train + t_eval, 1),
        "final_auc": auc,
    }), flush=True)


if __name__ == "__main__":
    main()
