"""Full-scale dress rehearsal of the real-data runbook (VERDICT r4 #5).

Executes the DOCUMENTED command chain once, end to end, at UBnormal scale
on a synthetic tree (the stand-in for the downloaded dataset), timing each
stage — replacing the extrapolated "200-epoch run ~7 min" (RESULTS.md)
with measured numbers. Every stage is a command a user runs verbatim (the
YAML tweaks between steps are the runbook's documented "edit the config"
step, applied mechanically here):

    1. dataset stand-in      tests/fixtures.py::make_ubnormal_tree
    2. prepare_data          python scripts/prepare_data.py --root ...
    3. [edit config]         ae_epochs: 200, freeze_bn_after: 150
    4. supervised training   python -m coskad_tpu.cli.supervise --config ...
    5. offline eval          python -m coskad_tpu.cli.eval --config ...
    6. export artifact       python -m coskad_tpu.cli.export --ckpt ... --out ...
    7. artifact serving      python -m coskad_tpu.cli.server --artifact ...
                             + one scoring request (smoke)

    python scripts/dress_rehearsal.py [--root /tmp/coskad_rehearsal]
        [--epochs 200] [--train-clips 250]

Prints a per-stage wall-time table + one JSON line; paste into RESULTS.md.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import subprocess
import sys
import time
import urllib.request

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def run_timed(label, cmd, env=None, timeout=3600):
    print(f"[{label}] $ {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=timeout)
    dt = time.perf_counter() - t0
    print("\n".join(p.stdout.strip().splitlines()[-3:]), flush=True)
    if p.returncode != 0:
        print(p.stderr[-4000:], flush=True)
        raise SystemExit(f"{label} failed ({p.returncode})")
    print(f"[{label}] {dt:.1f}s", flush=True)
    return dt, p.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/coskad_rehearsal")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--train-clips", type=int, default=250)
    ap.add_argument("--test-clips", type=int, default=60)
    ap.add_argument("--val-clips", type=int, default=30)
    ap.add_argument("--frames", type=int, default=500)
    args = ap.parse_args()
    # EXTEND PYTHONPATH (the TPU plugin may be injected via it; replacing
    # it would silently knock the accelerator out of the children).
    env = dict(os.environ, COSKAD_NATIVE="1",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    stages = {}

    # 1. dataset stand-in (≈ the user's download/untar step)
    from fixtures import make_ubnormal_tree

    t0 = time.perf_counter()
    make_ubnormal_tree(args.root, n_train_clips=args.train_clips,
                       n_test_clips=args.test_clips,
                       n_val_clips=args.val_clips, n_frames=args.frames)
    stages["dataset_standin"] = time.perf_counter() - t0
    print(f"[dataset] {args.train_clips}/{args.test_clips}/{args.val_clips} "
          f"clips x {args.frames} frames [{stages['dataset_standin']:.1f}s]",
          flush=True)

    # 2. prepare_data: validate layout + emit run config
    cfg_out = os.path.join(args.root, "rehearsal.yaml")
    stages["prepare_data"], _ = run_timed("prepare_data", [
        sys.executable, os.path.join(REPO, "scripts", "prepare_data.py"),
        "--root", args.root, "--dataset", "UBnormal",
        "--template", os.path.join(REPO, "config", "UBnormal",
                                   "euclidean_encoder.yaml"),
        "--out-config", cfg_out], env)

    # 3. the runbook's "edit the YAML" step (epochs + proportional BN tail)
    d = yaml.safe_load(open(cfg_out))
    d["ae_epochs"] = args.epochs
    d["freeze_bn_after"] = int(args.epochs * 0.75)
    d["exp_dir"] = os.path.join(args.root, "checkpoints")
    yaml.safe_dump(d, open(cfg_out, "w"), sort_keys=False)

    # 4. supervised training (crash/stall-protected, the production launcher)
    stages["supervise_train"], _ = run_timed("supervise", [
        sys.executable, "-u", "-m", "coskad_tpu.cli.supervise",
        "--config", cfg_out], env, timeout=3000)

    # 5. offline eval
    stages["eval"], out = run_timed("eval", [
        sys.executable, "-u", "-m", "coskad_tpu.cli.eval",
        "--config", cfg_out], env)
    auc = next(float(ln.split(":")[1]) for ln in out.splitlines()
               if ln.startswith("final AUC score:"))

    # 6. export the deployment artifact
    ckpt_dir = os.path.join(d["exp_dir"], "UBnormal", d["dir_name"])
    ckpt = os.path.join(ckpt_dir, "best.ckpt")
    artifact = os.path.join(args.root, "model.czip")
    stages["export"], _ = run_timed("export", [
        sys.executable, "-u", "-m", "coskad_tpu.cli.export",
        "--ckpt", ckpt, "--out", artifact], env)

    # 7. artifact serving smoke: start server, score one batch, compare live
    from coskad_tpu.utils.net import free_port

    port = free_port("127.0.0.1")
    t0 = time.perf_counter()
    server = subprocess.Popen(
        [sys.executable, "-u", "-m", "coskad_tpu.cli.server",
         "--artifact", artifact, "--port", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        base = f"http://127.0.0.1:{port}"
        for _ in range(120):
            try:
                urllib.request.urlopen(base + "/healthz", timeout=5)
                break
            except Exception:
                time.sleep(1)
        rng = np.random.default_rng(0)
        meta = json.loads(__import__("zipfile").ZipFile(artifact).read("meta.json"))
        shape = (64, meta["in_channels"], meta.get("seg_len", 12),
                 meta.get("n_joints", 17))
        w = rng.normal(size=shape).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, w)
        req = urllib.request.Request(
            base + "/v1/score/windows", buf.getvalue(),
            {"Content-Type": "application/x-npy"})
        scores = json.loads(urllib.request.urlopen(req).read())["scores"]
        assert len(scores) == 64 and all(np.isfinite(scores))
        stages["artifact_serving"] = time.perf_counter() - t0
        print(f"[artifact] served {len(scores)} scores "
              f"[{stages['artifact_serving']:.1f}s]", flush=True)
    finally:
        server.terminate()
        server.wait(timeout=30)

    total = sum(stages.values())
    print("\n| stage | command | wall |\n|---|---|---|")
    rows = [
        ("dataset stand-in", "make_ubnormal_tree (download stand-in)"),
        ("prepare_data", "scripts/prepare_data.py --root ... --out-config"),
        ("supervise_train", f"cli.supervise --config ({args.epochs} epochs)"),
        ("eval", "cli.eval --config"),
        ("export", "cli.export --ckpt --out"),
        ("artifact_serving", "cli.server --artifact + 1 request"),
    ]
    name_map = {"dataset stand-in": "dataset_standin"}
    for label, cmd in rows:
        key = name_map.get(label, label)
        print(f"| {label} | `{cmd}` | {stages[key]:.1f} s |")
    print(f"| **total** | | **{total:.1f} s** |")
    print(json.dumps({"stages_s": {k: round(v, 1) for k, v in stages.items()},
                      "total_s": round(total, 1), "epochs": args.epochs,
                      "final_auc": auc}))


if __name__ == "__main__":
    main()
