"""Diagnose the spherical VAE's late-epoch AUC collapse + A/B a stabilizer.

    python scripts/vae_stability_sweep.py [--seeds 5] [--epochs 30]
        [--stabilizer kappa_floor=K vae_contraction=W eval_sample=0
         beta=B gamma=G] [--out sweep.json]

Both the reference and this framework reproduce the pathology (RESULTS.md
"VAE AUC instability", round 2/4): best-epoch AUC is fine, but the FINAL
epoch's AUC swings 0.2 <-> 0.97 across seeds. This script instruments what
actually moves per epoch — the PowerSpherical concentration kappa
(mean/min over the validation set), the KL and E[1/kappa] loss terms, the
epoch-to-epoch drift of mean_vector (the scoring anchor), and the
validation AUC — for N run-seeds on the synthetic fixture, optionally with
one opt-in stabilizer enabled, and prints a per-seed table + JSON.

Findings drive VERDICT r5 #3; results recorded in RESULTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import yaml  # noqa: E402

from coskad_tpu.utils.logging import MetricLogger  # noqa: E402


class _Capture(MetricLogger):
    """Silent logger that keeps every row (kl_loss / exp_dist_loss / ...)."""

    def __init__(self):
        super().__init__()
        self.every_n_steps = 1  # capture every step (fit gates on this)
        self.rows = []

    def log(self, metrics, step, force=False):
        self.rows.append(dict(metrics))


def make_vae_config(root, stabilizer):
    from fixtures import make_synthetic_dataset

    cfg_path = make_synthetic_dataset(root, seed=7, n_train_clips=1,
                                      n_test_clips=1)
    d = dict(yaml.safe_load(open(cfg_path)))
    d.update(use_vae=True, use_decoder=False, distribution="ps")
    for item in stabilizer:
        k, v = item.split("=")
        # (kl_warmup was considered per VERDICT r4 #3 and rejected: the
        # beta=0 probe shows the KL term is inert on this pathology.)
        key = {"kappa_floor": "kappa_floor", "beta": "beta",
               "gamma": "gamma", "vae_contraction": "vae_contraction",
               "eval_sample": "vae_sample"}[k]
        d[key] = bool(int(v)) if k == "eval_sample" else float(v)
    with open(cfg_path, "w") as f:
        yaml.safe_dump(d, f)
    return cfg_path


def run_seed(cfg_path, run_seed, epochs, score_mean=False):
    import dataclasses

    from coskad_tpu.cli.common import load_config, load_ground_truths, load_split
    from coskad_tpu.train.loop import Trainer

    cfg = load_config(cfg_path)
    cfg = dataclasses.replace(cfg, run=dataclasses.replace(cfg.run, seed=run_seed))
    train_ds = load_split(cfg, "train")
    val_ds = load_split(cfg, "test", stride=1, scaler=train_ds.scaler)
    gts = load_ground_truths(cfg.data.gt_dir)
    cap = _Capture()
    trainer = Trainer(cfg, train_ds, val_ds, gts, logger=cap)
    if score_mean:
        # Diagnostic: deterministic mean-path eval (sample=False) isolates
        # PowerSpherical sampling noise from structural instability.
        trainer.vae_sample = False
    state = trainer.init_state(seed=run_seed)
    state = trainer.initialize_center(state)

    # Validation batch for the distribution diagnostics (eval mode).
    from coskad_tpu.data.transforms import gather_batch

    nv = min(val_ds.num_windows, 512)
    val_batch = jax.numpy.asarray(val_ds.data[:nv, :cfg.model.num_coords])

    rec = {"auc": [], "kappa_mean": [], "kappa_min": [], "kl": [],
           "inv_kappa": [], "mv_drift_deg": [], "mv_norm": []}
    prev_mv = None
    for _ in range(epochs):
        cap.rows.clear()
        state, hist = trainer.fit(state=state, epochs=1)
        rec["auc"].append(float(hist["validation_auc"][-1])
                          if hist["validation_auc"] else float("nan"))
        kls = [r["kl_loss"] for r in cap.rows if "kl_loss" in r]
        invs = [r["exp_dist_loss"] for r in cap.rows if "exp_dist_loss" in r]
        rec["kl"].append(float(np.mean(kls)) if kls else float("nan"))
        rec["inv_kappa"].append(float(np.mean(invs)) if invs else float("nan"))
        _, z_var = trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            val_batch, train=False, method="encode_distribution")
        kappa = np.asarray(z_var).squeeze(-1)
        rec["kappa_mean"].append(float(kappa.mean()))
        rec["kappa_min"].append(float(kappa.min()))
        mv = np.asarray(state.mean_vector, np.float64)
        rec["mv_norm"].append(float(np.linalg.norm(mv)))
        if prev_mv is not None and np.linalg.norm(prev_mv) > 0:
            c = np.dot(mv, prev_mv) / (
                np.linalg.norm(mv) * np.linalg.norm(prev_mv) + 1e-12)
            rec["mv_drift_deg"].append(float(np.degrees(np.arccos(
                np.clip(c, -1, 1)))))
        else:
            rec["mv_drift_deg"].append(float("nan"))
        prev_mv = mv
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--stabilizer", nargs="*", default=[],
                    help="e.g. kappa_floor=32 vae_contraction=3 eval_sample=0")
    ap.add_argument("--out", default=None)
    ap.add_argument("--score-mean", action="store_true",
                    help="diagnostic: eval on the deterministic mean path")
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="coskad_vae_sweep_")
    cfg_path = make_vae_config(root, args.stabilizer)
    results = {}
    for seed in range(args.seeds):
        rec = run_seed(cfg_path, seed, args.epochs, args.score_mean)
        results[seed] = rec
        best = np.nanmax(rec["auc"])
        final = rec["auc"][-1]
        print(f"seed {seed}: best={best:.4f} final={final:.4f} "
              f"kappa(first->last)={rec['kappa_mean'][0]:.1f}->"
              f"{rec['kappa_mean'][-1]:.1f} "
              f"kl(first->last)={rec['kl'][0]:.4f}->{rec['kl'][-1]:.4f} "
              f"mv_drift(last5)="
              f"{np.nanmean(rec['mv_drift_deg'][-5:]):.2f}deg", flush=True)
    bests = [np.nanmax(r["auc"]) for r in results.values()]
    finals = [r["auc"][-1] for r in results.values()]
    summary = {
        "stabilizer": args.stabilizer or "none",
        "score_mean": args.score_mean,
        "epochs": args.epochs,
        "best_auc_mean": float(np.mean(bests)),
        "best_auc_min": float(np.min(bests)),
        "final_auc_mean": float(np.mean(finals)),
        "final_auc_std": float(np.std(finals)),
        "final_auc_min": float(np.min(finals)),
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "per_seed": results}, f, indent=1)


if __name__ == "__main__":
    main()
