"""Quantify how much of the recipe can run with frozen BN (VERDICT r3 #6).

`freeze_bn_after: E` switches BatchNorm to running statistics from epoch E
on (RunConfig.freeze_bn_after, train/loop.py) — the measured +22% train
throughput mode. The open question from round 3: what fraction of the
DEFAULT recipe can legitimately run frozen without leaving the AUC parity
band (BASELINE.md: 0.5%)?

This sweep answers it empirically on the bf16 production settings: for
each seed and each freeze point E in a 20-epoch recipe (E = -1 never,
15/10/5/2 = last 25/50/75/90%), train the flagship euclidean_static config
end-to-end with per-epoch validation (the production CLI flow) and record
the final + best validation AUC and per-epoch wall time.

Run on the TPU:  python scripts/sweep_bn_freeze.py [--epochs 20] [--seeds 3]

Measured 2026-08-18 (one v5e chip, 20 epochs, 3 seeds, bf16, synthetic
4+3-clip dataset, ~1.5k train windows x5 transforms):

    freeze_bn_after   frozen fraction   mean final AUC   mean best AUC
    -1 (never)              0%              baseline         baseline
    15 (last 25%)          25%              see output
    10 (last 50%)          50%              see output
     5 (last 75%)          75%              see output
     2 (last 90%)          90%              see output

(The committed conclusions live in RESULTS.md "BN freeze sweep"; this
docstring intentionally does not duplicate the numbers.)
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--freezes", type=int, nargs="*", default=None)
    ap.add_argument("--variants", nargs="*", default=["euclidean_static"],
                    help="model variants to sweep (paired per-seed on/off "
                         "deltas are the meaningful stat for the seed-"
                         "unstable VAE)")
    args = ap.parse_args()

    from coskad_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from fixtures import make_synthetic_dataset

    from coskad_tpu.cli.common import load_config, load_ground_truths, load_split
    from coskad_tpu.train.loop import Trainer

    root = "/tmp/coskad_bn_sweep"
    cfg_path = make_synthetic_dataset(
        root, n_train_clips=4, n_test_clips=3, n_frames=800, seed=7
    )
    base = load_config(cfg_path)
    base = dataclasses.replace(
        base,
        run=dataclasses.replace(base.run, compute_dtype="bfloat16"),
        opt=dataclasses.replace(base.opt, epochs=args.epochs, validation=True),
    )

    train_ds = load_split(base, "train")
    val_ds = load_split(base, "test", stride=1, scaler=train_ds.scaler)
    gts = load_ground_truths(base.data.gt_dir)
    print(f"train windows {train_ds.num_windows} x{base.data.num_transform}, "
          f"val windows {val_ds.num_windows}, clips {len(gts)}")

    freezes = args.freezes
    # The summary's paired deltas need the never-frozen baseline; force it
    # in rather than KeyError-ing in the report AFTER hours of training.
    if freezes is not None and -1 not in freezes:
        freezes = [-1, *freezes]
    if freezes is None:
        e = args.epochs
        freezes = [-1, int(e * 0.75), int(e * 0.50), int(e * 0.25),
                   max(int(e * 0.10), 1)]

    results = {}  # (variant, freeze, seed) -> dict
    for variant in args.variants:
        for seed in range(args.seeds):
            for freeze in freezes:
                cfg = dataclasses.replace(
                    base,
                    model=dataclasses.replace(base.model, variant=variant),
                    run=dataclasses.replace(base.run, seed=seed,
                                            freeze_bn_after=freeze),
                )
                trainer = Trainer(cfg, train_ds, val_ds, gts)
                t0 = time.perf_counter()
                state, history = trainer.fit()
                wall = time.perf_counter() - t0
                aucs = history["validation_auc"]
                results[(variant, freeze, seed)] = {
                    "final": aucs[-1], "best": max(aucs), "wall": wall,
                }
                print(f"{variant} seed {seed} freeze {freeze:>3}: "
                      f"final {aucs[-1]:.4f} best {max(aucs):.4f}  "
                      f"wall {wall:.1f}s", flush=True)

    for variant in args.variants:
        print(f"\n[{variant}]")
        print("freeze  frac_frozen  mean_final  mean_best  d_final_vs_never"
              "  max_paired_|d_best|")
        base_finals = [results[(variant, -1, s)]["final"]
                       for s in range(args.seeds)]
        for freeze in freezes:
            finals = [results[(variant, freeze, s)]["final"]
                      for s in range(args.seeds)]
            bests = [results[(variant, freeze, s)]["best"]
                     for s in range(args.seeds)]
            # Paired per-seed best-AUC deltas vs never-frozen: the stat that
            # stays meaningful for the seed-unstable VAE.
            paired = [abs(results[(variant, freeze, s)]["best"]
                          - results[(variant, -1, s)]["best"])
                      for s in range(args.seeds)]
            frac = 0.0 if freeze < 0 else (args.epochs - freeze) / args.epochs
            print(f"{freeze:>6}  {frac:>10.0%}  {np.mean(finals):>10.4f}  "
                  f"{np.mean(bests):>9.4f}  "
                  f"{np.mean(finals) - np.mean(base_finals):>+16.4f}  "
                  f"{max(paired):>19.4f}")


if __name__ == "__main__":
    main()
