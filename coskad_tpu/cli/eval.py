"""Offline evaluation entry point (eval_COSKAD.py equivalent).

    python -m coskad_tpu.cli.eval --config <yaml> [--ckpt path]

Loads the checkpoint, embeds the test split (stride 1), computes per-window
anomaly scores in the variant's geometry, aggregates to frames (actor-max,
HR masks, shift + Gaussian smoothing), prints per-clip, per-transform and
final mean-over-transforms AUC.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="COSKAD-TPU evaluation")
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--ckpt", default=None,
                        help="checkpoint path (default: <exp_dir>/best.ckpt)")
    parser.add_argument("--rec-weight", type=float, default=0.0,
                        help="autoencoder scoring mode (reference rule: 0 -> "
                             "latent distance, >100 -> reconstruction, else "
                             "rec/weight + latent)")
    parser.add_argument("--save-scores", default=None, metavar="DIR",
                        help="dump per-clip per-person score npys in the "
                             "analysis-notebook layout (error_per_person_"
                             "scene_S_scenario_C.npy + gt_masks/)")
    parser.add_argument("--save-roc", default=None, metavar="DIR",
                        help="write per-transform + final ROC PNGs and "
                             "print best thresholds (reference "
                             "eval_COSKAD.py:237-241 writes "
                             "<ckpt>_tN_roc_hyp.png for non-Avenue runs)")
    from .common import (add_distributed_flag, distributed_barrier,
                         init_distributed, is_primary)

    add_distributed_flag(parser)
    args = parser.parse_args(argv)

    # Multi-host wiring first (reference analogue: trainer.predict under
    # strategy='ddp', eval_COSKAD.py:115): one eval command per host, scores
    # allgathered, every rank computes the identical final AUC.
    init_distributed(args.distributed)

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from ..score.aggregate import ScoringConfig, evaluate_windows
    from ..score.masks import AVENUE_MASKED_CLIPS, hr_ubnormal
    from ..train import checkpoint
    from ..train.loop import Trainer
    from .common import load_config, load_ground_truths, load_split

    import time as _time

    _t0 = _time.perf_counter()
    _phase = {"start": _t0}

    def _mark(name):
        _phase[name] = _time.perf_counter()

    cfg = load_config(args.config)
    # precedence: --ckpt flag > the reference's load_ckpt config key >
    # best.ckpt > last.ckpt (reference eval_COSKAD.py:112 joins
    # exp_dir/dataset/dir_name/load_ckpt)
    default = os.path.join(cfg.ckpt_dir, cfg.eval.load_ckpt or "best.ckpt")
    ckpt_path = args.ckpt or default
    if not os.path.exists(ckpt_path):
        alt = os.path.join(cfg.ckpt_dir, "last.ckpt")
        if os.path.exists(alt):
            ckpt_path = alt
        else:
            raise FileNotFoundError(f"no checkpoint at {ckpt_path}")

    # Read the checkpoint once; the scaler is needed before the Trainer
    # exists (the test split must be normalized with the training scaler).
    payload = checkpoint.read_payload(ckpt_path)
    scaler = checkpoint._scaler_of(payload)
    test_ds = load_split(cfg, "test", stride=1, scaler=scaler)
    gts = load_ground_truths(cfg.data.gt_dir)
    print(f"[coskad] test windows: {test_ds.num_windows}, clips: {len(gts)}")
    _mark("ingest")  # JSON parse + window/normalize (host)

    trainer = Trainer(cfg, test_ds)  # reuses embed/score jit machinery
    state = trainer.init_state()
    state, _, extra = checkpoint.restore(ckpt_path, state, payload=payload)
    state = trainer.attach_state(state)
    print(f"[coskad] restored {ckpt_path} {extra}")
    if (cfg.model.variant == "vae"
            and float(np.linalg.norm(np.asarray(state.mean_vector))) == 0.0):
        # Converted 'ps' VAE checkpoints cannot carry the scoring anchor
        # (the reference never registers mean_vector for 'ps',
        # models/sts/vae.py:57-58 — its own offline eval would
        # AttributeError). Recompute it the way the reference's in-session
        # hooks do: the empirical mean of the eval split's latents
        # (spherical_vae.py:110-116). Without this, every window would
        # score the constant 1 - cos(z, 0) = 1.0.
        z = trainer.embed_all(state, test_ds, trainer.train_data)
        mv = jnp.asarray(z.mean(axis=0), jnp.float32)
        from ..parallel import mesh as pmesh

        state = state.replace(
            mean_vector=pmesh.device_put_replicated(mv, trainer.mesh))
        print("[coskad] mean_vector was unset (ps-VAE checkpoint); "
              "recomputed from the eval split's latents")
    _mark("upload")  # device upload + state restore (+model init compile)

    # One scanned device dispatch for the whole embed+score pass.
    scores, rec = trainer.score_all(state, test_ds, trainer.train_data)
    _mark("scoring")  # compile + scanned scoring + host fetch
    if cfg.model.variant == "autoencoder" and args.rec_weight != 0:
        from ..score.window_losses import mode_from_rec_weight

        mode = mode_from_rec_weight(args.rec_weight)
        print(f"[coskad] autoencoder scoring mode: {mode}")
        if mode == "rec":
            scores = rec
        else:  # rec+hyp
            scores = rec / args.rec_weight + scores
    k = max(cfg.data.num_transform, 1)

    hr_masks = {}
    if cfg.eval.use_hr and cfg.eval.hr_masks_glob:
        hr_masks = hr_ubnormal(cfg.eval.hr_masks_glob)
    avenue = AVENUE_MASKED_CLIPS if cfg.data.dataset_choice == "HR-Avenue" else {}

    # Shared-meta form (metadata identical across transforms, scores
    # transform-major) — one sort/gather of the NW base rows. File outputs
    # (score npys, ROC PNGs) are rank-0-only in multi-host runs; the scores
    # fed in are identical on every rank (allgathered in score_all).
    primary = is_primary()
    result = evaluate_windows(
        scores, None, test_ds.meta, test_ds.frame_ids, gts,
        ScoringConfig(num_transform=k, pad_size=cfg.eval.pad_size),
        hr_clip_masks=hr_masks, avenue_clip_masks=avenue,
        save_scores_dir=args.save_scores if primary else None,
    )
    # Per-clip AUC inside every transform iteration with a running average,
    # structurally matching the reference's printout (eval_COSKAD.py:222-240).
    clip_keys = sorted({(s, c) for (_, s, c) in result.per_clip_auc_all})
    for t in range(k) if primary else ():
        errors = []
        for idx, (scene, clip) in enumerate(clip_keys):
            auc = result.per_clip_auc_all.get((t, scene, clip), float("nan"))
            errors.append(auc)
            print(
                f"transf: {t + 1}/{k}, clip: ({scene}, {clip}) "
                f"{idx + 1}/{len(clip_keys)}, score: {auc} "
                f"average_score: {np.nanmean(np.asarray(errors, float))}"
            )
        print(f"\nTest set score for transformation {t + 1}\n")
        print(f"auc = {result.per_transform_auc[t]}")
    if args.save_roc and primary:
        from ..score.auc import best_threshold
        from ..visualize.plots import plot_roc

        os.makedirs(args.save_roc, exist_ok=True)
        for t in range(k):
            s_t = result.per_transform_scores[t]
            gt_t = result.per_transform_gt[t]
            plot_roc(gt_t, s_t,
                     os.path.join(args.save_roc, f"t{t}_roc_hyp.png"))
            thr, _ = best_threshold(gt_t, s_t)
            print(f"best threshold (transform {t + 1}): {thr}")
        plot_roc(result.gt, result.scores,
                 os.path.join(args.save_roc, "final_roc.png"))
    _mark("aggregate")  # host aggregation + AUC + prints
    keys = ["ingest", "upload", "scoring", "aggregate"]
    deltas = {
        k: _phase[k] - _phase[prev]
        for k, prev in zip(keys, ["start"] + keys[:-1]) if k in _phase
    }
    print("[coskad] eval wall breakdown: "
          + " ".join(f"{k}={v:.2f}s" for k, v in deltas.items())
          + f" total={_time.perf_counter() - _t0:.2f}s")
    print(f"final AUC score: {result.auc:.6f}")
    distributed_barrier("coskad_eval_done")
    return result


if __name__ == "__main__":
    main()
