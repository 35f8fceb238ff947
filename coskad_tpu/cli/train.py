"""Training entry point.

    python -m coskad_tpu.cli.train --config config/UBnormal/euclidean_encoder.yaml

Accepts the reference's YAML configs unchanged (train_COSKAD.py equivalent):
loads the train split (and the test split for validation when
`validation: True`), initializes the latent center with an exact global
mean/midpoint, fits the selected variant, and writes checkpoints + a config
snapshot under exp_dir/dataset/dir_name.
"""

from __future__ import annotations

import argparse
import os

import jax


def main(argv=None):
    parser = argparse.ArgumentParser(description="COSKAD-TPU training")
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--epochs", type=int, default=None, help="override epoch count")
    parser.add_argument("--resume", action="store_true",
                        help="resume from <exp_dir>/last.ckpt if present")
    from .common import (add_distributed_flag, distributed_barrier,
                         init_distributed, is_primary)

    add_distributed_flag(parser)
    args = parser.parse_args(argv)

    # Multi-host wiring FIRST: jax.distributed.initialize must precede any
    # backend/device use. One command per host, like the reference's one
    # command per node under Lightning DDP spawn (train_COSKAD.py:75-78).
    init_distributed(args.distributed)

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()

    # Fault injection (tests/test_supervise.py): simulate a cold start
    # (data load + first JIT compile) longer than the supervisor's
    # --stall-timeout — no ckpt_dir write lands during it, and the
    # supervisor's --startup-grace, not the stall timeout, must apply.
    delay = float(os.environ.get("COSKAD_STARTUP_DELAY_S", "0") or 0)
    if delay > 0:
        import time

        print(f"[coskad] injected startup delay {delay:.0f}s", flush=True)
        time.sleep(delay)

    from ..train import checkpoint
    from ..train.loop import Trainer
    from ..utils.logging import MetricLogger
    from .common import load_config, load_ground_truths, load_split

    cfg = load_config(args.config)
    primary = is_primary()
    print(f"[coskad] variant={cfg.model.variant} dataset={cfg.data.dataset_choice} "
          f"devices={jax.device_count()} "
          f"process={jax.process_index()}/{jax.process_count()}")

    train_ds = load_split(cfg, "train")
    print(f"[coskad] train windows: {train_ds.num_windows} "
          f"(x{cfg.data.num_transform} transforms)")
    val_ds, gts = None, {}
    if cfg.opt.validation:
        # Reference protocol (utils/argparser.py:14-27): UBnormal validates
        # on the 'validating' split with validating masks; the other
        # datasets deliberately validate on the test split. The config
        # loader derives pose_dirs['validation'] and gt_dir accordingly.
        val_split = "validation" if cfg.data.pose_dirs.get("validation") or (
            cfg.data.normalization_strategy == "robust"
            and cfg.data.dataset_choice == "UBnormal"
        ) else "test"
        val_ds = load_split(cfg, val_split, stride=1, scaler=train_ds.scaler)
        gts = load_ground_truths(cfg.data.val_gt_dir or cfg.data.gt_dir)
        print(f"[coskad] val windows: {val_ds.num_windows}, clips: {len(gts)}")

    ckpt_dir = cfg.ckpt_dir
    os.makedirs(ckpt_dir, exist_ok=True)
    # Every rank computes identical host-side results (validation scores are
    # allgathered), so only rank 0 writes metrics + checkpoints — the others
    # would race it on a shared filesystem for byte-identical bytes.
    logger = MetricLogger(log_dir=ckpt_dir if primary else None)
    trainer = Trainer(cfg, train_ds, val_ds, gts, logger=logger)
    state = trainer.init_state()
    # Two best checkpoints, like the reference's ModelCheckpoint(save_top_k=2)
    # (train_COSKAD.py:70-73): best.ckpt is the top score, best2.ckpt the
    # runner-up; a new best rotates the old best into best2.
    start_epoch, best_auc, best2_auc = 0, -1.0, -1.0
    resume_path = os.path.join(ckpt_dir, "last.ckpt")
    if args.resume and os.path.exists(resume_path):
        state, _, extra = checkpoint.restore(resume_path, state)
        state = trainer.attach_state(state)
        start_epoch = int(extra.get("epoch", -1)) + 1
        best_auc = float(extra.get("best_auc", -1.0))
        best2_auc = float(extra.get("best2_auc", -1.0))
        # Epoch-indexed schedules (lr_schedule, freeze_bn_after, shuffle
        # streams) and the plateau reducer's counters must see the GLOBAL
        # run position — otherwise a resumed run restarts the LR decay,
        # re-arms already-frozen BN, and trips the plateau at a different
        # epoch than the uninterrupted run.
        trainer.restore_schedule_state(extra)
        print(f"[coskad] resumed from {resume_path} at epoch {start_epoch}")
    else:
        state = trainer.initialize_center(state)
        print(f"[coskad] center initialized, |c| = "
              f"{float(jax.numpy.linalg.norm(state.center)):.4f}")

    # Fault-injection scoping for multi-process runs: COSKAD_CRASH_RANK
    # restricts the COSKAD_*_AT_EPOCH injections to one process id, so the
    # multi-host supervisor test can kill exactly one rank of a group
    # (tests/test_distributed_cli.py). Unset = every rank (single-process
    # behaviour unchanged).
    crash_rank = os.environ.get("COSKAD_CRASH_RANK", "")
    injectable = crash_rank in ("", str(jax.process_index()))

    # Checked BEFORE any rank writes (startup is the only race-free moment
    # to consult the shared filesystem): does a best.ckpt from a previous
    # attempt exist to rotate into best2 on the next improvement?
    have_best_ckpt = os.path.exists(os.path.join(ckpt_dir, "best.ckpt"))

    epochs = args.epochs if args.epochs is not None else cfg.opt.epochs
    for epoch in range(start_epoch, epochs):
        state, history = trainer.fit(state=state, epochs=1)
        # Fault injection (tests/test_supervise.py): crash AFTER the epoch's
        # metrics hit ckpt_dir/metrics.jsonl but BEFORE its checkpoint — a
        # deterministic every-attempt failure that must exhaust the
        # supervisor's restart budget (log writes are liveness, not
        # progress).
        if injectable and os.environ.get(
                "COSKAD_CRASH_BEFORE_CKPT_AT_EPOCH", "") == str(epoch):
            print(f"[coskad] injected pre-ckpt crash at epoch {epoch}", flush=True)
            os._exit(23)
        auc = history["validation_auc"][-1] if history["validation_auc"] else None
        # The best/best2 bookkeeping runs on every rank (auc is identical
        # everywhere — scores are allgathered), but only rank 0 touches
        # disk. `have_best_ckpt` tracks rotation eligibility in host state
        # (seeded from a pre-write exists() at startup) so best2_auc only
        # advances together with an actual on-disk rotation and every rank
        # agrees without racing rank 0's writes (round-5 review finding).
        best_path = os.path.join(ckpt_dir, "best.ckpt")
        if auc is not None and auc > best_auc:
            if best_auc > -1.0 and have_best_ckpt:
                if primary:
                    os.replace(best_path, os.path.join(ckpt_dir, "best2.ckpt"))
                best2_auc = best_auc
            best_auc = auc
            if primary:
                checkpoint.save(
                    best_path, state, cfg,
                    scaler=train_ds.scaler, extra={"epoch": epoch, "auc": auc},
                )
            have_best_ckpt = True
        elif auc is not None and auc > best2_auc:
            best2_auc = auc
            if primary:
                checkpoint.save(
                    os.path.join(ckpt_dir, "best2.ckpt"), state, cfg,
                    scaler=train_ds.scaler, extra={"epoch": epoch, "auc": auc},
                )
        if primary:
            checkpoint.save(
                os.path.join(ckpt_dir, "last.ckpt"), state, cfg,
                scaler=train_ds.scaler,
                extra={"epoch": epoch, "best_auc": best_auc,
                       "best2_auc": best2_auc, **trainer.schedule_state()},
            )
        # Fault injection for the supervisor's recovery test
        # (cli/supervise.py, tests/test_supervise.py): hard-crash AFTER the
        # epoch's checkpoint lands, so --resume restarts at epoch+1 and the
        # crash fires exactly once per fresh run.
        if injectable and os.environ.get("COSKAD_CRASH_AT_EPOCH", "") == str(epoch):
            print(f"[coskad] injected crash at epoch {epoch}", flush=True)
            os._exit(17)
        if injectable and os.environ.get("COSKAD_HANG_AT_EPOCH", "") == str(epoch):
            # Wedge without exiting (a hung device client / host deadlock):
            # only the supervisor's stall detector can recover from this.
            print(f"[coskad] injected hang at epoch {epoch}", flush=True)
            import time

            while True:
                time.sleep(60)
        msg = f"[coskad] epoch {epoch + 1}/{epochs} loss={history['loss'][-1]:.6f}"
        if auc is not None:
            msg += f" validation_auc={auc:.4f} (best {best_auc:.4f})"
        print(msg)
    logger.close()
    # Multi-host: leave together. An early exit tears down this process's
    # side of the DCN transport under the peers' live collectives.
    distributed_barrier("coskad_train_done")
    print(f"[coskad] done; checkpoints in {ckpt_dir}")


if __name__ == "__main__":
    main()
