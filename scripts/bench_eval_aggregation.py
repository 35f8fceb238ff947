"""Scale-test the host scoring aggregation (VERDICT round-2 item 6).

Generates a UBnormal-shaped eval workload — ~150 test clips across 29
scenes, 5-20 actors per clip, stride-1 windows, 5 transforms (the shape of
the reference's eval loop, eval_COSKAD.py:140-245) — and times
score.aggregate.evaluate_windows end-to-end, printing the per-stage
decomposition. The reference's version of this pass is a 4-deep Python loop
with O(T*C*N) boolean masking; ours is one lexsort + contiguous slices.

Run:  python scripts/bench_eval_aggregation.py [--clips 150] [--profile]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from coskad_tpu.score.aggregate import ScoringConfig, evaluate_windows


def make_workload(n_clips=150, n_scenes=29, seed=0, seg_len=12,
                  num_transform=5, pad_size=-1):
    rng = np.random.default_rng(seed)
    metas, frames, gts = [], [], {}
    for i in range(n_clips):
        scene = int(rng.integers(1, n_scenes + 1))
        clip = i + 1
        n_frames = int(rng.integers(300, 900))
        gt = np.zeros(n_frames, np.int64)
        a0 = int(rng.integers(0, n_frames - 60))
        gt[a0 : a0 + 60] = 1  # one anomalous span per clip
        gts[(scene, clip)] = gt
        n_actors = int(rng.integers(5, 21))
        for pid in range(1, n_actors + 1):
            t0 = int(rng.integers(0, n_frames // 3))
            t1 = int(rng.integers(t0 + seg_len + 1, n_frames + 1))
            starts = np.arange(t0, t1 - seg_len)  # stride-1 windows
            for s in starts:
                metas.append([scene, clip, pid, s + 1])
                frames.append(np.arange(s + 1, s + 1 + seg_len))
    meta1 = np.asarray(metas, np.int64)
    frames1 = np.asarray(frames, np.int32)
    nw = len(meta1)
    meta = np.tile(meta1, (num_transform, 1))
    frame_ids = np.tile(frames1, (num_transform, 1))
    trans = np.repeat(np.arange(num_transform), nw)
    scores = rng.random(nw * num_transform) + 0.01
    return scores, trans, meta, frame_ids, gts, ScoringConfig(
        num_transform=num_transform, pad_size=pad_size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=150)
    ap.add_argument("--pad-size", type=int, default=-1)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    t0 = time.perf_counter()
    scores, trans, meta, frame_ids, gts, cfg = make_workload(
        n_clips=args.clips, pad_size=args.pad_size)
    gen_s = time.perf_counter() - t0
    print(f"workload: {len(gts)} clips, {len(scores):,} scored items "
          f"({len(scores) // cfg.num_transform:,} windows x "
          f"{cfg.num_transform} transforms)  [gen {gen_s:.1f}s]")

    # Cold first passes on this 1-core host pay page-cache/allocator warmup
    # that varies 2-15x run to run (a cold tiled pass has measured anywhere
    # from 8 to 25 s for identical code); warm once, then best-of-2, like
    # bench.py's device timing discipline.
    evaluate_windows(scores, trans, meta, frame_ids, gts, cfg)
    if args.profile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        result = evaluate_windows(scores, trans, meta, frame_ids, gts, cfg)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    if args.profile:
        pr.disable()
        pstats.Stats(pr).sort_stats("cumtime").print_stats(15)
    print(f"evaluate_windows (tiled meta): {dt:.2f}s  (auc={result.auc:.4f}, "
          f"{len(result.per_clip_auc_all)} per-clip AUCs)")

    # Shared-meta fast path (what the CLI/validate call sites use)
    nw = len(scores) // cfg.num_transform
    evaluate_windows(scores, None, meta[:nw], frame_ids[:nw], gts, cfg)
    dts2 = []
    for _ in range(2):
        t0 = time.perf_counter()
        result2 = evaluate_windows(scores, None, meta[:nw], frame_ids[:nw],
                                   gts, cfg)
        dts2.append(time.perf_counter() - t0)
    dt2 = min(dts2)
    print(f"evaluate_windows (shared meta): {dt2:.2f}s  "
          f"(auc={result2.auc:.4f})")
    assert abs(result.auc - result2.auc) < 1e-12, (result.auc, result2.auc)


if __name__ == "__main__":
    main()
