"""Serving-path latency/throughput benchmark (AnomalyScorer).

The offline bench (bench.py) measures the training+scoring epoch loop; this
one measures the PRODUCTION serving surface (coskad_tpu/serve.py) the
reference repo does not have (its only inference path is re-running
eval_COSKAD.py end-to-end):

  * score_windows() latency: p50/p95 over repeated single-call requests at
    several request sizes. Every call pads to a whole number of
    cfg.data.batch_size batches, so a 1-window request pays one full batch
    of compute plus one tunnel dispatch (15-77 ms through axon) — the
    request-size sweep makes that cost model visible instead of implied.
  * sustained throughput: back-to-back full-batch calls, windows/sec,
    best-of-2 passes (same discipline as bench.py: warm twice first; the
    returned numpy array IS the forced host fetch).
  * score_clip_json() end-to-end wall: AlphaPose JSON -> per-frame scores
    (parse + preprocess + device scoring + aggregation, one total
    wall-clock percentile per request).

Usage:
    python scripts/bench_serving.py [--config cfg.yaml] [--ckpt best.ckpt]
        [--requests 30] [--batch-sizes 1 16 256]

Without --config a synthetic fixture (tests/fixtures.py) is generated;
without --ckpt the scorer runs on a freshly initialized state — latency and
throughput are weight-independent (identical program, identical shapes).

Emits one human-readable block and a final machine-readable JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax  # noqa: E402

from coskad_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def _percentiles(samples, ps=(50, 95)):
    a = np.asarray(samples) * 1e3  # -> ms
    return {f"p{p}": round(float(np.percentile(a, p)), 2) for p in ps}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--requests", type=int, default=30,
                    help="timed requests per latency point (after 2 warmups)")
    ap.add_argument("--batch-sizes", type=int, nargs="*",
                    default=[1, 16, 256],
                    help="request sizes for the latency sweep (the config's "
                         "full batch_size is always appended)")
    ap.add_argument("--throughput-calls", type=int, default=8,
                    help="full-batch calls per throughput pass (2 passes, "
                         "best-of-2)")
    args = ap.parse_args(argv)

    from coskad_tpu.cli.common import load_config
    from coskad_tpu.serve import AnomalyScorer

    if args.config is None:
        from fixtures import make_synthetic_dataset

        args.config = make_synthetic_dataset("/tmp/coskad_serve_bench")
        print(f"[serve-bench] synthetic fixture: {args.config}")
    cfg = load_config(args.config)

    if args.ckpt:
        scorer = AnomalyScorer.from_checkpoint(args.ckpt, cfg=cfg)
    else:
        scorer = AnomalyScorer(cfg, None)
        state = scorer.trainer.init_state()
        scorer.state = scorer.trainer.attach_state(state)
        print("[serve-bench] no --ckpt: fresh-initialized weights "
              "(latency/throughput are weight-independent)")

    d = cfg.data
    # Production windows carry num_coords + 1 channels (x, y, confidence —
    # what score_clip_json emits after preprocessing); benchmarking the
    # 2-channel shape would measure a program serving never runs.
    shape = (cfg.model.num_coords + 1, d.seg_len, d.n_joints)
    rng = np.random.default_rng(0)
    detail = {"platform": jax.devices()[0].platform,
              "batch_size": d.batch_size}

    # ------------------------------------------------- latency per request size
    sizes = sorted({*args.batch_sizes, d.batch_size})
    lat = {}
    for n in sizes:
        windows = rng.normal(size=(n, *shape)).astype(np.float32)
        for _ in range(2):  # warm: compile + committed layouts
            scorer.score_windows(windows)
        samples = []
        for _ in range(args.requests):
            t0 = time.perf_counter()
            s = scorer.score_windows(windows)
            samples.append(time.perf_counter() - t0)
        assert s.shape == (n,)
        lat[str(n)] = _percentiles(samples)
        print(f"[serve-bench] score_windows n={n:5d}: "
              f"p50={lat[str(n)]['p50']:.2f} ms  p95={lat[str(n)]['p95']:.2f} ms")
    detail["score_windows_latency_ms"] = lat

    # --------------------------------------------------- sustained throughput
    big = rng.normal(size=(d.batch_size, *shape)).astype(np.float32)
    scorer.score_windows(big)  # warm (same program as the sweep's last point)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(args.throughput_calls):
            scorer.score_windows(big)
        dt = time.perf_counter() - t0
        best = max(best, args.throughput_calls * d.batch_size / dt)
    detail["sustained_windows_per_sec"] = round(best, 1)
    print(f"[serve-bench] sustained score_windows throughput: "
          f"{best:,.0f} windows/s ({args.throughput_calls} x {d.batch_size})")

    # ------------------------------------------------------ clip JSON e2e wall
    # Synthesize an AlphaPose clip JSON in the tracked format parse_clip_json
    # reads: ~4 persons x ~120 frames of 17-kp skeletons.
    clip = {}
    n_frames, n_persons = 120, 4
    for pid in range(1, n_persons + 1):
        traj = {}
        base = rng.normal(loc=(320, 240), scale=40, size=2)
        for f in range(1, n_frames + 1):
            kps = rng.normal(loc=base, scale=15, size=(17, 2))
            conf = rng.uniform(0.5, 1.0, size=(17, 1))
            # Zero-padded frame keys: lexicographic row order must agree
            # with numeric frame order (parse_person, data/alphapose.py:44-53
            # — the reference's JSON layout has the same property).
            traj[f"{f:04d}"] = {"keypoints":
                                np.concatenate([kps, conf], 1).reshape(-1).tolist()}
        clip[str(pid)] = traj
    clip_path = "/tmp/coskad_serve_bench_clip.json"
    with open(clip_path, "w") as f:
        json.dump(clip, f)

    scorer.score_clip_json(clip_path, n_frames=n_frames)  # warm
    samples = []
    for _ in range(max(args.requests // 3, 5)):
        t0 = time.perf_counter()
        frames = scorer.score_clip_json(clip_path, n_frames=n_frames)
        samples.append(time.perf_counter() - t0)
    assert frames.shape == (n_frames,)
    detail["score_clip_json_ms"] = _percentiles(samples)
    print(f"[serve-bench] score_clip_json ({n_persons} persons x {n_frames} "
          f"frames): p50={detail['score_clip_json_ms']['p50']:.2f} ms  "
          f"p95={detail['score_clip_json_ms']['p95']:.2f} ms")

    # ------------------------------------------------- streaming throughput
    # Live-mode cost: per-frame push bookkeeping + batched device drains.
    # Sustained frames/s over the synthetic clip, best-of-2 passes (flush
    # forces the tail so every window is actually scored).
    from coskad_tpu.streaming import StreamingScorer

    by_frame = {}
    for pid, traj in clip.items():
        for fk, entry in traj.items():
            kp = np.asarray(entry["keypoints"], np.float64).reshape(-1, 3)
            by_frame.setdefault(int(fk), {})[int(pid)] = kp
    ordered = sorted(by_frame)
    StreamingScorer(scorer, min_batch=d.batch_size)  # construction is cheap
    best = 0.0
    for _ in range(2):
        stream = StreamingScorer(scorer, min_batch=d.batch_size)
        t0 = time.perf_counter()
        for fk in ordered:
            stream.push(fk, by_frame[fk])
        out = stream.flush(n_frames=n_frames, smooth=True)
        dt = time.perf_counter() - t0
        best = max(best, len(ordered) / dt)
    assert out.shape == (n_frames,)
    detail["streaming_frames_per_sec"] = round(best, 1)
    print(f"[serve-bench] streaming push+flush: {best:,.0f} frames/s "
          f"({n_persons} persons, min_batch={d.batch_size})")

    print(json.dumps({"serve_bench": detail}))


if __name__ == "__main__":
    main()
