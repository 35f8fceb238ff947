"""Cold-start ingestion benchmark (VERDICT round-2 item 5).

Measures the end-to-end startup path the reference pays on every run —
AlphaPose JSON parse -> per-person windowing -> normalization (the hot loop
at reference utils/dataset.py:130-196, json.load at :144-148) — on a
synthetic UBnormal-scale tree, with the C++ parser (data/native.py) on vs
off, and optionally the device upload + first compiled train step.

Run:
    python scripts/bench_cold_start.py                # host path, both parsers
    python scripts/bench_cold_start.py --train-step   # + TPU first-step time
    python scripts/bench_cold_start.py --clips 100 --persons 6 --frames 520
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CACHE = "/tmp/coskad_coldstart"


def gen_tree(n_clips: int, n_persons: int, n_frames: int, seed: int = 0):
    """Synthetic AlphaPose tracked-results tree (one JSON per clip, the
    format utils/dataset.py:138-161 walks)."""
    tag = f"{n_clips}x{n_persons}x{n_frames}"
    out = os.path.join(CACHE, tag)
    if os.path.isdir(out) and os.listdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    for c in range(n_clips):
        scene = c % 29 + 1
        # person-major tracked layout: {person_id: {frame_key: {keypoints}}}
        # (what PoseDataset walks, reference utils/dataset.py:138-161)
        clip = {}
        for p in range(n_persons):
            base = rng.uniform(100, 700, size=(1, 2))
            frames = {}
            for f in range(1, n_frames + 1):
                kp = np.empty((17, 3), np.float32)
                kp[:, :2] = base + rng.normal(0, 20, size=(17, 2))
                kp[:, 2] = rng.uniform(0.5, 1.0, size=17)
                frames[f"{f:04d}"] = {
                    "keypoints": [round(float(v), 3) for v in kp.ravel()]
                }
            clip[str(p + 1)] = frames
        with open(os.path.join(out, f"{scene:02d}_{c + 1:04d}_tracked.json"),
                  "w") as fh:
            json.dump(clip, fh)
    return out


def time_load(json_dir: str, native: bool, repeats: int = 2):
    """Best-of-N parse+window+normalize wall time. The native extension is
    built before timing (the lazy g++ build is a one-time install cost, not
    a per-run cost), and the caller interleaves python/native runs so both
    see a warm page cache."""
    os.environ["COSKAD_NATIVE"] = "1" if native else "0"
    from coskad_tpu.data import native as native_mod
    from coskad_tpu.data.alphapose import load_alphapose_split

    if native:
        native_mod._load_native()  # build outside the timed region
    best, ds = float("inf"), None
    for _ in range(repeats):
        t0 = time.perf_counter()
        ds = load_alphapose_split(json_dir, seg_len=12, seg_stride=1,
                                  num_transform=5)
        best = min(best, time.perf_counter() - t0)
    return ds, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=60)
    ap.add_argument("--persons", type=int, default=5)
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--train-step", action="store_true",
                    help="also time device upload + first train step (TPU)")
    args = ap.parse_args()

    t0 = time.perf_counter()
    tree = gen_tree(args.clips, args.persons, args.frames)
    nbytes = sum(os.path.getsize(os.path.join(tree, f))
                 for f in os.listdir(tree))
    print(f"tree: {tree} ({nbytes / 1e6:.0f} MB JSON) "
          f"[gen {time.perf_counter() - t0:.1f}s]")

    ds_py, t_py = time_load(tree, native=False)
    ds_native, t_native = time_load(tree, native=True)
    assert ds_native.num_windows == ds_py.num_windows
    np.testing.assert_array_equal(ds_native.meta, ds_py.meta)
    np.testing.assert_allclose(ds_native.data, ds_py.data, rtol=1e-6)
    print(f"windows: {ds_native.num_windows:,} (x5 transforms)")
    print(f"parse+window+normalize  C++ parser: {t_native:.2f}s   "
          f"pure python: {t_py:.2f}s   speedup {t_py / t_native:.2f}x")

    if args.train_step:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        import jax.numpy as jnp

        from coskad_tpu.config import (Config, DataConfig, ModelConfig,
                                       OptConfig, RunConfig)
        from coskad_tpu.train.loop import Trainer

        cfg = Config(
            model=ModelConfig(variant="euclidean_static"),
            data=DataConfig(seg_len=12, batch_size=2048, num_transform=5,
                            n_joints_override=18),
            opt=OptConfig(lr=1e-4),
            run=RunConfig(compute_dtype="bfloat16"),
        )
        t0 = time.perf_counter()
        trainer = Trainer(cfg, ds_native)
        state = trainer.init_state()
        idx = jnp.arange(2048)[None, :]
        state, m = trainer._train_epoch(state, trainer.train_data, idx)
        jax.block_until_ready(m["loss"])
        t_first = time.perf_counter() - t0
        print(f"device upload + init + first train step (incl. compile): "
              f"{t_first:.2f}s")
        print(f"cold start to first step: C++ {t_native + t_first:.2f}s, "
              f"python {t_py + t_first:.2f}s")


if __name__ == "__main__":
    main()
