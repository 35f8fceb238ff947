"""Profile the fused scoring scan (Trainer._score_many) on the store
pipeline and print the per-kernel device table with FULL kernel names —
decomposes the ~1.7 ms/batch score cost (gather + normalize + transform +
eval forward + variant distance).

    python scripts/profile_score.py [store|windows] [bfloat16|float32] [variant]
"""

import glob
import gzip
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def parse_trace_full(log_dir, top=40):
    paths = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace file found under", log_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Tensor" in n or "/device" in n.lower()}
    by_name = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e["pid"] not in dev_pids:
            continue
        agg = by_name.setdefault(e["name"], [0.0, 0, e])
        agg[0] += e["dur"] / 1e3
        agg[1] += 1
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for _, v in rows)
    for name, (ms, n, e) in rows[:top]:
        extra = e.get("args", {}).get("long_name", "")[:100]
        print(f"{ms:8.3f} {n:5d}  {name[:46]:46s} {extra}")
    print(f"TOTAL (device) {total:.3f} ms")


def main():
    pipeline = sys.argv[1] if len(sys.argv) > 1 else "store"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    variant = sys.argv[3] if len(sys.argv) > 3 else "euclidean_static"
    from coskad_tpu.config import (Config, DataConfig, ModelConfig,
                                   OptConfig, RunConfig)
    from coskad_tpu.parallel import create_mesh
    from coskad_tpu.train.loop import Trainer
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = Config(
        model=ModelConfig(variant=variant, channels=bench.CHANNELS,
                          h_dim=bench.H_DIM, latent_dim=bench.LATENT),
        data=DataConfig(seg_len=bench.T, batch_size=bench.BATCH,
                        num_transform=5, n_joints_override=bench.V),
        opt=OptConfig(lr=1e-4),
        run=RunConfig(compute_dtype=dtype),
    )
    ds = bench._bench_dataset(pipeline)
    mesh = create_mesh()
    trainer = Trainer(cfg, ds, mesh=mesh)
    state = trainer.init_state()
    sh = NamedSharding(mesh, P(None, "data"))
    perm = np.random.default_rng(1).permutation(len(ds))
    k = 10
    idx = jax.device_put(
        jnp.asarray(perm[: k * bench.BATCH].reshape(k, bench.BATCH)), sh)

    def run():
        s, _ = trainer._score_many(
            state.params, state.batch_stats, trainer.train_data, idx,
            state.rng, state.center, state.inv_cov, state.mean_vector)
        jax.block_until_ready(s)
        return float(s[0, 0])

    run(), run()
    log_dir = f"/tmp/score_trace_{pipeline}_{dtype}_{variant}"
    jax.profiler.start_trace(log_dir)
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    time.sleep(1)
    print(f"trace in {log_dir} ({k} batches at B={bench.BATCH}, "
          f"{1e3 * dt / k:.3f} ms/batch wall)")
    parse_trace_full(log_dir)


if __name__ == "__main__":
    main()
