"""Device-profile the fused split train step (or the XLA step) and print a
per-kernel time table parsed from the trace, the round-2 recipe that
decomposed the backward (RESULTS.md 'Fused train kernel').

    python scripts/profile_fused.py fused:64,float32
    python scripts/profile_fused.py xla
"""

import glob
import gzip
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench_fused import B, build  # noqa: E402  (scripts/ on path below)


def parse_trace(log_dir):
    """Sum device-kernel durations by name from the Perfetto trace."""
    paths = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace file found under", log_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # device track pids: find the TensorCore track by name
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Tensor" in n or "/device" in n.lower()}
    by_name = {}
    for e in events:
        if dev_pids and e["pid"] not in dev_pids:
            continue
        name = e["name"].split(".")[0]
        agg = by_name.setdefault(name, [0.0, 0])
        agg[0] += e["dur"] / 1e3  # us -> ms
        agg[1] += 1
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for _, v in rows)
    print(f"{'kernel':58s} {'ms':>9s} {'calls':>6s}")
    for name, (ms, n) in rows[:25]:
        print(f"{name[:58]:58s} {ms:9.3f} {n:6d}")
    print(f"{'TOTAL (device)':58s} {total:9.3f}")


def main():
    sys.path.insert(0, "/root/repo/scripts")
    job = sys.argv[1] if len(sys.argv) > 1 else "fused:64,float32"
    model, params, bs, x_big = build()
    center = jnp.zeros(16)
    from coskad_tpu.kernels import stse_train as K

    if job.startswith("fused:"):
        g, dt_ = job[6:].split(",")
        g = int(g)

        def loss(p, xx):
            z, _ = K.fused_stse_apply(p, bs, xx, ghost_size=g,
                                      compute_dtype=dt_, bwd_mode="split")
            return jnp.mean((z - center) ** 2)
    else:
        def loss(p, xx):
            z, _ = model.apply({"params": p, "batch_stats": bs}, xx,
                               train=True, mutable=["batch_stats"])
            return jnp.mean((z - center) ** 2)

    def g_scan(p, xx):
        def body(carry, _):
            l, gr = jax.value_and_grad(loss)(carry, xx)
            newp = jax.tree_util.tree_map(lambda a, b_: a - 1e-6 * b_,
                                          carry, gr)
            return newp, l
        return jax.lax.scan(body, p, None, length=10)

    f = jax.jit(g_scan)
    r = f(params, x_big)  # compile (cached)
    jax.block_until_ready(r[1])

    log_dir = f"/tmp/fused_trace_{job.replace(':', '_').replace(',', '_')}"
    jax.profiler.start_trace(log_dir)
    r = f(params, x_big)
    jax.block_until_ready(r[1])
    jax.profiler.stop_trace()
    time.sleep(1)
    print(f"trace in {log_dir} (10 steps at B={B})")
    parse_trace(log_dir)


if __name__ == "__main__":
    main()
