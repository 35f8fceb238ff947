"""Serving soak: sustained mixed load + long-lived concurrent streams
against the REAL `cli.server` process (VERDICT r4 #7a).

    python scripts/soak_server.py [--requests 10000] [--streams 8]
        [--ckpt path] [--platform cpu]

Drives >= --requests mixed HTTP requests (windows scoring npy + JSON,
healthz, model info) from --workers threads while --streams rolling-GC
streams (horizon mode, streaming.py) continuously push frames, poll
provisional scores, and periodically flush-and-recreate — then asserts

  * bounded memory: server RSS growth from the post-warmup baseline stays
    under --rss-slack-mb (the leak signal the correctness tests cannot
    see), and
  * stable latency: windows-scoring p95 over the LAST quarter of the run
    is within 2x the p95 over the first quarter after warmup (degradation
    = some per-request state is accumulating).

One JSON summary line on stdout (driver-parseable last line). The device
lock serializes scoring by design (http_server.py docstring), so
throughput here is the head-of-line-blocking number, not a parallel one.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
from coskad_tpu.utils.net import free_port as _free_port  # noqa: E402


def _rss_mb(pid: int) -> float:
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def _call(url, body=None, ctype="application/json", method=None):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype},
        method=method or ("POST" if body is not None else "GET"))
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


class RequestWorker(threading.Thread):
    """Mixed scoring/metadata requests; records windows-scoring latency."""

    def __init__(self, base, budget, latencies, errors, seed):
        super().__init__(daemon=True)
        self.base, self.budget = base, budget
        self.latencies, self.errors = latencies, errors
        self.rng = np.random.default_rng(seed)

    def run(self):
        windows = self.rng.normal(
            size=(16, 3, 12, 18)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, windows)
        npy = buf.getvalue()
        js = json.dumps({"windows": windows[:4].tolist()}).encode()
        for i in range(self.budget):
            kind = i % 8
            try:
                if kind < 4:  # npy windows scoring (the hot path)
                    t0 = time.perf_counter()
                    _call(self.base + "/v1/score/windows", npy,
                          "application/x-npy")
                    self.latencies.append(time.perf_counter() - t0)
                elif kind < 6:  # JSON windows scoring
                    t0 = time.perf_counter()
                    _call(self.base + "/v1/score/windows", js)
                    self.latencies.append(time.perf_counter() - t0)
                elif kind == 6:
                    _call(self.base + "/healthz")
                else:
                    _call(self.base + "/v1/model")
            except Exception as e:  # noqa: BLE001 - soak records, not raises
                self.errors.append(f"req {type(e).__name__}: {e}")


class StreamWorker(threading.Thread):
    """One long-lived rolling-GC stream: push, poll, flush-and-recreate."""

    def __init__(self, base, n_frames, errors, seed):
        super().__init__(daemon=True)
        self.base, self.n_frames, self.errors = base, n_frames, errors
        self.rng = np.random.default_rng(seed)

    def run(self):
        try:
            sid = _call(self.base + "/v1/streams",
                        json.dumps({"min_batch": 64,
                                    "horizon": 64}).encode())["stream_id"]
            pose = self.rng.uniform(150, 500, size=(17, 2))
            frame, pushed = 1, 0
            while pushed < self.n_frames:
                chunk = []
                for _ in range(25):
                    pose = pose + self.rng.normal(scale=1.5, size=(17, 2))
                    kp = np.concatenate(
                        [pose, self.rng.uniform(0.5, 1, size=(17, 1))], -1)
                    chunk.append({"frame": frame, "poses": {"1": kp.tolist()}})
                    frame += 1
                _call(self.base + f"/v1/streams/{sid}/frames",
                      json.dumps({"frames": chunk}).encode())
                pushed += len(chunk)
                if pushed % 200 == 0:
                    _call(self.base + f"/v1/streams/{sid}/scores")
                if pushed % 1000 == 0:  # flush-and-recreate cycle
                    _call(self.base + f"/v1/streams/{sid}/flush",
                          b"{}")
                    sid = _call(self.base + "/v1/streams",
                                json.dumps({"min_batch": 64, "horizon": 64}
                                           ).encode())["stream_id"]
                    frame = 1
            _call(self.base + f"/v1/streams/{sid}/flush", b"{}")
        except Exception as e:  # noqa: BLE001
            self.errors.append(f"stream {type(e).__name__}: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=10_000)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--stream-frames", type=int, default=3000)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint to serve (default: train a smoke one)")
    ap.add_argument("--platform", default="cpu",
                    help="JAX_PLATFORMS for the server (cpu keeps the soak "
                         "off the shared TPU tunnel)")
    ap.add_argument("--rss-slack-mb", type=float, default=150.0)
    args = ap.parse_args()

    env = {**os.environ, "JAX_PLATFORMS": args.platform,
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    ckpt = args.ckpt
    workdir = None
    if ckpt is None:
        import tempfile

        workdir = tempfile.mkdtemp(prefix="coskad_soak_")
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from fixtures import make_synthetic_dataset

        cfg_path = make_synthetic_dataset(workdir, n_train_clips=1,
                                          n_test_clips=1)
        # Serving-sized scoring bucket: AnomalyScorer pads every request to
        # a whole multiple of cfg.data.batch_size (serve.py:104-110), so
        # the training default of 256 makes a 16-window request cost a
        # 256-window pass — 8x wasted compute per request on the soak's
        # small payloads. 32 is the realistic deployment bucket here.
        import yaml

        d = dict(yaml.safe_load(open(cfg_path)))
        d["dataset_batch_size"] = 32
        with open(cfg_path, "w") as f:
            yaml.safe_dump(d, f)
        r = subprocess.run(
            [sys.executable, "-m", "coskad_tpu.cli.train", "--config",
             cfg_path, "--epochs", "1"], env=env, capture_output=True,
            text=True, timeout=600)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        ckpt = os.path.join(workdir, "checkpoints", "Synthetic", "smoke",
                            "best.ckpt")

    port = _free_port()
    # Server output goes to a FILE, not a PIPE: an unread pipe fills (the
    # compile cache's XLA AOT load warnings alone overflow 64KB) and
    # blocks the server before it ever listens.
    srv_log_path = os.path.join(workdir or "/tmp", "soak_server.log")
    srv_log = open(srv_log_path, "w")
    server = subprocess.Popen(
        [sys.executable, "-u", "-m", "coskad_tpu.cli.server",
         "--ckpt", ckpt, "--port", str(port)],
        env=env, stdout=srv_log, stderr=subprocess.STDOUT, text=True)
    base = f"http://127.0.0.1:{port}"
    try:
        up = False
        for _ in range(300):  # model load + first compiles on a loaded host
            try:
                _call(base + "/healthz")
                up = True
                break
            except Exception:
                time.sleep(1)
        if not up:
            server.terminate()
            server.wait(timeout=30)
            raise SystemExit("server never became healthy:\n"
                             + open(srv_log_path).read()[-3000:])
        # Warmup: compile every geometric scoring bucket the workload can
        # touch (requests use 16; stream drains land in 64/128), then take
        # the RSS baseline — compile arenas must not read as a leak.
        for nwin in (16, 40, 100):
            w = np.zeros((nwin, 3, 12, 18), np.float32)
            buf = io.BytesIO()
            np.save(buf, w)
            for _ in range(2):
                _call(base + "/v1/score/windows", buf.getvalue(),
                      "application/x-npy")
        rss0 = _rss_mb(server.pid)

        latencies, errors, rss_samples = [], [], []
        workers = [
            RequestWorker(base, args.requests // args.workers, latencies,
                          errors, 100 + i)
            for i in range(args.workers)
        ] + [
            StreamWorker(base, args.stream_frames, errors, 200 + i)
            for i in range(args.streams)
        ]
        t0 = time.time()
        for t in workers:
            t.start()
        while any(t.is_alive() for t in workers):
            time.sleep(2)
            rss_samples.append(_rss_mb(server.pid))
        wall = time.time() - t0

        lat = np.asarray(latencies)
        q = len(lat) // 4
        if q == 0:  # all scoring requests failed (or a tiny --requests):
            # still emit the driver-parseable summary instead of crashing
            p95_early = p95_late = float("nan")
        else:
            p95_early = float(np.percentile(lat[:q], 95) * 1000)
            p95_late = float(np.percentile(lat[-q:], 95) * 1000)
        rss_end = rss_samples[-1] if rss_samples else rss0
        rss_peak = max(rss_samples) if rss_samples else rss0
        health = _call(base + "/healthz")
        result = {
            "requests": int(len(lat)),
            "streams": args.streams,
            "stream_frames": args.stream_frames,
            "errors": len(errors),
            "wall_s": round(wall, 1),
            "rps": round((len(lat)) / wall, 1),
            "p50_ms": (round(float(np.percentile(lat, 50) * 1000), 2)
                       if len(lat) else float("nan")),
            "p95_early_ms": round(p95_early, 2),
            "p95_late_ms": round(p95_late, 2),
            "rss_baseline_mb": round(rss0, 1),
            "rss_end_mb": round(rss_end, 1),
            "rss_peak_mb": round(rss_peak, 1),
            "n_requests_server": health["n_requests"],
            "live_streams_after": health["n_streams"],
            "ok": (not errors and q > 0
                   and rss_end - rss0 < args.rss_slack_mb
                   and p95_late < 2 * p95_early),
        }
        if errors:
            result["first_errors"] = errors[:5]
        print(json.dumps(result))
        return 0 if result["ok"] else 1
    finally:
        server.terminate()
        try:
            server.wait(timeout=30)
        except subprocess.TimeoutExpired:
            server.kill()


if __name__ == "__main__":
    raise SystemExit(main())
