"""Failure detection + elastic restart for training runs.

    python -m coskad_tpu.cli.supervise --config cfg.yaml --epochs 100 \
        [--max-restarts 3] [--stall-timeout 900] [--backoff 2.0]

Closes the reference's crash-means-dead-job gap (Lightning DDP default,
train_COSKAD.py:75-78; SURVEY.md §5 "failure detection / elastic"): the
supervisor runs the train CLI as a child process and

  * detects CRASHES (any nonzero exit: segfault, OOM kill, NaN abort,
    preemption) and restarts with ``--resume`` after an exponential
    backoff, up to ``--max-restarts`` times;
  * detects STALLS — no checkpoint/metrics file under the run's ckpt_dir
    has been touched for ``--stall-timeout`` seconds (a wedged device
    client or a deadlocked host never exits on its own) — SIGTERMs the
    child (never a pattern kill; only the child pid) and treats it as a
    crash;
  * resets the restart budget whenever the child makes PROGRESS (a
    checkpoint write), so a long run is allowed one recovery per failure
    rather than ``max-restarts`` total over its whole lifetime.

Every resume starts from ``last.ckpt`` (params + opt state + center/cov
buffers + scaler, train/checkpoint.py), so a supervised run converges to
the same result as an uninterrupted one — asserted by
tests/test_supervise.py, which fault-injects a hard crash mid-run via
``COSKAD_CRASH_AT_EPOCH`` (see cli/train.py) and compares final
checkpoints.

Exit status: 0 when the training run completed; 1 when the restart budget
was exhausted; the child's exit code is reported per attempt on stderr.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def _latest_mtime(path: str, suffix: str = "") -> float:
    """Newest mtime under `path` (non-recursive: ckpt files + metrics.jsonl
    land directly in ckpt_dir), optionally filtered by filename suffix;
    0.0 when the directory does not exist yet."""
    try:
        entries = [os.path.join(path, f) for f in os.listdir(path)
                   if f.endswith(suffix)]
    except FileNotFoundError:
        return 0.0
    newest = 0.0
    for f in entries:
        try:
            newest = max(newest, os.path.getmtime(f))
        except OSError:
            continue
    return newest


def supervise(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="COSKAD-TPU training supervisor (crash/stall recovery)")
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--max-restarts", type=int, default=3,
                        help="restarts allowed per failure (budget resets "
                             "on checkpoint progress)")
    parser.add_argument("--stall-timeout", type=float, default=900.0,
                        help="seconds without any ckpt_dir write before the "
                             "child is declared wedged and SIGTERMed")
    parser.add_argument("--startup-grace", type=float, default=3600.0,
                        help="stall allowance before the attempt's FIRST "
                             "ckpt_dir write (data load + first JIT compile "
                             "produce no writes; a cold start longer than "
                             "--stall-timeout must not read as a wedge)")
    parser.add_argument("--backoff", type=float, default=2.0,
                        help="initial restart delay, doubled per consecutive "
                             "failure")
    parser.add_argument("--poll", type=float, default=2.0,
                        help="child poll interval (seconds)")
    args, extra = parser.parse_known_args(argv)

    # ckpt_dir for stall detection; config-only import (no device client in
    # the supervisor — it must survive exactly the failures that wedge one).
    from ..config import from_reference_yaml

    ckpt_dir = from_reference_yaml(args.config).ckpt_dir

    cmd = [sys.executable, "-u", "-m", "coskad_tpu.cli.train",
           "--config", args.config, "--resume"]
    if args.epochs is not None:
        cmd += ["--epochs", str(args.epochs)]
    cmd += list(extra)

    failures = 0
    attempt = 0
    while True:
        attempt += 1
        print(f"[supervise] attempt {attempt}: {' '.join(cmd)}",
              file=sys.stderr, flush=True)
        start = time.time()
        # Two notions of activity, deliberately distinct:
        #  * STALL detection watches ANY ckpt_dir write (metrics.jsonl
        #    flushes prove the child is alive even between checkpoints);
        #  * the RESTART BUDGET resets only on CHECKPOINT writes — a child
        #    that logs metrics then crashes deterministically every epoch
        #    must still exhaust --max-restarts rather than loop forever.
        stall_anchor = max(_latest_mtime(ckpt_dir), start)
        ckpt_anchor = _latest_mtime(ckpt_dir, suffix=".ckpt")
        child = subprocess.Popen(cmd)
        stalled = False
        # Until this attempt's child proves it reached the write-producing
        # part of the run, judge it by --startup-grace: the cold-start
        # window (data load + first JIT compile, minutes on a real dataset)
        # writes nothing to ckpt_dir, and killing a healthy compiling child
        # restarts it into the identical silence until the budget runs out.
        saw_write = False
        while child.poll() is None:
            time.sleep(args.poll)
            newest_ckpt = _latest_mtime(ckpt_dir, suffix=".ckpt")
            if newest_ckpt > ckpt_anchor:
                ckpt_anchor = newest_ckpt
                failures = 0  # checkpoint progress -> fresh restart budget
            newest = _latest_mtime(ckpt_dir)
            limit = args.stall_timeout if saw_write else max(
                args.stall_timeout, args.startup_grace)
            if newest > stall_anchor:
                stall_anchor = newest
                saw_write = True
            elif time.time() - stall_anchor > limit:
                print(f"[supervise] no ckpt_dir write for "
                      f"{limit:.0f}s — stall; SIGTERM child "
                      f"pid {child.pid}", file=sys.stderr, flush=True)
                child.send_signal(signal.SIGTERM)
                try:
                    child.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    child.kill()
                    child.wait()
                stalled = True
                break
        code = child.returncode
        if code == 0 and not stalled:
            print(f"[supervise] run completed after {attempt} attempt(s)",
                  file=sys.stderr, flush=True)
            return 0
        failures += 1
        why = "stall" if stalled else f"exit code {code}"
        if failures > args.max_restarts:
            print(f"[supervise] {why}; restart budget exhausted "
                  f"({args.max_restarts}) — giving up", file=sys.stderr,
                  flush=True)
            return 1
        delay = args.backoff * (2 ** (failures - 1))
        print(f"[supervise] {why}; restart {failures}/{args.max_restarts} "
              f"in {delay:.1f}s", file=sys.stderr, flush=True)
        time.sleep(delay)


def main(argv=None):
    raise SystemExit(supervise(argv))


if __name__ == "__main__":
    main()
