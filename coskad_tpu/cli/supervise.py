"""Failure detection + elastic restart for training runs.

    python -m coskad_tpu.cli.supervise --config cfg.yaml --epochs 100 \
        [--num-processes N] [--max-restarts 3] [--stall-timeout 900] \
        [--backoff 2.0]

Closes the reference's crash-means-dead-job gap (Lightning DDP default,
train_COSKAD.py:75-78; SURVEY.md §5 "failure detection / elastic"): the
supervisor runs the train CLI as a child process — or, with
``--num-processes N``, a GROUP of N multi-host ranks wired into one global
device mesh via ``--distributed`` (cli/common.py) — and

  * detects CRASHES (any nonzero exit: segfault, OOM kill, NaN abort,
    preemption) and restarts with ``--resume`` after an exponential
    backoff, up to ``--max-restarts`` times. In group mode ANY rank's
    death fails the whole attempt: the survivors are blocked in
    collectives on the dead peer, so the supervisor SIGTERMs the rest of
    the group (each by its own pid, never a pattern kill) and restarts
    ALL ranks together on a fresh coordinator port;
  * detects STALLS — no checkpoint/metrics file under the run's ckpt_dir
    has been touched for ``--stall-timeout`` seconds (a wedged device
    client or a deadlocked host never exits on its own) — SIGTERMs the
    child/group and treats it as a crash;
  * resets the restart budget whenever the child makes PROGRESS (a
    checkpoint write), so a long run is allowed one recovery per failure
    rather than ``max-restarts`` total over its whole lifetime.

Every resume starts from ``last.ckpt`` (params + opt state + center/cov
buffers + scaler, train/checkpoint.py), so a supervised run converges to
the same result as an uninterrupted one — asserted by
tests/test_supervise.py (single process) and tests/test_distributed_cli.py
(2-rank group with one rank fault-injected via ``COSKAD_CRASH_AT_EPOCH``
+ ``COSKAD_CRASH_RANK``, see cli/train.py), which compare final
checkpoints leaf-for-leaf.

Exit status: 0 when the training run completed; 1 when the restart budget
was exhausted; each rank's exit code is reported per attempt on stderr.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

from ..utils.net import free_port as _free_port


def _terminate(procs) -> None:
    """SIGTERM each live child by pid, escalate to SIGKILL after 30s."""
    for p in procs:
        if p.poll() is None:
            p.send_signal(signal.SIGTERM)
    deadline = time.time() + 30
    for p in procs:
        if p.poll() is None:
            try:
                p.wait(timeout=max(deadline - time.time(), 0.1))
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()


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
    parser.add_argument("--num-processes", type=int, default=1,
                        help="multi-host group size: launch N train ranks "
                             "wired by --distributed over a local "
                             "coordinator; any rank's failure restarts the "
                             "whole group from last.ckpt")
    parser.add_argument("--coordinator-host", default="localhost",
                        help="coordinator address the ranks dial (group "
                             "mode); the port is chosen fresh per attempt")
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

    n = args.num_processes
    failures = 0
    attempt = 0
    while True:
        attempt += 1
        # Group mode: a fresh coordinator port per attempt — the previous
        # attempt's listener may linger in TIME_WAIT, and a stale rank from
        # the killed group must not be able to dial into the new one.
        if n > 1:
            port = _free_port()
            cmds = [
                cmd + ["--distributed",
                       f"{args.coordinator_host}:{port},{n},{rank}"]
                for rank in range(n)
            ]
        else:
            cmds = [cmd]
        print(f"[supervise] attempt {attempt}: {' '.join(cmds[0])}"
              + (f" (+{n - 1} more ranks)" if n > 1 else ""),
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
        children = [subprocess.Popen(c) for c in cmds]
        stalled = False
        dead_rank = None  # first nonzero-exit rank in group mode
        # Until this attempt's child proves it reached the write-producing
        # part of the run, judge it by --startup-grace: the cold-start
        # window (data load + first JIT compile, minutes on a real dataset)
        # writes nothing to ckpt_dir, and killing a healthy compiling child
        # restarts it into the identical silence until the budget runs out.
        saw_write = False
        while any(c.poll() is None for c in children):
            time.sleep(args.poll)
            codes = [c.poll() for c in children]
            # Any rank down with a nonzero code while peers live: the peers
            # are (or will be) blocked in collectives on the dead one —
            # take the group down now, don't wait for a gloo timeout.
            bad = [(r, c) for r, c in enumerate(codes)
                   if c is not None and c != 0]
            if bad and any(c is None for c in codes):
                dead_rank = bad[0][0]
                print(f"[supervise] rank {dead_rank} exited "
                      f"{bad[0][1]} — SIGTERM remaining ranks",
                      file=sys.stderr, flush=True)
                _terminate(children)
                break
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
                pids = " ".join(str(c.pid) for c in children
                                if c.poll() is None)
                print(f"[supervise] no ckpt_dir write for "
                      f"{limit:.0f}s — stall; SIGTERM child "
                      f"pid {pids}", file=sys.stderr, flush=True)
                _terminate(children)
                stalled = True
                break
        for c in children:  # reap everything before judging the attempt
            if c.poll() is None:
                c.wait()
        codes = [c.returncode for c in children]
        if all(c == 0 for c in codes) and not stalled:
            print(f"[supervise] run completed after {attempt} attempt(s)",
                  file=sys.stderr, flush=True)
            return 0
        failures += 1
        if stalled:
            why = "stall"
        elif n > 1:
            first_bad = dead_rank if dead_rank is not None else next(
                r for r, c in enumerate(codes) if c != 0)
            why = f"rank {first_bad} exit code {codes[first_bad]}"
        else:
            why = f"exit code {codes[0]}"
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
