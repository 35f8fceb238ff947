"""Multi-host as a ONE-COMMAND CLI feature, tested across real process
boundaries.

The reference trains/evals on N devices with one command (Lightning spawns
the DDP ranks itself: train_COSKAD.py:75-78, eval_COSKAD.py:115). Round 4
proved the library path (tests/test_multiprocess.py drives the Trainer);
these tests prove the USER path: the real `cli.train` / `cli.eval` /
`cli.supervise` commands with `--distributed`, spawned as 2 OS processes of
4 virtual CPU devices each (8 global, gloo DCN), must produce the same
checkpoints and the same final AUC as a single-process 8-device run — and
the supervisor must recover a group from a single rank's mid-run crash.

Tolerances follow tests/test_multiprocess.py: gloo vs in-process psum
reduction order injects ~1e-6 float noise per step, so trained-parameter
equality is norm-level (rel L2 < 1e-2 per leaf) and the AUC contract is
near-exact; the supervised group recovery, by contrast, compares 2-process
vs 2-process (identical collective layout), so it is leaf-for-leaf EXACT.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from fixtures import make_synthetic_dataset

from coskad_tpu.utils.net import free_port as _free_port

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(devices: int, **extra):
    env = {
        **os.environ,
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices}",
    }
    env.update(extra)
    return env


def _launch_group(module, cfg_path, n, port, devices, argv=(), **env_extra):
    return [
        subprocess.Popen(
            [sys.executable, "-u", "-m", f"coskad_tpu.cli.{module}",
             "--config", cfg_path,
             "--distributed", f"localhost:{port},{n},{rank}", *argv],
            env=_env(devices, **env_extra),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(n)
    ]


def _join(procs, timeout=540):
    logs = [p.communicate(timeout=timeout)[0] for p in procs]
    for rank, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{log[-4000:]}"
    return logs


def _ckpt_dir(root):
    return os.path.join(root, "checkpoints", "Synthetic", "smoke")


def _leaves(payload):
    import jax

    return {
        jax.tree_util.keystr(k): np.asarray(v)
        for k, v in jax.tree_util.tree_leaves_with_path(payload["state"])
    }


def test_distributed_train_eval_cli_matches_single_process(tmp_path):
    """2-rank `cli.train --distributed` + `cli.eval --distributed` vs the
    same commands single-process on the same global 8-device mesh."""
    epochs = 3
    multi_root = str(tmp_path / "multi")
    single_root = str(tmp_path / "single")
    multi_cfg = make_synthetic_dataset(multi_root, seed=5, n_train_clips=1,
                                       n_test_clips=1)
    single_cfg = make_synthetic_dataset(single_root, seed=5, n_train_clips=1,
                                        n_test_clips=1)

    # --- train: 2 ranks x 4 devices (gloo DCN between them)
    _join(_launch_group("train", multi_cfg, 2, _free_port(), 4,
                        argv=("--epochs", str(epochs))))
    # --- train: single process, 8 devices (subprocess for env symmetry)
    r = subprocess.run(
        [sys.executable, "-m", "coskad_tpu.cli.train", "--config", single_cfg,
         "--epochs", str(epochs)],
        env=_env(8), capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]

    from coskad_tpu.train import checkpoint

    multi_pl = checkpoint.read_payload(
        os.path.join(_ckpt_dir(multi_root), "last.ckpt"))
    single_pl = checkpoint.read_payload(
        os.path.join(_ckpt_dir(single_root), "last.ckpt"))
    assert multi_pl["extra"]["epoch"] == single_pl["extra"]["epoch"] == epochs - 1
    ml, sl = _leaves(multi_pl), _leaves(single_pl)
    assert set(ml) == set(sl) and len(ml) > 10
    for k in sl:
        # Gloo-vs-in-process psum reduction order injects ~1e-6 noise per
        # step and Adam amplifies it chaotically over epochs (the library
        # test tolerates 5e-2 on scores for the same reason,
        # tests/test_multiprocess.py) -> per-leaf contract: relative L2 <
        # 1e-2 AND max abs < 5e-3 (observed: 1.2e-3 / 3e-4 worst leaf after
        # 3 epochs). Data-order or semantic divergence would be O(1) in
        # both norms; the behaviour-level statement is the AUC check below.
        a, b = ml[k].astype(np.float64), sl[k].astype(np.float64)
        rel_l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
        max_abs = np.max(np.abs(a - b)) if a.size else 0.0
        assert rel_l2 < 1e-2 and max_abs < 5e-3, (
            f"2-process CLI run diverged from single-process at {k}: "
            f"rel_l2={rel_l2:.2e} max_abs={max_abs:.2e}")
    # best.ckpt exists and was written by rank 0 only (no .tmp litter).
    assert os.path.exists(os.path.join(_ckpt_dir(multi_root), "best.ckpt"))
    assert not [f for f in os.listdir(_ckpt_dir(multi_root))
                if f.endswith(".tmp")]

    # --- eval: 2 ranks vs 1 process over the checkpoints just written
    logs = _join(_launch_group("eval", multi_cfg, 2, _free_port(), 4))
    m_auc = [re.search(r"final AUC score: ([0-9.]+)", lg) for lg in logs]
    assert all(m_auc), logs[0][-2000:]
    aucs = [float(m.group(1)) for m in m_auc]
    # Every rank computes (and reports) the identical final AUC.
    assert aucs[0] == aucs[1]
    r = subprocess.run(
        [sys.executable, "-m", "coskad_tpu.cli.eval", "--config", single_cfg],
        env=_env(8), capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    s_auc = float(re.search(r"final AUC score: ([0-9.]+)", r.stdout).group(1))
    # The float-noise-perturbed params can flip near-tied frame rankings;
    # the AUC itself must agree to ~2e-3 (tests/test_multiprocess.py's
    # rank-correlation contract at the CLI level).
    assert abs(aucs[0] - s_auc) < 2e-3
    assert s_auc > 0.6 and aucs[0] > 0.6


def test_supervised_group_crash_recovery_matches_uninterrupted(tmp_path):
    """Multi-host elastic recovery: rank 1 of a 2-rank supervised group
    hard-crashes after epoch 1's checkpoint; the supervisor must SIGTERM the
    blocked survivor, restart the WHOLE group with --resume on a fresh
    coordinator port, and the recovered run's final checkpoint must be
    leaf-for-leaf equal to an uninterrupted 2-rank run's. The reference's
    analogue is a dead job (train_COSKAD.py:75-78)."""
    epochs = 3
    base_root = str(tmp_path / "base")
    base_cfg = make_synthetic_dataset(base_root, seed=5, n_train_clips=1,
                                      n_test_clips=1)
    r = subprocess.run(
        [sys.executable, "-m", "coskad_tpu.cli.supervise", "--config",
         base_cfg, "--epochs", str(epochs), "--num-processes", "2",
         "--max-restarts", "2", "--backoff", "0.1", "--stall-timeout", "300"],
        env=_env(4), capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-4000:]
    assert "run completed after 1 attempt(s)" in r.stderr

    sup_root = str(tmp_path / "sup")
    sup_cfg = make_synthetic_dataset(sup_root, seed=5, n_train_clips=1,
                                     n_test_clips=1)
    r = subprocess.run(
        [sys.executable, "-m", "coskad_tpu.cli.supervise", "--config",
         sup_cfg, "--epochs", str(epochs), "--num-processes", "2",
         "--max-restarts", "2", "--backoff", "0.1", "--stall-timeout", "300"],
        env=_env(4, COSKAD_CRASH_AT_EPOCH="1", COSKAD_CRASH_RANK="1"),
        capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-4000:]
    # The supervisor took the group down on the dead rank, not a gloo timeout.
    assert "rank 1 exited 17" in r.stderr
    assert "restart 1/2" in r.stderr
    assert "run completed after 2 attempt(s)" in r.stderr

    from coskad_tpu.train import checkpoint

    base_pl = checkpoint.read_payload(
        os.path.join(_ckpt_dir(base_root), "last.ckpt"))
    sup_pl = checkpoint.read_payload(
        os.path.join(_ckpt_dir(sup_root), "last.ckpt"))
    assert base_pl["extra"]["epoch"] == sup_pl["extra"]["epoch"] == epochs - 1
    bl, sl = _leaves(base_pl), _leaves(sup_pl)
    assert set(bl) == set(sl) and len(bl) > 10
    for k in bl:
        np.testing.assert_array_equal(
            bl[k], sl[k],
            err_msg=f"group-recovered run diverged from uninterrupted at {k}")
