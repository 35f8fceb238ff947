"""2-process multi-host simulation: the DCN path is tested, not just documented.

Spawns two OS processes, each with 4 virtual CPU devices, wired by
parallel/mesh.py::initialize_distributed (gloo collectives) — the process
boundary the reference crosses with Lightning DDP spawn
(train_COSKAD.py:75-78). Runs 2 epochs of the flagship config + the fused
scoring pass over the global 8-device mesh and asserts loss / center /
inv-cov / scores equality with the same scenario on a single-process
8-device mesh, validating the README multi-host runbook's invariants
(every host loads the same data + computes the same permutations; outputs
are host-fetched via allgather)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_run_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "rank0.json")
    env = {
        **os.environ,
        "PYTHONPATH": REPO + os.pathsep + os.path.dirname(__file__),
        # The workers set their own JAX_PLATFORMS/XLA_FLAGS (4 devices each);
        # scrub the pytest session's 8-device forcing so it cannot leak.
        "XLA_FLAGS": "",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "mp_worker.py"),
             str(rank), "2", str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in (0, 1)
    ]
    logs = {}
    for rank, p in enumerate(procs):
        stdout, _ = p.communicate(timeout=540)
        logs[rank] = stdout
    for rank, p in enumerate(procs):
        assert p.returncode == 0, (
            f"rank {rank} failed:\n{logs[rank][-3000:]}"
        )
    with open(out) as f:
        multi = json.load(f)
    assert multi["process_count"] == 2
    assert multi["mesh_shape"] == {"data": 8, "model": 1}

    from mp_scenario import run_scenario

    single = run_scenario()
    assert single["process_count"] == 1

    # The host-side aggregation runs on identical allgathered arrays, and
    # the jitted programs are the same SPMD computation partitioned
    # differently — only reduction-order float noise is tolerated.
    # (With the scenario's 3x outlier windows the gradient psums span a
    # wider dynamic range, so cross-backend reduction-order noise reaches
    # ~3e-4 on the epoch losses; pure-noise data matched at 1e-5.)
    np.testing.assert_allclose(multi["loss"], single["loss"], rtol=1e-3)
    np.testing.assert_allclose(multi["center"], single["center"],
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(multi["inv_cov_trace"],
                               single["inv_cov_trace"], rtol=1e-3)
    # Mahalanobis scores see that noise amplified: gloo vs in-process psum
    # reduction order perturbs the trained params at ~1e-6, and the latent
    # covariance inverse multiplies it by cond(cov) ≈ 2.4e4 on this scenario
    # (measured) → a few-percent relative score spread. Tolerate the
    # amplification explicitly, and pin the contract that matters for
    # anomaly detection: the score ORDERING (hence AUC) must be identical.
    m = np.asarray(multi["scores"])
    s = np.asarray(single["scores"])
    np.testing.assert_allclose(m, s, rtol=5e-2)
    # Ordering contract: the scenario's 8 planted outlier windows (3x
    # amplitude, mp_scenario.py) must be the top-8 scores in BOTH runs —
    # the AUC-level statement survives the amplified float noise even
    # where near-tied inlier ranks may swap.
    assert set(np.argsort(m)[-8:]) == set(np.argsort(s)[-8:])
    rm, rs = np.argsort(np.argsort(m)), np.argsort(np.argsort(s))
    assert np.corrcoef(rm, rs)[0, 1] > 0.995
    np.testing.assert_allclose(multi["scores_sum"], single["scores_sum"],
                               rtol=2e-2)
