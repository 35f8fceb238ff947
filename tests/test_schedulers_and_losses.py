"""Schedulers (torch-semantics parity) + reconstruction eval modes."""

import numpy as np
import pytest

from coskad_tpu.train import schedulers as sch


def test_cosine_matches_torch():
    torch = pytest.importorskip("torch")
    lr, t_max = 0.1, 20
    opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    ref = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=t_max, eta_min=0.001)
    ours = sch.cosine_annealing(lr, t_max, eta_min=0.001)
    for step in range(t_max):
        np.testing.assert_allclose(ours(step), opt.param_groups[0]["lr"], rtol=1e-6)
        opt.step()
        ref.step()


def test_cosine_eta_min_equals_lr_is_constant():
    fn = sch.cosine_annealing(1e-4, 100, eta_min=1e-4)
    assert all(fn(s) == 1e-4 for s in range(0, 100, 10))


def test_triangular2_matches_torch():
    torch = pytest.importorskip("torch")
    base, mx, up = 0.01, 1.0, 4
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
    ref = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=base, max_lr=mx, step_size_up=up, mode="triangular2",
        cycle_momentum=False,
    )
    ours = sch.triangular2(base, mx, up)
    for step in range(20):
        np.testing.assert_allclose(ours(step), opt.param_groups[0]["lr"], rtol=1e-6)
        opt.step()
        ref.step()


def test_step_and_exponential_and_delayed():
    s = sch.step_decay(1.0, step_size=5, gamma=0.5)
    assert s(0) == 1.0 and s(5) == 0.5 and s(10) == 0.25
    e = sch.exponential(1.0, 0.9)
    np.testing.assert_allclose(e(2), 0.81)
    d = sch.delayed(3, 1.0, sch.step_decay(1.0, 1, 0.5))
    assert d(0) == d(2) == 1.0
    assert d(3) == 1.0 and d(4) == 0.5


def test_build_schedule_registry():
    assert sch.build_schedule("tri", 1e-4, 100)(0) > 0
    assert sch.build_schedule("tri", 1e-4, 4)(7) == 1e-4  # epochs < 8 guard
    assert sch.build_schedule("cosine", 1e-4, 10)(5) == 1e-4  # eta_min quirk
    assert sch.build_schedule("", 2e-4, 10)(3) == 2e-4


# ---------------------------------------------------------------- rec modes


def test_mode_selection_matches_reference_rule():
    from coskad_tpu.score.window_losses import mode_from_rec_weight

    assert mode_from_rec_weight(0) == "hyp"
    assert mode_from_rec_weight(101) == "rec"
    assert mode_from_rec_weight(0.2) == "rec+hyp"


def test_reconstruction_window_scores():
    import jax.numpy as jnp

    from coskad_tpu.score.window_losses import reconstruction_window_scores

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 2, 6, 5)), jnp.float32)
    recon = x + 0.1
    z = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    c = jnp.zeros(8)
    hyp = reconstruction_window_scores(x, recon, z, c, 0.0)
    np.testing.assert_allclose(np.asarray(hyp), np.mean(np.asarray(z) ** 2, -1),
                               rtol=1e-6)
    rec = reconstruction_window_scores(x, recon, z, c, 200.0)
    np.testing.assert_allclose(np.asarray(rec), 0.01, rtol=1e-4)
    both = reconstruction_window_scores(x, recon, z, c, 0.2)
    np.testing.assert_allclose(np.asarray(both), np.asarray(rec) / 0.2 + np.asarray(hyp),
                               rtol=1e-5)


def test_extract_single_pose_consolidates():
    from coskad_tpu.score.window_losses import extract_single_pose

    rng = np.random.default_rng(1)
    mat = np.zeros((3, 10, 4))
    mat[0, 2:6] = rng.normal(size=(4, 4)) + 5
    mat[1, 4:8] = rng.normal(size=(4, 4)) + 5
    single, std = extract_single_pose(mat, method="median", return_std=True)
    assert single.shape == (10, 4)
    np.testing.assert_allclose(single[2], mat[0, 2])  # only one detection
    np.testing.assert_allclose(
        single[5], np.median(np.stack([mat[0, 5], mat[1, 5]]), 0)
    )
    assert single[0].sum() == 0  # uncovered frame
    assert std.shape == (10,) and std.min() >= 0 and std.max() <= 1


def test_compute_fig_matrix_matches_reference(rng):
    import os
    import sys

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference unavailable")
    sys.path.insert(0, "/root/reference")
    import types

    if "geoopt" not in sys.modules:
        g = types.ModuleType("geoopt")
        m = types.ModuleType("geoopt.manifolds")
        st = types.ModuleType("geoopt.manifolds.stereographic")
        mm = types.ModuleType("geoopt.manifolds.stereographic.math")
        g.manifolds = m; m.stereographic = st; st.math = mm
        for n_, mod in [("geoopt", g), ("geoopt.manifolds", m),
                        ("geoopt.manifolds.stereographic", st),
                        ("geoopt.manifolds.stereographic.math", mm)]:
            sys.modules[n_] = mod
    import utils.eval_utils as ref_eval

    from coskad_tpu.score.window_losses import compute_fig_matrix

    pos = rng.normal(size=(5, 2, 6, 4))
    frames = rng.integers(1, 30, size=(5, 6))
    ref = ref_eval.compute_fig_matrix(pos.copy(), frames, 40)
    ours = compute_fig_matrix(pos, frames, 40)
    np.testing.assert_allclose(ours, ref)
