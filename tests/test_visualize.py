"""Visualization: headless rendering smoke tests."""

import json
import os

import numpy as np
import pytest


def _tiny_clip(rng, n_frames=8, v=17):
    clip = {}
    for pid in ("1", "2"):
        frames = {}
        for f in range(1, n_frames + 1):
            kp = rng.uniform(50, 300, size=(v, 3))
            frames[f"{f:04d}"] = {"keypoints": kp.reshape(-1).tolist()}
        clip[pid] = frames
    return clip


def test_clip_visualizer_render(tmp_path, rng):
    from coskad_tpu.visualize import ClipVisualizer

    path = tmp_path / "01_0001.json"
    with open(path, "w") as f:
        json.dump(_tiny_clip(rng), f)
    viz = ClipVisualizer("ubnormal").load_clip_json(str(path))
    keys = viz.frame_keys()
    assert len(keys) == 8
    actors = viz.actors_in_frame(keys[0])
    assert set(actors) == {"1", "2"} and actors["1"].shape == (17, 3)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    viz.render_frame(ax, keys[0], scores={"1": 0.7})
    assert len(ax.lines) > 0  # bones drawn
    plt.close(fig)


def test_animation_writes_file(tmp_path, rng):
    from coskad_tpu.visualize import ClipVisualizer

    path = tmp_path / "01_0001.json"
    with open(path, "w") as f:
        json.dump(_tiny_clip(rng, n_frames=4), f)
    viz = ClipVisualizer("avenue").load_clip_json(str(path))
    out = viz.animate(str(tmp_path / "clip.mp4"), max_frames=3)
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_plot_roc_and_scores(tmp_path, rng):
    from coskad_tpu.visualize import plot_roc, plot_scores

    y = rng.integers(0, 2, 200)
    y[:2] = [0, 1]
    s = rng.normal(size=200) + y
    auc = plot_roc(y, s, str(tmp_path / "roc.png"))
    assert 0.5 < auc <= 1.0
    assert os.path.getsize(tmp_path / "roc.png") > 0

    plot_scores(s, gt=y, path=str(tmp_path / "scores.png"),
                per_actor={1: s * 0.5, 2: s})
    assert os.path.getsize(tmp_path / "scores.png") > 0


def test_extract_frames_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from coskad_tpu.visualize import extract_frames

    video = str(tmp_path / "t.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 5, (64, 48))
    for i in range(6):
        frame = np.full((48, 64, 3), i * 40, np.uint8)
        w.write(frame)
    w.release()
    n = extract_frames(video, str(tmp_path / "frames"))
    assert n == 6
    assert os.path.exists(tmp_path / "frames" / "1.jpg")
    assert os.path.exists(tmp_path / "frames" / "6.jpg")


def test_plot_latents(tmp_path, rng):
    from coskad_tpu.visualize import plot_latents

    z = rng.normal(size=(200, 16))
    labels = rng.integers(0, 2, 200)
    plot_latents(z, labels, center=np.zeros(16), path=str(tmp_path / "lat3.png"))
    plot_latents(z, labels, path=str(tmp_path / "lat2.png"), three_d=False)
    assert os.path.getsize(tmp_path / "lat3.png") > 0
    assert os.path.getsize(tmp_path / "lat2.png") > 0


def test_plot_latents_2d_input(tmp_path, rng):
    from coskad_tpu.visualize import plot_latents

    z = rng.normal(size=(50, 2))
    plot_latents(z, path=str(tmp_path / "l2.png"))  # default three_d=True
    assert os.path.getsize(tmp_path / "l2.png") > 0


def test_per_clip_auc_table_formats():
    from coskad_tpu.visualize.plots import per_clip_auc_table

    d = {(1, 2): 0.91234, (1, 1): 0.85, (2, 1): 0.99}
    md = per_clip_auc_table(d)
    assert md.splitlines()[2] == "| 1_1 | 0.8500 |"  # worst first
    tex = per_clip_auc_table(d, fmt="latex", sort_by="clip")
    assert "1_1 & 0.8500 \\\\" in tex and tex.startswith("\\begin{tabular}")
    import pytest

    with pytest.raises(ValueError):
        per_clip_auc_table(d, fmt="html")


def test_plot_latent_sphere(tmp_path, rng):
    from coskad_tpu.visualize import plot_latent_sphere

    # spherical latents: unit-norm 16-d vectors (the spherical-VAE case)
    z = rng.normal(size=(150, 16))
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    dists = plot_latent_sphere(z, center=np.zeros(16),
                               path=str(tmp_path / "sphere.png"))
    assert os.path.getsize(tmp_path / "sphere.png") > 0
    assert np.allclose(dists, 1.0)
    # 3-d latents take the direct (un-projected) path
    plot_latent_sphere(rng.normal(size=(40, 3)),
                       path=str(tmp_path / "s3.png"))
    assert os.path.getsize(tmp_path / "s3.png") > 0


def test_plot_person_scores(tmp_path, rng):
    from coskad_tpu.visualize import plot_person_scores

    e = np.abs(rng.normal(size=(4, 120))) + 1e-3
    gt = np.zeros(120)
    gt[40:80] = 1
    clip_score = plot_person_scores(e, gt, path=str(tmp_path / "pp.png"))
    assert os.path.getsize(tmp_path / "pp.png") > 0
    assert clip_score.shape == (120,)
    # the shift zeroes the head of the smoothed curve's source
    assert np.all(np.isfinite(clip_score))


def test_ubnormal_original_name():
    from coskad_tpu.visualize import ubnormal_original_name

    # notebook translate_to_original_name semantics (visualize.ipynb):
    # scenario = first TWO chars of the clip id, remainder = version suffix
    assert ubnormal_original_name("107_020.mp4") == ("normal_scene_7_scenario_2", 7)
    assert ubnormal_original_name("107_0251.mp4") == (
        "normal_scene_7_scenario_2_fog", 7)
    assert ubnormal_original_name("203_0152.mp4") == (
        "abnormal_scene_3_scenario_1_fire", 3)
    assert ubnormal_original_name("203_015.mp4") == (
        "abnormal_scene_3_scenario_1", 3)
    # normal clip with a numeric (non fog/fire/smoke) version suffix
    assert ubnormal_original_name("101_012.mp4") == (
        "normal_scene_1_scenario_1_2", 1)


def test_hr_stats_table():
    from coskad_tpu.visualize import hr_stats_table

    stats = {
        "total_frames": {"global_stats": 1000},  # skipped (no details)
        "203_015.mp4": {"details": {
            "length": 300, "discarded_frames": 12, "perc_discarded": 4.0,
            "normal_frames": 200, "anomalous_frames": 100,
            "perc_abnormality": 33.3}},
        "204_010.mp4": {"details": {
            "length": 250, "discarded_frames": 0, "perc_discarded": 0.0,
            "perc_abnormality": 10.0}},  # filtered: no discarded frames
        "107_020.mp4": {"details": {
            "length": 100, "discarded_frames": 5, "perc_discarded": 5.0,
            "perc_abnormality": 0.0}},  # filtered: normal clip
    }
    tex = hr_stats_table(stats)
    assert tex.startswith(r"\begin{longtable}")
    assert r"\verb|abnormal_scene_3_scenario_1| & 300 & 12" in tex
    assert "204_010" not in tex and "normal_scene_7" not in tex
    md = hr_stats_table(stats, fmt="markdown")
    assert md.count("\n") == 2  # header + sep + one row (no trailing \n)
    with pytest.raises(ValueError):
        hr_stats_table(stats, fmt="html")


def test_viz_app_headless(tmp_path, rng):
    """The Streamlit app's headless fallback renders every clip."""
    from coskad_tpu.visualize.app import find_clip_jsons, main

    clip_dir = tmp_path / "alphapose" / "clip_a"
    clip_dir.mkdir(parents=True)
    with open(clip_dir / "alphapose-results-forvis-tracked.json", "w") as f:
        json.dump(_tiny_clip(rng, n_frames=3), f)
    found = find_clip_jsons(str(tmp_path / "alphapose"))
    assert len(found) == 1
    out_dir = tmp_path / "out"
    main(["--data-dir", str(tmp_path / "alphapose"),
          "--out-dir", str(out_dir), "--dataset", "avenue"])
    outs = list(out_dir.iterdir())
    assert len(outs) == 1 and outs[0].stat().st_size > 0
    assert outs[0].name == "clip_a.gif"

    # flat layout: one output PER FILE, named by the json stem
    flat = tmp_path / "flat"
    flat.mkdir()
    for name in ("01_0001_tracked", "01_0002_tracked"):
        with open(flat / f"{name}.json", "w") as f:
            json.dump(_tiny_clip(rng, n_frames=3), f)
    out2 = tmp_path / "out2"
    main(["--data-dir", str(flat), "--out-dir", str(out2),
          "--dataset", "avenue"])
    assert sorted(p.name for p in out2.iterdir()) == [
        "01_0001_tracked.gif", "01_0002_tracked.gif"]


def test_viz_app_score_overlay(tmp_path, rng):
    """--scores-dir: the app maps an eval --save-scores dump onto the
    clip's skeletons (rows = sorted person ids, cols = frame keys)."""
    from coskad_tpu.visualize.app import load_clip_scores, main

    flat = tmp_path / "pose"
    flat.mkdir()
    clip = _tiny_clip(rng, n_frames=4)
    with open(flat / "01_0002_tracked.json", "w") as f:
        json.dump(clip, f)
    scores_dir = tmp_path / "saved"
    scores_dir.mkdir()
    epp = np.arange(8, dtype=np.float64).reshape(2, 4)  # [P=2, F=4]
    np.save(scores_dir / "error_per_person_scene_1_scenario_2.npy", epp)

    fs = load_clip_scores(str(flat / "01_0002_tracked.json"),
                          str(scores_dir))
    keys = sorted(fs.keys())
    assert len(keys) == 4
    # person "1" is row 0, person "2" row 1; column = int(frame key) - 1
    # (epp columns are absolute 0-based frame indices)
    assert fs[keys[0]] == {"1": 0.0, "2": 4.0}
    assert fs[keys[3]] == {"1": 3.0, "2": 7.0}
    # with a fig_ids row map (what eval --save-scores now dumps), rows
    # follow it — including when only a subset of actors produced windows
    np.save(scores_dir / "fig_ids_scene_1_scenario_2.npy",
            np.array([2], dtype=np.int64))
    np.save(scores_dir / "error_per_person_scene_1_scenario_2.npy",
            epp[:1])
    fs = load_clip_scores(str(flat / "01_0002_tracked.json"),
                          str(scores_dir))
    assert fs[keys[0]] == {"2": 0.0}
    np.save(scores_dir / "error_per_person_scene_1_scenario_2.npy", epp)
    (scores_dir / "fig_ids_scene_1_scenario_2.npy").unlink()
    # no npy for this clip -> None
    with open(flat / "09_0009_tracked.json", "w") as f:
        json.dump(clip, f)
    assert load_clip_scores(str(flat / "09_0009_tracked.json"),
                            str(scores_dir)) is None

    out = tmp_path / "out"
    main(["--data-dir", str(flat), "--out-dir", str(out),
          "--dataset", "avenue", "--scores-dir", str(scores_dir)])
    assert (out / "01_0002_tracked.gif").stat().st_size > 0
