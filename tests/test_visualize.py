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
