"""C++ JSON parser: byte-identical semantics vs the pure-Python path."""

import json
import os

import numpy as np
import pytest

from coskad_tpu.data import alphapose
from coskad_tpu.data.native import native_available, parse_clip_json_native


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def _python_parse(path, kp_threshold=0.0):
    with open(path) as f:
        clip = json.load(f)
    return [
        alphapose.parse_person(clip[pid], int(pid), kp_threshold)
        for pid in sorted(clip.keys(), key=int)
    ]


def _assert_same(native, python):
    assert len(native) == len(python)
    for n, p in zip(native, python):
        assert n.person_id == p.person_id
        assert n.frame_keys == p.frame_keys
        np.testing.assert_allclose(n.keypoints, p.keypoints, rtol=0, atol=0)


def test_basic_clip(tmp_path, rng):
    clip = {}
    for pid in ("1", "7", "12"):  # non-contiguous, tests numeric person sort
        frames = {}
        for f in rng.permutation(range(3, 40))[:25]:
            kp = rng.uniform(-10, 900, size=(17, 3))
            frames[f"{f:04d}"] = {"keypoints": kp.reshape(-1).tolist()}
        clip[pid] = frames
    path = tmp_path / "c.json"
    path.write_text(json.dumps(clip))
    _assert_same(parse_clip_json_native(str(path)), _python_parse(str(path)))


def test_list_person_form_and_extra_fields(tmp_path, rng):
    """Person value as a list of dicts (merged, later keys win) + skipped
    extra fields of every JSON type."""
    kp1 = rng.normal(size=51).tolist()
    kp2 = rng.normal(size=51).tolist()
    kp2b = rng.normal(size=51).tolist()
    clip = {
        "2": [
            {"0001": {"keypoints": kp1, "scores": [0.1, 0.2],
                      "box": {"x": 1, "y": [2, {"z": None}]},
                      "flag": True, "note": "a \"quoted\" étape"}},
            {"0002": {"keypoints": kp2}, "0001": {"keypoints": kp2b}},
        ]
    }
    path = tmp_path / "c.json"
    path.write_text(json.dumps(clip))
    native = parse_clip_json_native(str(path))
    python = _python_parse(str(path))
    _assert_same(native, python)
    # later duplicate frame key won (dict.update semantics)
    np.testing.assert_allclose(native[0].keypoints[0].reshape(-1), kp2b)


def test_number_formats(tmp_path):
    vals = [1, -2.5, 1e-8, -3.25e4, 0.0, 12345678.9]
    kp = (vals * 9)[:51]
    clip = {"1": {"0005": {"keypoints": kp}}}
    path = tmp_path / "c.json"
    path.write_text(json.dumps(clip))
    native = parse_clip_json_native(str(path))
    np.testing.assert_allclose(native[0].keypoints.reshape(-1), kp, rtol=0)


def test_kp_threshold(tmp_path, rng):
    kp = rng.uniform(0, 1, size=(17, 3))
    kp[:, 2] = np.linspace(0, 1, 17)
    clip = {"1": {"0001": {"keypoints": kp.reshape(-1).tolist()}}}
    path = tmp_path / "c.json"
    path.write_text(json.dumps(clip))
    native = parse_clip_json_native(str(path), kp_threshold=0.5)
    python = _python_parse(str(path), kp_threshold=0.5)
    _assert_same(native, python)
    assert (native[0].keypoints[0][kp[:, 2] < 0.5, :2] == 0).all()


def test_malformed_json_raises(tmp_path):
    path = tmp_path / "bad.json"
    path.write_text('{"1": {"0001": {"keypoints": [1, 2, }}}')
    with pytest.raises(ValueError):
        parse_clip_json_native(str(path))


def test_load_split_uses_native(tmp_path, rng, monkeypatch):
    """End-to-end: load_alphapose_split gives identical datasets with and
    without the native parser."""
    d = tmp_path / "train"
    d.mkdir()
    clip = {}
    for pid in ("1", "2"):
        frames = {}
        for f in range(1, 40):
            kp = rng.uniform(10, 400, size=(17, 3))
            frames[f"{f:04d}"] = {"keypoints": kp.reshape(-1).tolist()}
        clip[pid] = frames
    (d / "01_0001_t.json").write_text(json.dumps(clip))

    ds_native = alphapose.load_alphapose_split(str(d), seg_len=12, seg_stride=4)
    monkeypatch.setenv("COSKAD_NATIVE", "0")
    ds_python = alphapose.load_alphapose_split(str(d), seg_len=12, seg_stride=4)
    np.testing.assert_allclose(ds_native.data, ds_python.data)
    np.testing.assert_allclose(ds_native.meta, ds_python.meta)
    np.testing.assert_allclose(ds_native.frame_ids, ds_python.frame_ids)


def test_native_is_faster(tmp_path, rng):
    """Sanity perf check on a larger clip (not a strict benchmark)."""
    import time

    clip = {}
    for pid in range(1, 30):
        frames = {}
        for f in range(1, 400):
            kp = rng.uniform(0, 900, size=51)
            frames[f"{f:05d}"] = {"keypoints": kp.tolist(),
                                  "scores": rng.uniform(size=17).tolist()}
        clip[str(pid)] = frames
    path = tmp_path / "big.json"
    path.write_text(json.dumps(clip))

    t0 = time.perf_counter()
    parse_clip_json_native(str(path))
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _python_parse(str(path))
    t_python = time.perf_counter() - t0
    print(f"native {t_native*1000:.1f} ms vs python {t_python*1000:.1f} ms")
    assert t_native < t_python


def test_duplicate_toplevel_person_matches_json_load(tmp_path, rng):
    """json.load keeps only the LAST duplicate top-level key; the native
    shim must do the same (not merge)."""
    kp_a = json.dumps(rng.normal(size=51).tolist())
    kp_b = json.dumps(rng.normal(size=51).tolist())
    raw = ('{"7": {"0001": {"keypoints": %s}}, '
           '"7": {"0002": {"keypoints": %s}}}' % (kp_a, kp_b))
    path = tmp_path / "dup.json"
    path.write_text(raw)
    native = parse_clip_json_native(str(path))
    python = _python_parse(str(path))
    _assert_same(native, python)
    assert native[0].frame_keys == [2]  # only the last occurrence survives


def test_csv_parser_matches_loadtxt(tmp_path, rng):
    from coskad_tpu.data.native import load_csv_native

    arr = rng.normal(size=(40, 35))
    arr[:, 0] = np.arange(1, 41)
    path = tmp_path / "t.csv"
    np.savetxt(path, arr, delimiter=",", fmt="%.8f")
    native = load_csv_native(str(path))
    ref = np.loadtxt(str(path), delimiter=",", ndmin=2)
    np.testing.assert_allclose(native, ref)


def test_csv_parser_scientific_and_blank_lines(tmp_path):
    from coskad_tpu.data.native import load_csv_native

    (tmp_path / "t.csv").write_text("1,2.5e-3,-4\n\n2,3.25E2,0.0\n")
    out = load_csv_native(str(tmp_path / "t.csv"))
    np.testing.assert_allclose(out, [[1, 2.5e-3, -4], [2, 325.0, 0.0]])


def test_csv_parser_ragged_raises(tmp_path):
    from coskad_tpu.data.native import load_csv_native

    (tmp_path / "t.csv").write_text("1,2,3\n4,5\n")
    with pytest.raises(ValueError):
        load_csv_native(str(tmp_path / "t.csv"))


def test_robust_pipeline_native_csv_equivalence(tmp_path, rng, monkeypatch):
    from coskad_tpu.data.trajectories import load_trajectories

    base = tmp_path / "training" / "trajectories" / "1-1"
    base.mkdir(parents=True)
    arr = np.concatenate([np.arange(1, 31)[:, None],
                          rng.uniform(0, 800, size=(30, 34))], axis=1)
    np.savetxt(base / "0001.csv", arr, delimiter=",", fmt="%.6f")
    monkeypatch.setenv("COSKAD_NATIVE_CSV", "1")
    t_native = load_trajectories(str(tmp_path / "training" / "trajectories"))
    monkeypatch.setenv("COSKAD_NATIVE_CSV", "0")
    monkeypatch.setenv("COSKAD_NATIVE", "0")  # also bypass the batched walk
    t_python = load_trajectories(str(tmp_path / "training" / "trajectories"))
    for k in t_native:
        np.testing.assert_allclose(t_native[k].coordinates,
                                   t_python[k].coordinates, rtol=1e-6)
        np.testing.assert_array_equal(t_native[k].frames, t_python[k].frames)


def test_parse_csv_files_batched(tmp_path, rng):
    """The threaded multi-file loader returns arrays aligned with the input
    order, matching per-file loadtxt."""
    from coskad_tpu.data.native import load_csv_files_native, native_available

    if not native_available():
        pytest.skip("native extension unavailable")
    paths = []
    for i in range(7):
        n = 5 + i
        arr = np.concatenate([np.arange(1, n + 1)[:, None],
                              rng.uniform(-5, 5, size=(n, 4))], axis=1)
        p = tmp_path / f"{i:04d}.csv"
        np.savetxt(p, arr, delimiter=",", fmt="%.7g")
        paths.append(str(p))
    out = load_csv_files_native(paths, n_threads=3)
    assert len(out) == 7
    for p, a in zip(paths, out):
        ref = np.loadtxt(p, delimiter=",", ndmin=2)
        np.testing.assert_allclose(a, ref, rtol=1e-6)


def test_parse_csv_files_error_names_file(tmp_path):
    from coskad_tpu.data.native import load_csv_files_native, native_available

    if not native_available():
        pytest.skip("native extension unavailable")
    good = tmp_path / "good.csv"
    good.write_text("1,2\n3,4\n")
    bad = tmp_path / "bad.csv"
    bad.write_text("1,2\n3\n")
    with pytest.raises(ValueError, match="bad.csv"):
        load_csv_files_native([str(good), str(bad)])
    with pytest.raises(ValueError, match="missing.csv"):
        load_csv_files_native([str(tmp_path / "missing.csv")])


def test_load_trajectories_batched_native_default(tmp_path, rng, monkeypatch):
    """Default path (COSKAD_NATIVE unset) routes through the batched C++
    loader and matches the pure-numpy walk, including dict ordering."""
    from coskad_tpu.data.trajectories import load_trajectories

    for folder, n_files in (("1-1", 3), ("2-4", 2)):
        base = tmp_path / folder
        base.mkdir(parents=True)
        for i in range(n_files):
            n = 12 + i
            arr = np.concatenate([np.arange(1, n + 1)[:, None],
                                  rng.uniform(0, 800, size=(n, 34))], axis=1)
            np.savetxt(base / f"{i:04d}.csv", arr, delimiter=",", fmt="%.6f")
    monkeypatch.delenv("COSKAD_NATIVE", raising=False)
    t_batched = load_trajectories(str(tmp_path))
    monkeypatch.setenv("COSKAD_NATIVE", "0")
    t_numpy = load_trajectories(str(tmp_path))
    assert list(t_batched.keys()) == list(t_numpy.keys())
    for k in t_batched:
        np.testing.assert_allclose(t_batched[k].coordinates,
                                   t_numpy[k].coordinates, rtol=1e-6)
        np.testing.assert_array_equal(t_batched[k].frames, t_numpy[k].frames)
