"""Property-fuzz of the data layer against the reference oracle (VERDICT r4
#8): randomized ragged fixtures — frame gaps, staggered starts, short and
empty trajectories, zero coordinates, near-zero confidences, 17-vs-18 kp,
extreme values — through OUR windowing/normalizers AND the C++ parser,
compared against the reference's own functions
(/root/reference/utils/dataset_utils.py:155-253) and the pure-Python parser.
Every trial prints its seed on failure for exact replay; malformed JSON must
be REJECTED (raised, never crashed or silently mis-parsed) by both parsers.
"""

import json
import os
import sys

import numpy as np
import pytest

from coskad_tpu.data import alphapose, normalize, windows

REFERENCE = "/root/reference"


def _reference_utils():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001 (2022-era reference uses the alias)
    sys.path.insert(0, REFERENCE)
    try:
        import utils.dataset_utils as ref_du  # type: ignore

        return ref_du
    finally:
        sys.path.remove(REFERENCE)


# --------------------------------------------------------------- generators


def _fuzz_clip(rng, v=17, allow_empty=True):
    """Randomized ragged AlphaPose clip dict.

    Structure stressors: 0..4 persons, empty person dicts, staggered entry,
    trajectories shorter than seg_len, random 1-frame dropouts AND a long
    gap (the >2-missing split path), exact-zero coordinates (the robust
    normalizer's missing-keypoint sentinel), near-zero confidences, and
    coordinate magnitudes from 1e-3 to 1e4.
    """
    clip = {}
    n_persons = int(rng.integers(0 if allow_empty else 1, 5))
    for p in range(1, n_persons + 1):
        frames = {}
        if allow_empty and rng.random() < 0.15:
            clip[str(p)] = frames  # tracked id with zero detections
            continue
        start = int(rng.integers(1, 20))
        length = int(rng.integers(1, 90))
        gap_at = int(rng.integers(start, start + max(length, 1)))
        gap_len = int(rng.integers(0, 6))
        for f in range(start, start + length):
            if gap_at <= f < gap_at + gap_len:
                continue  # long gap
            if rng.random() < 0.08:
                continue  # scattered dropouts
            scale = 10.0 ** rng.uniform(-3, 4)
            kp = rng.uniform(0, scale, size=(v, 3))
            kp[:, 2] = rng.uniform(0, 1, size=v)
            if rng.random() < 0.3:  # missing keypoints: exact zeros
                mask = rng.random(v) < 0.2
                kp[mask, 0] = 0.0
                kp[mask, 1] = 0.0
            if rng.random() < 0.3:  # near-zero confidences
                kp[rng.random(v) < 0.3, 2] = 10.0 ** rng.uniform(-12, -6)
            frames[f"{f:04d}"] = {"keypoints": kp.reshape(-1).tolist()}
        clip[str(p)] = frames
    return clip


def _our_segment(clip, scene, clip_id, start_offset, stride, seg_len):
    trajectories = [
        alphapose.parse_person(clip[pid], int(pid))
        for pid in sorted(clip.keys(), key=int)
        if clip[pid]  # reference skips persons with zero detections upstream
    ]
    return windows.segment_clip(
        trajectories, scene, clip_id, start_offset=start_offset,
        stride=stride, seg_len=seg_len,
    )


# ------------------------------------------------------------------ fuzzers


def _oracle_split_guarded(ref_du, rows, keys, start_ofst, stride, seg_len,
                          scene, clip_id, pid):
    """The reference's split_pose_to_segments loop verbatim
    (/root/reference/utils/dataset_utils.py:236-253) with its two
    trajectory-tail crashes guarded:
      (1) start_ind past the row count IndexErrors on keys[start_ind]
          (num_segs ignores start_ofst);
      (2) a window whose KEYS pass is_seg_continuous across a gap but whose
          ROWS run out before seg_len crashes the reshape.
    Whenever the real oracle does not crash, the shim is asserted equal to
    it — so it only ever ADDS behavior on draws the reference cannot
    process at all (where our splitter skips the impossible window)."""
    clip_t = rows.shape[0]
    num_segs = int(np.ceil((clip_t - seg_len) / stride))
    skeys = sorted(int(k) for k in keys)
    out_d, out_m, out_i = [], [], []
    for seg_ind in range(max(num_segs, 0)):
        start_ind = start_ofst + seg_ind * stride
        if start_ind >= clip_t:
            break  # guard (1)
        start_key = skeys[start_ind]
        if ref_du.is_seg_continuous(skeys, start_key, seg_len):
            if start_ind + seg_len > clip_t:
                continue  # guard (2)
            out_d.append(rows[start_ind:start_ind + seg_len])
            out_m.append([scene, clip_id, pid, start_key])
            out_i.append(skeys[start_ind:start_ind + seg_len])
    data = (np.stack(out_d) if out_d
            else np.empty((0, seg_len) + rows.shape[1:]))
    return data, out_m, out_i


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_windowing_matches_reference(seed):
    """Random ragged clips through the reference's own gen_clip_seg_data_np
    vs our parser+segmenter: identical windows, metadata and frame ids —
    including which windows exist across gaps (is_seg_continuous parity).
    Draws the reference itself crashes on (guarded-shim cases) assert our
    splitter's graceful handling instead."""
    ref_du = _reference_utils()
    rng = np.random.default_rng(971_000 + seed)
    clip = _fuzz_clip(rng)
    stride = int(rng.integers(1, 9))
    seg_len = int(rng.choice([6, 12]))
    start_offset = int(rng.choice([0, 3]))
    msg = f"seed={971_000 + seed} stride={stride} seg_len={seg_len} " \
          f"offset={start_offset}"
    # The reference crashes on a person with zero detections
    # (single_pose_dict2np indexes the first key); our loaders SKIP such
    # persons (no windows either way), so the oracle gets the filtered view.
    ref_view = {pid: fr for pid, fr in clip.items() if fr}

    # Guarded per-person oracle (validated against the real one below).
    shim_d, shim_m, shim_i = [], [], []
    for pid in sorted(ref_view.keys(), key=int):
        rows, meta1, keys1 = ref_du.single_pose_dict2np(ref_view, pid, 0)
        d, m, i = _oracle_split_guarded(
            ref_du, rows, keys1, start_offset, stride, seg_len, 1, 5,
            int(pid))
        shim_d.append(d)
        shim_m += m
        shim_i += i
    shim_data = (np.concatenate(shim_d, axis=0) if shim_d
                 else np.empty((0, seg_len, 0, 0)))

    try:
        ref_data, ref_meta, ref_ids = ref_du.gen_clip_seg_data_np(
            ref_view, start_ofst=start_offset, seg_stride=stride,
            seg_len=seg_len, scene_id="01", clip_id="05",
        )
    except (ValueError, IndexError):
        ref_data = None  # the reference's own tail crash; shim carries on
    if ref_data is not None:
        # The shim IS the reference on every draw the reference survives.
        np.testing.assert_allclose(shim_data, ref_data, err_msg=msg)
        assert shim_m == [[int(a) for a in m] for m in ref_meta], msg
        assert shim_i == ref_ids, msg

    ours_data, ours_meta, ours_ids = _our_segment(
        clip, 1, 5, start_offset, stride, seg_len)
    assert np.asarray(ours_data).shape == np.asarray(shim_data).shape, msg
    np.testing.assert_allclose(ours_data, shim_data, err_msg=msg)
    assert ours_meta == shim_m, msg
    assert ours_ids == shim_i, msg


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_normalizers_match_reference(seed):
    """All four normalization strategies on adversarial pose tensors (exact
    zeros, near-zero confidences, 1e-3..1e4 magnitudes, 17 and 18 joints,
    random flag combinations) vs the reference's own functions."""
    ref_du = _reference_utils()
    rng = np.random.default_rng(972_000 + seed)
    n = int(rng.integers(4, 40))
    t = int(rng.choice([6, 12]))
    v = int(rng.choice([17, 18]))
    scale = 10.0 ** rng.uniform(-2, 4)
    pose = rng.uniform(0, scale, size=(n, t, v, 3))
    pose[rng.random(pose.shape[:-1]) < 0.1] = 0.0
    pose[..., 2] = np.where(rng.random(pose.shape[:-1]) < 0.2,
                            10.0 ** rng.uniform(-12, -6), pose[..., 2])
    vid_res = [int(rng.integers(100, 2000)), int(rng.integers(100, 2000))]
    symm = bool(rng.integers(0, 2))
    sub = bool(rng.integers(0, 2))
    msg = f"seed={972_000 + seed} shape={pose.shape} res={vid_res} " \
          f"symm={symm} sub={sub}"

    # The reference's sub_mean=False branch never assigns mean_kp_val, so
    # its default return_mean=True crashes (dataset_utils.py:46-59) — its
    # supported envelope is return_mean == sub_mean; fuzz within it.
    ref_m, ref_mean = ref_du.normalize_pose(
        pose.copy(), vid_res=vid_res, symm_range=symm, sub_mean=sub,
        return_mean=sub)
    ours_m, ours_mean = normalize.normalize_markovitz(
        pose, vid_res=vid_res, symm_range=symm, sub_mean=sub)
    np.testing.assert_allclose(ours_m, ref_m, rtol=1e-10, atol=1e-12,
                               err_msg=msg)
    if sub:
        np.testing.assert_allclose(ours_mean, ref_mean, rtol=1e-10,
                                   atol=1e-12, err_msg=msg)

    ref_s, _ = ref_du.normalize_pose_stan(pose.copy(), vid_res=vid_res)
    ours_s, _ = normalize.normalize_stan(pose, vid_res=vid_res)
    np.testing.assert_allclose(ours_s, ref_s, rtol=1e-9, atol=1e-12,
                               err_msg=msg, equal_nan=True)

    ref_b, _ = ref_du.normalize_pose_bbox(pose.copy(), vid_res=vid_res)
    ours_b, _ = normalize.normalize_bbox(pose, vid_res=vid_res)
    np.testing.assert_allclose(ours_b, ref_b, rtol=1e-9, atol=1e-12,
                               err_msg=msg, equal_nan=True)

    pytest.importorskip("sklearn")
    ref_r, ref_scaler = ref_du.normalize_pose_robust(
        pose.copy(), vid_res=vid_res, symm_range=symm)
    ours_r, ours_scaler = normalize.normalize_robust(
        pose, vid_res=vid_res, symm_range=symm)
    np.testing.assert_allclose(ours_r, ref_r, rtol=1e-8, atol=1e-12,
                               err_msg=msg, equal_nan=True)
    np.testing.assert_allclose(ours_scaler.center, ref_scaler.center_,
                               rtol=1e-8, err_msg=msg, equal_nan=True)
    np.testing.assert_allclose(ours_scaler.scale, ref_scaler.scale_,
                               rtol=1e-8, err_msg=msg, equal_nan=True)


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_native_parser_matches_python(tmp_path, seed):
    """The C++ parser on random ragged clips (incl. empty persons, integer
    and exponent-notation floats, -0.0, unicode extra fields) must be
    byte-identical to the Python parser."""
    from coskad_tpu.data.native import native_available, parse_clip_json_native

    if not native_available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(973_000 + seed)
    clip = _fuzz_clip(rng)
    # Number-format stressors the generator's uniform floats don't produce:
    if clip and rng.random() < 0.7:
        pid = next(iter(clip))
        if clip[pid]:
            fk = next(iter(clip[pid]))
            kp = clip[pid][fk]["keypoints"]
            kp[0] = int(kp[0])          # integer literal
            kp[1] = float(f"{kp[1]:e}")  # exponent notation survives dumps
            kp[2] = -0.0
            clip[pid][fk]["note"] = "ünïcode \"quoted\" ☃"
    path = tmp_path / f"c{seed}.json"
    path.write_text(json.dumps(clip))
    native = parse_clip_json_native(str(path))
    python = [
        alphapose.parse_person(clip[pid], int(pid))
        for pid in sorted(clip.keys(), key=int)
        if clip[pid]
    ]
    msg = f"seed={973_000 + seed}"
    assert len(native) == len(python), msg
    for nt, pt in zip(native, python):
        assert nt.person_id == pt.person_id, msg
        assert nt.frame_keys == pt.frame_keys, msg
        np.testing.assert_allclose(nt.keypoints, pt.keypoints, rtol=0,
                                   atol=0, err_msg=msg)


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_malformed_json_rejected_by_both_parsers(tmp_path, seed):
    """Corrupted clip files (truncation, byte substitution, wrong-length
    keypoint rows, wrong payload types) must raise cleanly from BOTH parsers
    — never crash the process, hang, or silently return garbage."""
    from coskad_tpu.data.native import native_available, parse_clip_json_native

    rng = np.random.default_rng(974_000 + seed)
    clip = _fuzz_clip(rng, allow_empty=False)
    text = json.dumps(clip)
    kind = seed % 4
    if kind == 0:  # truncate mid-document
        text = text[: int(rng.integers(1, max(len(text) - 1, 2)))]
    elif kind == 1:  # substitute a structural byte
        i = int(rng.integers(0, len(text)))
        text = text[:i] + rng.choice(list("}]\",:x")) + text[i + 1:]
    elif kind == 2:  # wrong-length keypoint row
        pid = next(p for p in clip if clip[p])
        fk = next(iter(clip[pid]))
        clip[pid][fk]["keypoints"] = clip[pid][fk]["keypoints"][:-1]
        text = json.dumps(clip)
    else:  # wrong payload types
        pid = next(p for p in clip if clip[p])
        fk = next(iter(clip[pid]))
        clip[pid][fk]["keypoints"] = ["not-a-list", 17, {"x": 1},
                                      [["nested"]]][int(rng.integers(0, 4))]
        text = json.dumps(clip, default=str)
    path = tmp_path / f"bad{seed}.json"
    path.write_text(text)
    msg = f"seed={974_000 + seed} kind={kind}"

    def parses_ok(fn):
        """True if the parser ACCEPTS the document (some corruptions are
        still valid clips, e.g. a substitution inside a string)."""
        try:
            fn()
            return True
        except Exception:
            return False  # rejected cleanly — the property under test

    py_ok = parses_ok(lambda: [
        alphapose.parse_person(v, int(k), 0.0)
        for k, v in json.loads(open(path).read()).items() if v])
    if native_available():
        nat_ok = parses_ok(lambda: parse_clip_json_native(str(path)))
        # Accept/reject must AGREE: a file one parser rejects and the other
        # silently accepts would make COSKAD_NATIVE=0/1 behave differently.
        assert nat_ok == py_ok, msg
    if kind in (0, 2, 3):
        # These corruptions are never valid clips; both must have rejected.
        assert not py_ok, msg


# ---------------------------------------------------- Morais trajectory side


def _reference_data_mod():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import utils.data as ref_data
    import utils.preprocessing as ref_prep

    return ref_data, ref_prep


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_trajectory_toolkit_matches_reference(seed):
    """Randomized Morais trajectories (short/ragged lengths, zeroed joints,
    fully-missing step blocks incl. at the edges, extreme magnitudes)
    through bbox computation, both coordinate systems, missing-step
    interpolation, the three scalers and hop-window aggregation vs the
    reference's own utils/data.py + utils/preprocessing.py."""
    from coskad_tpu.data import trajectories as tj

    ref_data, ref_prep = _reference_data_mod()
    rng = np.random.default_rng(991_000 + seed)
    res = np.array([float(rng.integers(200, 2000)),
                    float(rng.integers(200, 2000))], np.float32)
    v = 17
    n = int(rng.integers(3, 120))
    scale = 10.0 ** rng.uniform(0, 3.5)
    coords = rng.uniform(0, scale, size=(n, 2 * v)).astype(np.float32)
    coords[rng.random(coords.shape) < 0.08] = 0.0  # missing joints
    # fully-missing step blocks, possibly touching the edges
    for _ in range(int(rng.integers(0, 3))):
        b0 = int(rng.integers(0, n))
        coords[b0: b0 + int(rng.integers(1, 4))] = 0.0
    f0 = int(rng.integers(0, 9))
    frames = np.arange(f0, f0 + n)
    msg = f"seed={991_000 + seed} n={n} res={res.tolist()}"

    # bounding boxes per step
    for i in range(0, n, max(n // 5, 1)):
        assert (tj.compute_bounding_box(coords[i], res)
                == ref_data.compute_bounding_box(coords[i], res)), msg

    # coordinate systems
    ref_tr = ref_data.Trajectory("1-1_0001", frames.copy(), coords.copy())
    ref_tr.change_coordinate_system(res, coordinate_system="bounding_box_centre")
    ours = tj.Trajectory("1-1_0001", frames.copy(), coords.copy())
    ours.to_bounding_box_centre(res)
    np.testing.assert_allclose(ours.coordinates, ref_tr.coordinates,
                               rtol=1e-5, atol=1e-6, err_msg=msg)
    ref_tr2 = ref_data.Trajectory("1-1_0001", frames.copy(), coords.copy())
    ref_tr2.use_global_features(res)
    ours2 = tj.Trajectory("1-1_0001", frames.copy(), coords.copy())
    np.testing.assert_allclose(ours2.global_features(res), ref_tr2.coordinates,
                               rtol=1e-5, atol=1e-6, err_msg=msg)

    # missing-step interpolation
    ref_tr3 = ref_data.Trajectory("1-1_0001", frames.copy(), coords.copy())
    ours3 = tj.Trajectory("1-1_0001", frames.copy(), coords.copy())
    ours3.input_missing_steps()
    try:
        ref_tr3.input_missing_steps()
    except IndexError:
        # The reference's scan walks past the end when the trajectory ENDS
        # with fully-missing steps (utils/data.py while-loop); ours leaves
        # such un-interpolatable steps as-is and must not crash.
        assert np.isfinite(ours3.coordinates).all(), msg
        assert ours3.coordinates.shape == coords.shape, msg
    else:
        np.testing.assert_allclose(ours3.coordinates, ref_tr3.coordinates,
                                   rtol=1e-6, atol=1e-9, err_msg=msg)

    # scalers (0 -> NaN masking inside)
    flat = coords.reshape(-1, 2)
    for strategy in ("zero_one", "three_stds", "robust"):
        if strategy == "robust" and len(flat) < 4:
            continue
        ref_out, ref_sc = ref_data.scale_trajectories(
            flat.copy(), strategy=strategy)
        ours_out, ours_sc = tj.scale_trajectories(
            flat.copy(), strategy=strategy)
        # float32 inputs: sklearn/our op orders differ at f32 rounding
        np.testing.assert_allclose(ours_out, ref_out, rtol=2e-5, atol=1e-6,
                                   err_msg=f"{msg} {strategy}",
                                   equal_nan=True)

    # hop-window aggregation at random length/gap (only when windows fit)
    wlen = int(rng.integers(4, 16))
    gap = int(rng.integers(0, 3))
    span = wlen + (wlen - 1) * gap
    if n >= span:
        key = "1-2_0007"
        ref_trs = {key: ref_data.Trajectory(key, frames.copy(), coords.copy())}
        try:
            ref_x, _, (ref_meta, ref_ids), _ = \
                ref_prep.aggregate_rnn_autoencoder_data(
                    ref_trs, input_length=wlen, input_gap=gap, pred_length=0,
                    return_ids=True)
        except IndexError:
            # The reference's own id bookkeeping (preprocessing.py 'added'
            # lines) indexes frames past the trajectory for some
            # (length, gap) combos; its production path only ever runs
            # gap=0. Assert OUR output stays in-bounds instead.
            ref_x = None
        ours_trs = {key: tj.Trajectory(key, frames.copy(), coords.copy())}
        ours_x, ours_meta, ours_ids = tj.aggregate_windows(ours_trs, wlen, gap)
        if ref_x is not None:
            np.testing.assert_allclose(ours_x, ref_x, err_msg=msg)
            assert ours_meta == ref_meta, msg
            np.testing.assert_allclose(np.asarray(ours_ids),
                                       np.asarray(ref_ids), err_msg=msg)
        else:
            ids = np.asarray(ours_ids)
            if ids.size:
                assert ids.min() >= frames.min() and ids.max() <= frames.max(), msg

    # short-trajectory filter agrees
    thr = int(rng.integers(2, 30))
    ref_kept = set(ref_prep.remove_short_trajectories(
        {str(i): ref_data.Trajectory(f"1-1_{i:04d}", frames.copy(),
                                     coords.copy())
         for i in range(2)}, input_length=thr, input_gap=0, pred_length=0))
    ours_kept = set(tj.remove_short_trajectories(
        {str(i): tj.Trajectory(f"1-1_{i:04d}", frames.copy(), coords.copy())
         for i in range(2)}, input_length=thr, input_gap=0))
    assert ref_kept == ours_kept, msg
