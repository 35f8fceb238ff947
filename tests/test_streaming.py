"""Streaming scorer: online pushes must reproduce offline clip scoring.

The contract under test (coskad_tpu/streaming.py): feeding a clip frame by
frame through StreamingScorer.push and calling flush() returns the SAME
per-frame scores as AnomalyScorer.score_clip_json on that clip's JSON —
the windowing quirks (stride-1 starts, <=2-missing continuity, the
emit-only-after-a-later-row rule, data/windows.py:79-95), preprocessing,
and aggregation all included — regardless of how the device batches split.
"""

import json
import os

import numpy as np
import pytest

from fixtures import make_synthetic_dataset


def _trained_scorer(tmp_path, epochs=1):
    from coskad_tpu.cli import train as train_cli
    from coskad_tpu.serve import AnomalyScorer

    cfg_path = make_synthetic_dataset(str(tmp_path), n_train_clips=1,
                                      n_test_clips=1)
    train_cli.main(["--config", cfg_path, "--epochs", str(epochs)])
    ckpt = os.path.join(str(tmp_path), "checkpoints", "Synthetic", "smoke",
                        "best.ckpt")
    scorer = AnomalyScorer.from_checkpoint(ckpt)
    clip_json = os.path.join(
        str(tmp_path), "pose", "testing",
        sorted(os.listdir(os.path.join(str(tmp_path), "pose", "testing")))[0])
    return scorer, clip_json


def _stream_clip(stream, clip_json):
    """Re-feed a clip JSON frame by frame (ascending keys), the union of
    all persons present at each frame — the live-camera access pattern."""
    clip = json.load(open(clip_json))
    by_frame = {}
    for pid, traj in clip.items():
        for fk, entry in traj.items():
            kp = np.asarray(entry["keypoints"], np.float64).reshape(-1, 3)
            by_frame.setdefault(int(fk), {})[int(pid)] = kp
    for fk in sorted(by_frame):
        stream.push(fk, by_frame[fk])
    return stream


def test_streaming_flush_matches_offline(tmp_path):
    from coskad_tpu.streaming import StreamingScorer

    scorer, clip_json = _trained_scorer(tmp_path)
    n_frames = 64
    offline = scorer.score_clip_json(clip_json, n_frames=n_frames)

    stream = _stream_clip(StreamingScorer(scorer, min_batch=256), clip_json)
    online = stream.flush(n_frames=n_frames, smooth=True)
    np.testing.assert_allclose(online, offline, rtol=0, atol=1e-6)
    assert stream.n_windows_pending == 0 and stream.n_windows_scored > 0


def test_streaming_batch_split_is_score_invariant(tmp_path):
    """A pathological min_batch (frequent small device calls) must produce
    the same scores as one big batch: eval-mode BN uses running stats and
    every preprocessing step is window-local, so batch composition is not
    allowed to leak into values."""
    from coskad_tpu.streaming import StreamingScorer

    scorer, clip_json = _trained_scorer(tmp_path)
    big = _stream_clip(StreamingScorer(scorer, min_batch=10_000), clip_json)
    tiny = _stream_clip(StreamingScorer(scorer, min_batch=7), clip_json)
    np.testing.assert_allclose(
        tiny.flush(n_frames=64, smooth=False),
        big.flush(n_frames=64, smooth=False), rtol=0, atol=1e-6)


def test_scores_so_far_prefix_is_final(tmp_path):
    """Provisional scores for frames comfortably behind the stream head
    must already equal the end-of-stream (unsmoothed) scores when every
    person keeps streaming (no reappearance edge case)."""
    from coskad_tpu.streaming import StreamingScorer

    scorer, clip_json = _trained_scorer(tmp_path)
    stream = StreamingScorer(scorer, min_batch=16)
    clip = json.load(open(clip_json))
    by_frame = {}
    for pid, traj in clip.items():
        for fk, entry in traj.items():
            kp = np.asarray(entry["keypoints"], np.float64).reshape(-1, 3)
            by_frame.setdefault(int(fk), {})[int(pid)] = kp
    keys = sorted(by_frame)
    cut = len(keys) * 2 // 3
    for fk in keys[:cut]:
        stream.push(fk, by_frame[fk])
    seen = keys[cut - 1]
    provisional = stream.scores_so_far(smooth=False)
    for fk in keys[cut:]:
        stream.push(fk, by_frame[fk])
    final = stream.flush(smooth=False)  # full stream length (covered keys)
    horizon = min(seen - scorer.cfg.data.seg_len - 2, len(provisional),
                  len(final))
    assert horizon > 8  # the prefix being compared is non-trivial
    np.testing.assert_allclose(
        provisional[:horizon], final[:horizon], rtol=0, atol=1e-6)


def test_streaming_guards(tmp_path):
    """Robust normalization without a fitted scaler refuses (offline falls
    back to fitting on the whole clip — unreproducible from a stream), and
    non-increasing frame keys per person are rejected."""
    import dataclasses

    from coskad_tpu.serve import AnomalyScorer
    from coskad_tpu.streaming import StreamingScorer

    scorer, _ = _trained_scorer(tmp_path)
    cfg_rb = dataclasses.replace(
        scorer.cfg,
        data=dataclasses.replace(scorer.cfg.data,
                                 normalization_strategy="robust"))
    bare = AnomalyScorer(cfg_rb, scorer.state, trainer=scorer.trainer)
    with pytest.raises(ValueError, match="fitted scaler"):
        StreamingScorer(bare)

    stream = StreamingScorer(scorer)
    kp = np.zeros((17, 3))
    with pytest.raises(ValueError, match="1-based"):
        stream.push(0, {1: kp})  # 0-based keys would shift every score
    stream.push(5, {1: kp})
    with pytest.raises(ValueError, match="strictly increasing"):
        stream.push(5, {1: kp})

    # Atomic push: a rejected frame must not have mutated ANY person, so
    # the corrected frame is retryable for everyone it contained.
    stream.push(6, {2: kp})
    with pytest.raises(ValueError, match="strictly increasing"):
        stream.push(6, {1: kp, 2: kp, 3: kp})  # person 2 duplicates key 6
    stream.push(7, {1: kp, 2: kp, 3: kp})  # retry succeeds for all three
    assert stream._persons[1].last_key() == 7
    assert stream._persons[3].count == 1  # person 3 was NOT double-added


def test_person_history_is_trimmed(tmp_path):
    """Rows that can no longer appear in any future window are freed as
    the stream advances (clip-scoped memory contract, streaming.py module
    docstring) without perturbing window emission or scores."""
    from coskad_tpu.streaming import StreamingScorer

    scorer, clip_json = _trained_scorer(tmp_path)
    stream = _stream_clip(StreamingScorer(scorer, min_batch=64), clip_json)
    seg = scorer.cfg.data.seg_len
    for pid, person in stream._persons.items():
        assert person.base > 0, f"person {pid} history never trimmed"
        # Retained suffix stays bounded by the trim slack + live window span.
        assert len(person.rows) <= 64 + seg + 2
    # Trimming must not have changed the result (flush still exact).
    offline = scorer.score_clip_json(clip_json, n_frames=64)
    np.testing.assert_allclose(stream.flush(n_frames=64, smooth=True),
                               offline, rtol=0, atol=1e-6)


def test_rolling_gc_equals_unbounded_and_offline(tmp_path):
    """horizon mode with no late data must reproduce the session-scoped
    stream AND offline score_clip_json exactly, while actually freezing
    (GC firing) along the way."""
    from coskad_tpu.streaming import StreamingScorer

    scorer, clip_json = _trained_scorer(tmp_path)
    n_frames = 420
    offline = scorer.score_clip_json(clip_json, n_frames=n_frames)

    stream = _stream_clip(
        StreamingScorer(scorer, min_batch=32, horizon=48), clip_json)
    assert stream._frozen_upto > 200  # the watermark really advanced
    rolled = stream.flush(n_frames=n_frames, smooth=True)
    np.testing.assert_allclose(rolled, offline, rtol=0, atol=1e-6)


def test_rolling_gc_bounds_live_state(tmp_path):
    """A long feed with person turnover: live state (window scores +
    person streams) must stay O(actors x horizon) while the total windows
    scored grows with the stream — the 24/7 mode the session-scoped
    design admitted it could not serve (VERDICT r4 weak #4)."""
    from coskad_tpu.streaming import StreamingScorer

    scorer, _ = _trained_scorer(tmp_path)
    rng = np.random.default_rng(0)
    stream = StreamingScorer(scorer, min_batch=64, horizon=60)
    n_frames, n_live = 2000, 3
    bases = {}
    max_scores = max_persons = 0
    for f in range(1, n_frames + 1):
        # person turnover: every 400 frames the tracker assigns fresh ids
        gen = f // 400
        poses = {}
        for k in range(n_live):
            pid = gen * 10 + k
            if pid not in bases:
                bases[pid] = rng.uniform(150, 500, size=(17, 2))
            bases[pid] = bases[pid] + rng.normal(scale=1.5, size=(17, 2))
            poses[pid] = np.concatenate(
                [bases[pid], rng.uniform(0.5, 1.0, size=(17, 1))], axis=-1)
        stream.push(f, poses)
        max_scores = max(max_scores, stream.n_windows_scored
                         + stream.n_windows_pending)
        max_persons = max(max_persons, len(stream._persons))
    # Unbounded mode would hold ~ (2000 - 12) * 3 ≈ 6000 window scores and
    # every person id ever seen; rolling GC keeps both at horizon scale.
    assert max_scores < 600, max_scores
    assert max_persons <= 2 * n_live, max_persons
    assert stream._frozen_upto > 1500
    out = stream.flush(n_frames=n_frames, smooth=True)
    assert out.shape == (n_frames,) and np.isfinite(out).all()
    # Scores exist across the whole stream, not just the live tail.
    assert (out[:500] > 0).any() and (out[-200:] > 0).any()


def test_rolling_gc_guards(tmp_path):
    """horizon below the emission lag, or combined with pad_size, cannot
    silently mis-score — both are rejected at construction."""
    import dataclasses

    from coskad_tpu.streaming import StreamingScorer

    scorer, _ = _trained_scorer(tmp_path)
    with pytest.raises(ValueError, match="seg_len"):
        StreamingScorer(scorer, horizon=10)
    old_eval = scorer.cfg.eval
    scorer.cfg.eval = dataclasses.replace(old_eval, pad_size=5)
    try:
        with pytest.raises(ValueError, match="pad_size"):
            StreamingScorer(scorer, horizon=100)
    finally:
        scorer.cfg.eval = old_eval


def test_flush_empty_stream_returns_empty(tmp_path):
    """Flushing a stream that never received a frame must return an empty
    score vector — NOT spin forever: score_process on a zero-length vector
    previously infinite-looped in _reflect_pad while holding the serving
    device lock (found by scripts/soak_server.py, round 5)."""
    from coskad_tpu.streaming import StreamingScorer

    scorer, _ = _trained_scorer(tmp_path)
    for kwargs in ({}, {"horizon": 64}):
        stream = StreamingScorer(scorer, **kwargs)
        out = stream.flush(smooth=True)
        assert out.shape == (0,)
        assert stream.scores_so_far(smooth=True).shape == (0,)
        # n_frames override still works on an empty stream
        out = StreamingScorer(scorer, **kwargs).flush(n_frames=7, smooth=True)
        assert out.shape == (7,) and (out == 0).all()


def test_rolling_gc_delayed_person_windows_apply_in_full(tmp_path):
    """A person absent for a stretch while the stream head advances emits
    their pre-gap TAIL windows only once a later row arrives (the offline
    final-window quirk). Those delayed windows can reach back a full
    window span behind the late-drop watermark; the freeze boundary must
    LAG the watermark by that span so they are applied IN FULL — the
    naive boundary (freeze at the watermark itself) half-applies them
    against the frozen prefix, silently losing their early frames'
    contributions (round-5 review finding).

    Deterministic stub scorer (score = encoded per-window identity, the
    delayed person strictly dominant) so the loss cannot hide behind
    model-score near-ties or the actor-max; contract: rolling-GC flush ==
    session-scoped (unbounded) flush, exactly."""
    import dataclasses
    import types

    from helpers import tiny_config

    from coskad_tpu.streaming import StreamingScorer

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, seg_len=12,
                                      normalize_pose=False))

    class StubScorer:
        """Scores a window by its content: person id rides in the conf
        channel, the start key in the x channel -> every window's score is
        distinct and person B's always dominate the actor-max."""

        def __init__(self):
            self.cfg = cfg
            self.scaler = None

        def preprocess_windows(self, raw):
            return raw

        def score_windows(self, windows):
            person = windows[:, 0, 0, 2]          # conf channel, frame 0
            start_key = windows[:, 0, 0, 0]       # x channel, frame 0
            return np.where(person > 1.5, 100.0 + start_key,
                            1.0 + 0.001 * start_key)

    def push_all(stream):
        for f in range(1, 301):
            poses = {}
            kp_a = np.full((17, 3), 1.0)
            kp_a[:, 0] = f
            poses[1] = kp_a
            if not (151 <= f <= 160):  # B absent 10 frames (> 2-missing)
                kp_b = np.full((17, 3), 2.0)
                kp_b[:, 0] = f
                poses[2] = kp_b
            stream.push(f, poses)
        return stream

    unbounded = push_all(StreamingScorer(StubScorer(), min_batch=1))
    rolled = push_all(StreamingScorer(StubScorer(), min_batch=1, horizon=15))
    assert rolled._frozen_upto > 200  # GC really ran hard
    expected = unbounded.flush(n_frames=300, smooth=True)
    got = rolled.flush(n_frames=300, smooth=True)
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-9)
    # B's delayed tail windows (emitted at reappearance, spanning back
    # behind the watermark) really existed: frames just before the gap
    # carry B-range scores in BOTH modes.
    raw = unbounded.flush(n_frames=300, smooth=False)
    assert raw[145] > 100.0
