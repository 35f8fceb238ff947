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
