"""Serving API: load a checkpoint once, score pose streams forever.

The reference has no inference path besides re-running its eval script; this
module is the production-facing entry point the brief calls for:

    scorer = AnomalyScorer.from_checkpoint("exp/UBnormal/run/best.ckpt")
    scores = scorer.score_windows(windows)         # [B] anomaly scores
    frames = scorer.score_clip_json("01_0014.json")  # per-frame scores

Scoring is a single jitted program (embed + geometry distance) with
fixed-size batching and tail padding; clip scoring reuses the exact
aggregation pipeline of offline eval (actor-max, shift + Gaussian smoothing),
minus ground truth.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from .config import Config
from .data.alphapose import parse_clip_json
from .data.normalize import normalize
from .data.windows import SegmentDataset, keypoints17_to_coco18, segment_clip
from .score.frames import actor_frame_scores
from .score.smoothing import score_process
from .train import checkpoint
from .train.loop import Trainer


def config_from_snapshot(path: str) -> Config:
    """Rebuild a Config from the '<ckpt>.config.json' snapshot that
    train/checkpoint.py writes beside every checkpoint."""
    from .config import DataConfig, EvalConfig, ModelConfig, OptConfig, RunConfig

    with open(path) as f:
        raw = json.load(f)

    def build(cls, section):
        fields = {f.name for f in cls.__dataclass_fields__.values()}
        kwargs = {}
        for k, v in section.items():
            if k not in fields:
                continue
            kwargs[k] = tuple(v) if isinstance(v, list) else v
        return cls(**kwargs)

    return Config(
        model=build(ModelConfig, raw["model"]),
        data=build(DataConfig, raw["data"]),
        opt=build(OptConfig, raw["opt"]),
        eval=build(EvalConfig, raw["eval"]),
        run=build(RunConfig, raw["run"]),
    )


class AnomalyScorer:
    """Checkpoint-backed scorer for one trained COSKAD variant."""

    def __init__(self, cfg: Config, state, trainer: Optional[Trainer] = None):
        self.cfg = cfg
        # A Trainer gives us the jitted embed/score machinery; feed it a
        # minimal placeholder dataset (replaced per scoring call).
        if trainer is None:
            dummy = SegmentDataset(
                data=np.zeros(
                    (1, cfg.model.num_coords + 1, cfg.data.seg_len, cfg.data.n_joints),
                    np.float32,
                ),
                meta=np.zeros((1, 4), np.int64),
                frame_ids=np.zeros((1, cfg.data.seg_len), np.int32),
                num_transform=cfg.data.num_transform,
            )
            trainer = Trainer(cfg, dummy)
        self.trainer = trainer
        self.state = state

    # ------------------------------------------------------------ loading

    @classmethod
    def from_checkpoint(
        cls, ckpt_path: str, cfg: Optional[Config] = None
    ) -> "AnomalyScorer":
        if cfg is None:
            cfg = config_from_snapshot(ckpt_path + ".config.json")
        tmp = cls(cfg, None)
        template = tmp.trainer.init_state()
        state, scaler, _ = checkpoint.restore(ckpt_path, template)
        tmp.state = tmp.trainer.attach_state(state)
        tmp.scaler = scaler
        return tmp

    # ------------------------------------------------------------ scoring

    def score_windows(self, windows: np.ndarray) -> np.ndarray:
        """[B, C, T, V] normalized windows -> [B] anomaly scores in the
        variant's geometry (higher = more anomalous).

        Windows are zero-padded to GEOMETRIC buckets (batch_size * 2^k) so
        the number of distinct compiled programs is O(log max_n) over the
        server's lifetime, not one per distinct request size — arbitrary
        request-size mixes (live streams drain variable window counts)
        otherwise trigger a compile per new size while holding the serving
        device lock (observed: minutes-long request stalls on a cold
        cache, scripts/soak_server.py). Waste is bounded by 2x."""
        n = len(windows)
        bs = self.cfg.data.batch_size
        bucket = bs
        while bucket < n:
            bucket *= 2
        padded = np.zeros((bucket, *np.shape(windows)[1:]), np.float32)
        padded[:n] = windows
        ds = SegmentDataset(
            data=padded,
            meta=np.zeros((bucket, 4), np.int64),
            frame_ids=np.zeros((bucket, self.cfg.data.seg_len), np.int32),
            num_transform=1,
        )
        data = self.trainer._device_data(ds)
        # One scanned dispatch: embed + variant distance fused (score_all).
        scores, _rec = self.trainer.score_all(self.state, ds, data)
        return scores[:n]

    def preprocess_windows(self, raw: np.ndarray) -> np.ndarray:
        """Raw keypoint windows [N, T, V, F] -> model-ready [N, C, T, V]:
        17->18 conversion, headless crop, the config's normalization. The
        ONE preprocessing path for clip JSONs (score_clip_json) and live
        streams (streaming.StreamingScorer) — their bit-exact score parity
        depends on sharing it."""
        d = self.cfg.data
        if d.kp18_format and raw.shape[-2] == 17:
            raw = keypoints17_to_coco18(raw)
        if d.headless:
            raw = raw[:, :, :14]
        if d.normalize_pose:
            if d.normalization_strategy == "robust":
                from .data.normalize import normalize_robust

                scaler = getattr(self, "scaler", None)
                if scaler is None:
                    # Fitting quantiles on each REQUEST's windows would
                    # score every batch in its own coordinate system (a
                    # near-duplicate window scores differently depending on
                    # what shares its request) — the same hazard streaming
                    # hard-errors on (streaming.py). Round-5 review.
                    raise ValueError(
                        "robust normalization needs the training-fitted "
                        "scaler: load the checkpoint that embeds it, or "
                        "re-convert with --scaler robust.pkl"
                    )
                raw, _ = normalize_robust(
                    raw, vid_res=d.vid_res, symm_range=d.symm_range,
                    scaler=scaler,
                )
            else:
                raw, _ = normalize(
                    raw, d.normalization_strategy, vid_res=d.vid_res,
                    symm_range=d.symm_range, sub_mean=d.sub_mean,
                )
        return np.transpose(raw, (0, 3, 1, 2)).astype(np.float32)

    def score_clip_json(
        self, path: str, n_frames: Optional[int] = None, smooth: bool = True
    ) -> np.ndarray:
        """AlphaPose clip JSON -> per-frame anomaly scores.

        Applies the training normalization, windows each tracked person at
        stride 1, scores all windows, scatters to frames (mean per actor,
        max over actors) and optionally applies the shift+smooth
        post-processing — the same pipeline as offline eval without GT.
        """
        d = self.cfg.data
        trajectories = parse_clip_json(path, d.kp_threshold)
        data, meta, ids = segment_clip(trajectories, 0, 0, d.start_offset, 1, d.seg_len)
        if len(meta) == 0:
            # No tracked person in the clip: score 0 everywhere, like the
            # offline aggregation's empty-clip branch (score/aggregate.py).
            if n_frames is None:
                raise ValueError(
                    f"clip {path!r} has no tracked people; pass n_frames to "
                    "get an all-zero score vector"
                )
            return np.zeros(n_frames)
        windows = self.preprocess_windows(data)
        scores = self.score_windows(windows)

        meta = np.asarray(meta)
        ids = np.asarray(ids)
        if n_frames is None:
            n_frames = int(ids.max())
        actors = np.unique(meta[:, 2])
        dense = np.searchsorted(actors, meta[:, 2])
        per_actor = actor_frame_scores(scores, dense, ids, n_frames, len(actors))
        if self.cfg.eval.pad_size != -1:
            from .score.frames import pad_scores

            per_actor = np.stack([
                pad_scores(row, n_frames, self.cfg.eval.pad_size)
                for row in per_actor
            ])
        clip_score = per_actor.max(axis=0)
        if smooth:
            clip_score = score_process(clip_score)
        return clip_score
