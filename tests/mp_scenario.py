"""Shared scenario for the multi-process equality test.

Builds a deterministic flagship-config training run (synthetic windows;
mahalanobis static center so the inv-cov init path is covered; an explicit
score_all pass so the fused scoring scan's cross-host fetch is covered) over
a mesh spanning ALL global devices. Run by both the 2-process workers
(4 devices each, tests/mp_worker.py) and the single-process 8-device
baseline (tests/test_multiprocess.py); results must match.
"""

import dataclasses

import numpy as np


def run_scenario():
    import jax

    from coskad_tpu.config import Config, DataConfig, ModelConfig, OptConfig
    from coskad_tpu.data.windows import SegmentDataset
    from coskad_tpu.parallel import create_mesh
    from coskad_tpu.train.loop import Trainer

    cfg = Config(
        model=ModelConfig(
            variant="euclidean_static",
            distance="mahalanobis",
            num_coords=2,
            channels=(32, 16, 32),
            h_dim=64,
            latent_dim=16,
            projector="linear",
        ),
        data=DataConfig(seg_len=12, kp18_format=False, batch_size=32,
                        num_transform=1),
        opt=OptConfig(lr=1e-3, epochs=2, validation=False),
    )
    rng = np.random.default_rng(0)
    n = 96
    data = rng.normal(size=(n, 2, 12, 17)).astype(np.float32)
    # The last 8 windows are genuine outliers (3x amplitude): the score
    # ordering contract in test_multiprocess.py needs real signal, not
    # near-ties among iid-noise windows.
    data[-8:] *= 3.0
    ds = SegmentDataset(
        data=data,
        meta=np.tile([1, 1, 1, 1], (n, 1)).astype(np.int64),
        frame_ids=np.tile(np.arange(1, 13), (n, 1)).astype(np.int32),
        num_transform=1,
    )
    mesh = create_mesh()  # dp over ALL global devices
    trainer = Trainer(cfg, ds, mesh=mesh)
    state, history = trainer.fit(epochs=2)
    # score_all exercises the fused scoring scan + the cross-host fetch.
    scores, _ = trainer.score_all(state, ds, trainer.train_data)
    return {
        "process_count": jax.process_count(),
        "mesh_shape": dict(mesh.shape),
        "loss": [float(x) for x in history["loss"]],
        "center": np.asarray(state.center).tolist(),
        "inv_cov_trace": float(np.trace(np.asarray(state.inv_cov))),
        "scores_head": [float(s) for s in scores[:8]],
        "scores": [float(s) for s in scores],
        "scores_sum": float(np.sum(scores)),
    }
