"""Augmentation toolbox: shape/semantic checks + parity with the reference's
deterministic pieces."""

import numpy as np
import pytest

from coskad_tpu.data import augment


@pytest.fixture
def pose(rng):
    return rng.normal(size=(2, 12, 17))


def test_temporal_crop_shape_and_content(pose, rng):
    out = augment.temporal_crop(pose, 6, rng)
    assert out.shape == pose.shape
    # crop windows come from the reflection-padded sequence
    pad = 12 // 6
    padded = np.concatenate(
        [pose[:, :pad][:, ::-1], pose, pose[:, -pad:][:, ::-1]], axis=1
    )
    found = any(
        np.allclose(out, padded[:, s : s + 12]) for s in range(2 * pad + 1)
    )
    assert found


def test_batched_temporal_crop_matches_host(pose):
    import jax.numpy as jnp

    batch = np.stack([pose, pose * 2])
    starts = np.array([0, 3])
    out = np.asarray(
        augment.batched_temporal_crop(jnp.asarray(batch), jnp.asarray(starts))
    )
    pad = 2
    for i, s in enumerate(starts):
        padded = np.concatenate(
            [batch[i][:, :pad][:, ::-1], batch[i], batch[i][:, -pad:][:, ::-1]],
            axis=1,
        )
        np.testing.assert_allclose(out[i], padded[:, s : s + 12], rtol=1e-6)


def test_time_flip(pose):
    rng = np.random.default_rng(1)
    flipped = augment.random_time_flip(pose, p=1.1, rng=rng)
    np.testing.assert_allclose(flipped, pose[:, ::-1])


def test_axis_mask(pose):
    out = augment.axis_mask(pose, p=1.1, axis=0)
    assert np.all(out[0] == 0) and np.any(out[1] != 0)


def test_gaussian_blur_matches_reference_kernel(pose):
    """Fixed sigma: our temporal blur equals the reference's conv2d with the
    unnormalized kernel."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    sigma, kernel = 1.3, 15
    radius = kernel // 2
    idx = np.arange(-radius, radius + 1)
    k = np.exp(-(idx**2) / (2 * sigma**2))

    class FixedRng:
        def random(self):
            return 0.0  # always apply

        def uniform(self, a, b):
            return sigma

    ours = augment.gaussian_blur(pose, kernel=kernel, rng=FixedRng())

    w = torch.from_numpy(k).double()[None, None, None, :].repeat(2, 1, 1, 1)
    x = torch.from_numpy(pose).permute(0, 2, 1).unsqueeze(0)  # 1,C,V,T
    ref = F.conv2d(x, w, padding=(0, radius), groups=2)
    ref = ref.squeeze(0).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_strong_augment_runs(pose, rng):
    out = augment.strong_augment(pose, rng=rng)
    assert out.shape == pose.shape
    assert np.isfinite(out).all()


def test_process_stream_motion_and_bone(rng):
    data = rng.normal(size=(4, 3, 10, 25, 1))
    motion = augment.process_stream(data, "motion")
    np.testing.assert_allclose(motion[:, :, :-1], data[:, :, 1:] - data[:, :, :-1])
    np.testing.assert_allclose(motion[:, :, -1], 0)
    bone = augment.process_stream(data, "bone")
    np.testing.assert_allclose(
        bone[:, :, :, 0], data[:, :, :, 0] - data[:, :, :, 1]
    )  # bone (1,2)
    assert augment.process_stream(data, "3s").shape[1] == 9


def test_resample_changes_length(pose, rng):
    pytest.importorskip("scipy")
    out = augment.resample(pose, rng)
    assert out.shape[0] == 2 and out.shape[2] == 17
    assert 0.7 * 12 <= out.shape[1] <= 1.3 * 12 + 1


def test_limbs_mask(rng):
    data = rng.normal(size=(2, 10, 25)) + 10
    out = augment.limbs_mask(data, p=1.1, rng=np.random.default_rng(0))
    dropped = (out == 0).all(axis=(0, 1))
    assert dropped.sum() == 8
