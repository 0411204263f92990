"""Fused on-device augmentation kernel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.data.transforms import (
    AugmentConfig,
    augment_batch,
    eval_preprocess_batch,
)

CFG = AugmentConfig(out_size=32, blur_ksize=7)


def _batch(seed=0, B=2, F=3, H=48, W=48):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, size=(B, F, H, W, 3), dtype=np.uint8)
    annots = rng.integers(0, 4, size=(B, F, H, W), dtype=np.uint8)
    return jnp.asarray(frames), jnp.asarray(annots)


def test_shapes_and_dtype():
    frames, annots = _batch()
    out, ann = augment_batch(jax.random.PRNGKey(0), frames, annots, CFG)
    assert out.shape == (2, 3, 32, 32, 3)
    assert ann.shape == (2, 3, 32, 32)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_deterministic_under_key():
    frames, annots = _batch()
    o1, a1 = augment_batch(jax.random.PRNGKey(7), frames, annots, CFG)
    o2, a2 = augment_batch(jax.random.PRNGKey(7), frames, annots, CFG)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3, _ = augment_batch(jax.random.PRNGKey(8), frames, annots, CFG)
    assert not np.array_equal(np.asarray(o1), np.asarray(o3))


def test_clip_consistency():
    """The same geometric params must apply to every frame of a clip: a
    static scene must stay static after augmentation."""
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
    frames = jnp.asarray(np.broadcast_to(frame, (1, 4, 48, 48, 3)))
    annots = jnp.zeros((1, 4, 48, 48), jnp.uint8)
    out, _ = augment_batch(jax.random.PRNGKey(3), frames, annots, CFG)
    out = np.asarray(out)
    for f in range(1, 4):
        np.testing.assert_allclose(out[0, 0], out[0, f], atol=1e-5)


def test_annotation_geometric_alignment():
    """Annotations follow the same crop+flip as frames: encode the annotation
    pattern into the image and check they stay aligned."""
    ann_pattern = np.zeros((48, 48), np.uint8)
    ann_pattern[:, 24:] = 1
    frames = np.zeros((1, 2, 48, 48, 3), np.uint8)
    frames[0, :, :, 24:, :] = 255
    cfg = AugmentConfig(
        out_size=32, jitter_p=0.0, grayscale_p=0.0, blur_p=0.0,
        mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
    )
    annots = jnp.asarray(np.broadcast_to(ann_pattern, (1, 2, 48, 48)))
    for seed in range(5):
        out, ann = augment_batch(jax.random.PRNGKey(seed), jnp.asarray(frames), annots, cfg)
        img_side = np.asarray(out)[0, 0, :, :, 0] > 0.5
        ann_side = np.asarray(ann)[0, 0] == 1
        agree = (img_side == ann_side).mean()
        assert agree > 0.97, f"seed {seed}: {agree}"


def test_annotations_preserve_label_set():
    frames, annots = _batch()
    _, ann = augment_batch(jax.random.PRNGKey(0), frames, annots, CFG)
    assert set(np.unique(np.asarray(ann))) <= set(np.unique(np.asarray(annots)))


def test_no_annotations_path():
    frames, _ = _batch()
    out, ann = augment_batch(jax.random.PRNGKey(0), frames, None, CFG, with_annotations=False)
    assert ann is None
    assert out.shape == (2, 3, 32, 32, 3)


def test_normalization_statistics():
    """With photometric/geometric randomness off, output = (x/255 - mean)/std."""
    cfg = AugmentConfig(
        out_size=48, crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0),
        hflip_p=0.0, jitter_p=0.0, grayscale_p=0.0, blur_p=0.0,
    )
    frames = jnp.full((1, 1, 48, 48, 3), 128, jnp.uint8)
    out, _ = augment_batch(jax.random.PRNGKey(0), frames, None, cfg, with_annotations=False)
    want = (128 / 255 - np.asarray(cfg.mean)) / np.asarray(cfg.std)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 24, 24], want, atol=1e-5)


def test_grayscale_equalizes_channels():
    cfg = AugmentConfig(
        out_size=32, jitter_p=0.0, grayscale_p=1.0, blur_p=0.0,
        mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
    )
    frames, _ = _batch()
    out, _ = augment_batch(jax.random.PRNGKey(0), frames, None, cfg, with_annotations=False)
    o = np.asarray(out)
    np.testing.assert_allclose(o[..., 0], o[..., 1], atol=1e-5)
    np.testing.assert_allclose(o[..., 1], o[..., 2], atol=1e-5)


def test_eval_preprocess():
    frames = jnp.full((2, 64, 64, 3), 255, jnp.uint8)
    out = eval_preprocess_batch(frames, out_size=32)
    assert out.shape == (2, 32, 32, 3)
    want = (1.0 - 0.485) / 0.228
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), want, atol=1e-4)


def test_random_rotation_matches_scipy():
    """Arbitrary-angle RandomRotation (reference video_transformations.py:
    517-556): bilinear frames + nearest annotations, one angle per clip,
    validated against scipy.ndimage.rotate."""
    from scipy import ndimage

    from timetuning_tpu.data.transforms import random_rotation

    rng = np.random.default_rng(0)
    clip = rng.random((3, 20, 24, 3)).astype(np.float32)
    ann = rng.integers(0, 4, size=(3, 20, 24)).astype(np.uint8)
    key = jax.random.PRNGKey(3)
    frames, ann_out = jax.jit(
        lambda k, c, a: random_rotation(k, c, 40.0, a)
    )(key, jnp.asarray(clip), jnp.asarray(ann))

    angle_deg = float(
        jax.random.uniform(key, (), minval=-40.0, maxval=40.0)
    )
    # interior comparison: scipy and jax differ in how partially
    # out-of-bounds edge samples mix with the constant fill
    sl = np.s_[4:-4, 4:-4]
    for f in range(3):
        want = ndimage.rotate(clip[f], angle_deg, reshape=False, order=1,
                              mode="constant", axes=(0, 1))
        np.testing.assert_allclose(np.asarray(frames[f])[sl], want[sl],
                                   rtol=1e-4, atol=1e-4)
        want_a = ndimage.rotate(ann[f].astype(np.float32), angle_deg,
                                reshape=False, order=0, mode="constant")
        np.testing.assert_array_equal(np.asarray(ann_out[f])[sl],
                                      want_a.astype(np.uint8)[sl])
    # annotation values stay in the original label set (nearest resampling)
    assert set(np.unique(np.asarray(ann_out))) <= set(np.unique(ann)) | {0}


def test_random_resize_is_scale_dependent():
    """random_resize now actually resamples by the sampled scale
    (reference RandomResize, video_transformations.py:322-349)."""
    from timetuning_tpu.data.transforms import random_resize

    clip = jnp.ones((2, 32, 32, 3))
    small = random_resize(jax.random.PRNGKey(0), clip, (0.5, 0.5))
    assert small.shape == (2, 16, 16, 3)
    big = random_resize(jax.random.PRNGKey(0), clip, (2.0, 2.0))
    assert big.shape == (2, 64, 64, 3)
    # sampled scale in range, deterministic per key
    a = random_resize(jax.random.PRNGKey(1), clip, (0.5, 2.0))
    b = random_resize(jax.random.PRNGKey(1), clip, (0.5, 2.0))
    assert a.shape == b.shape and 16 <= a.shape[1] <= 64
    fixed = random_resize(jax.random.PRNGKey(1), clip, (0.5, 2.0), out_size=24)
    assert fixed.shape == (2, 24, 24, 3)
