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
    """The same geometric/photometric params must apply to every frame of a
    clip: a static scene must stay static after augmentation. Blur is
    excluded — the reference itself samples a fresh radius per frame
    (video_transformations.py:640), so blurred frames legitimately differ."""
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
    frames = jnp.asarray(np.broadcast_to(frame, (1, 4, 48, 48, 3)))
    annots = jnp.zeros((1, 4, 48, 48), jnp.uint8)
    cfg = AugmentConfig(out_size=32, blur_ksize=7, blur_p=0.0)
    out, _ = augment_batch(jax.random.PRNGKey(3), frames, annots, cfg)
    out = np.asarray(out)
    for f in range(1, 4):
        np.testing.assert_allclose(out[0, 0], out[0, f], atol=1e-5)
    # per-frame blur: forced blur on a static clip yields differing frames
    cfg_b = AugmentConfig(out_size=32, blur_ksize=7, blur_p=1.0,
                          blur_sigma=(0.5, 3.0))
    out_b, _ = augment_batch(jax.random.PRNGKey(3), frames, annots, cfg_b)
    out_b = np.asarray(out_b)
    assert not np.allclose(out_b[0, 0], out_b[0, 1], atol=1e-5)


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


def test_rrc_distribution_matches_torchvision_nonsquare():
    """With src_sizes, the RRC box is sampled in the reference's short-side
    Resize geometry: the (i, j, h, w) distribution must match torchvision
    RandomResizedCrop.get_params on the aspect-preserved non-square image
    (VERDICT r2 missing #3; reference video_transformations.py:446-490)."""
    from timetuning_tpu.data.transforms import (
        _sample_rrc_box,
        reference_resize_geometry,
    )

    cfg = AugmentConfig(out_size=224)
    rh, rw = reference_resize_geometry(480, 854, 224)
    rh, rw = float(rh), float(rw)
    assert (rh, rw) == (224.0, 398.0)  # int(224*854/480) == 398

    N = 20000
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    i, j, h, w = jax.vmap(lambda k: _sample_rrc_box(k, rh, rw, cfg))(keys)
    ours = np.stack([np.asarray(v) for v in (i, j, h, w)])

    # faithful oracle of the reference's get_params (exact code semantics:
    # python random, 10 tries, int rounding, randint inclusive)
    import math
    import random as pyrandom

    prng = pyrandom.Random(0)
    height, width = int(rh), int(rw)

    def ref_params():
        area = height * width
        for _ in range(10):
            target_area = prng.uniform(0.4, 1.0) * area
            aspect_ratio = math.exp(prng.uniform(math.log(3 / 4), math.log(4 / 3)))
            ww = int(round(math.sqrt(target_area * aspect_ratio)))
            hh = int(round(math.sqrt(target_area / aspect_ratio)))
            if 0 < ww <= width and 0 < hh <= height:
                return (prng.randint(0, height - hh),
                        prng.randint(0, width - ww), hh, ww)
        in_ratio = width / height
        if in_ratio < 3 / 4:
            ww, hh = width, int(round(width / (3 / 4)))
        elif in_ratio > 4 / 3:
            hh, ww = height, int(round(height * (4 / 3)))
        else:
            ww, hh = width, height
        return (height - hh) // 2, (width - ww) // 2, hh, ww

    ref = np.asarray([ref_params() for _ in range(N)], dtype=np.float64).T

    for a, b, name, mtol, stol in [
        (ours[0], ref[0], "i", 1.5, 2.0),
        (ours[1], ref[1], "j", 2.5, 3.5),
        (ours[2], ref[2], "h", 2.0, 2.0),
        (ours[3], ref[3], "w", 2.5, 2.5),
    ]:
        assert abs(a.mean() - b.mean()) < mtol, (
            f"{name}: mean {a.mean():.2f} vs torchvision {b.mean():.2f}"
        )
        assert abs(a.std() - b.std()) < stol, (
            f"{name}: std {a.std():.2f} vs torchvision {b.std():.2f}"
        )


def test_src_size_center_crop_geometry():
    """scale=(1,1), ratio=(1,1) on a landscape source forces the reference
    fallback: a centered short-side square crop of the aspect-preserved
    image. The fused kernel must crop exactly that region out of the square
    decode buffer."""
    H = W = 64
    out = 32
    cfg = AugmentConfig(
        out_size=out, crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0),
        hflip_p=0.0, jitter_p=0.0, grayscale_p=0.0, blur_p=0.0,
        mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
    )
    # horizontal gradient: pixel value encodes the ORIGINAL x position
    grad = np.linspace(0.0, 1.0, W, dtype=np.float32)
    frames = np.broadcast_to(
        (grad * 255).astype(np.uint8)[None, None, :, None], (1, 1, H, W, 3)
    )
    src_sizes = jnp.asarray([[480, 854]], jnp.int32)  # landscape native
    o, _ = augment_batch(jax.random.PRNGKey(0), jnp.asarray(frames), None,
                         cfg, with_annotations=False, src_sizes=src_sizes)
    o = np.asarray(o)[0, 0, 0, :, 0]
    # reference geometry: (rh, rw) = (32? no: out=32) → short side 32,
    # rw = int(32*854/480) = 56; fallback center crop 32x32 at j=(56-32)//2…
    # continuous sampler: j = (56-32)/2 = 12 → normalized [12/56, 44/56]
    lo, hi = 12.0 / 56.0, 44.0 / 56.0
    np.testing.assert_allclose(o[0], lo, atol=0.03)
    np.testing.assert_allclose(o[-1], hi, atol=0.03)
    # without src_sizes the whole gradient span [0, 1] survives
    o2, _ = augment_batch(jax.random.PRNGKey(0), jnp.asarray(frames), None,
                          cfg, with_annotations=False)
    o2 = np.asarray(o2)[0, 0, 0, :, 0]
    np.testing.assert_allclose(o2[0], 0.0, atol=0.03)
    np.testing.assert_allclose(o2[-1], 1.0, atol=0.03)


def test_gaussian_blur_per_frame_sigma_and_scaling():
    """Per-frame sigma (reference PIL branch samples a fresh radius per
    frame, video_transformations.py:640) + per-axis buffer/native sigma
    scaling, validated against scipy."""
    from scipy.ndimage import gaussian_filter1d

    from timetuning_tpu.data.transforms import _gaussian_blur

    rng = np.random.default_rng(0)
    x = rng.random((2, 24, 28, 3)).astype(np.float32)
    cfg = AugmentConfig(blur_p=1.0, blur_ksize=23, blur_sigma=(0.8, 2.0))
    key = jax.random.PRNGKey(5)
    sy, sx = 0.7, 0.4
    out = np.asarray(_gaussian_blur(key, jnp.asarray(x), cfg, sy, sx))

    _, ksig = jax.random.split(key)
    sigma = np.asarray(jax.random.uniform(
        ksig, (2,), minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1]
    ))
    assert sigma[0] != sigma[1]
    for f in range(2):
        want = gaussian_filter1d(x[f], sigma[f] * sy, axis=0, mode="mirror",
                                 truncate=11.0 / (sigma[f] * sy))
        want = gaussian_filter1d(want, sigma[f] * sx, axis=1, mode="mirror",
                                 truncate=11.0 / (sigma[f] * sx))
        np.testing.assert_allclose(out[f], want, atol=2e-3)


def test_hue_adjust_matches_matplotlib():
    """_adj_hue (rgb→hsv→shift→rgb with lax.select_n) == matplotlib's
    colorspace round-trip."""
    mpl_colors = pytest.importorskip("matplotlib.colors")

    from timetuning_tpu.data.transforms import _adj_hue

    x = np.random.default_rng(0).random((3, 7, 5, 3)).astype(np.float32)
    for shift in (0.13, -0.2, 0.5):
        got = np.asarray(_adj_hue(jnp.asarray(x), shift))
        hsv = mpl_colors.rgb_to_hsv(x)
        hsv[..., 0] = (hsv[..., 0] + shift) % 1.0
        want = mpl_colors.hsv_to_rgb(hsv)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_photometric_ops_match_pil():
    """brightness/saturation/contrast formulas == PIL ImageEnhance (the
    backend of the torchvision functional ops the reference applies,
    video_transformations.py:738-748), within uint8 quantization."""
    from PIL import Image, ImageEnhance

    from timetuning_tpu.data.transforms import (
        _adj_brightness,
        _adj_contrast,
        _adj_saturation,
    )

    rng = np.random.default_rng(0)
    img_u8 = rng.integers(0, 255, size=(16, 12, 3), dtype=np.uint8)
    x = jnp.asarray(img_u8.astype(np.float32) / 255.0)[None]  # [1, H, W, 3]
    pil = Image.fromarray(img_u8)
    for f in (0.4, 1.0, 1.6):
        got = np.asarray(_adj_brightness(x, f))[0] * 255.0
        want = np.asarray(ImageEnhance.Brightness(pil).enhance(f), np.float32)
        assert np.abs(got - want).max() <= 1.0, f"brightness {f}"

        got = np.asarray(_adj_saturation(x, f))[0] * 255.0
        want = np.asarray(ImageEnhance.Color(pil).enhance(f), np.float32)
        assert np.abs(got - want).max() <= 2.0, f"saturation {f}"

        got = np.asarray(_adj_contrast(x, f))[0] * 255.0
        want = np.asarray(ImageEnhance.Contrast(pil).enhance(f), np.float32)
        # _pil_gray_mean reproduces PIL's integer L + rounded mean exactly;
        # only the per-pixel blend rounding (±0.5) remains
        assert np.abs(got - want).max() <= 1.0, f"contrast {f}"


def test_contrast_mean_matches_pil_exactly():
    """_pil_gray_mean == PIL's ImageStat mean of convert('L'), bit-exact on
    random uint8 images."""
    from PIL import Image, ImageStat

    from timetuning_tpu.data.transforms import _pil_gray_mean

    rng = np.random.default_rng(3)
    for shape in ((24, 17), (48, 96), (5, 255)):
        img_u8 = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
        want = ImageStat.Stat(Image.fromarray(img_u8).convert("L")).mean[0]
        x = jnp.asarray(img_u8.astype(np.float32) / 255.0)[None]
        got = float(np.asarray(_pil_gray_mean(x))[0])
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-3)


def test_contrast_jitter_native_mean_geometry():
    """The reference applies adjust_contrast to the NATIVE aspect-correct
    frame before its short-side Resize (data_loader.py:657-661); here the
    jitter runs on the square decode buffer but blends toward the native
    frame's PIL mean threaded from decode time — the two commute (blend is
    affine, resize is linear), so our buffer output equals the decode-resize
    of PIL's native output at uint8-rounding tolerance on non-square
    inputs."""
    import cv2
    from PIL import Image, ImageEnhance

    from timetuning_tpu.data.datasets import _native_gray_mean
    from timetuning_tpu.data.transforms import _adj_contrast

    rng = np.random.default_rng(7)
    S = 32
    for hw in ((48, 96), (90, 40)):
        # smooth non-square native frame (blur kills resampling aliasing in
        # the comparison path; the mean is threaded so it plays no role)
        native = rng.integers(0, 256, size=hw + (3,), dtype=np.uint8)
        native = cv2.GaussianBlur(native, (7, 7), 2.0)
        mean = _native_gray_mean(native)
        buffer = cv2.resize(native, (S, S), interpolation=cv2.INTER_LINEAR)
        x = jnp.asarray(buffer.astype(np.float32) / 255.0)[None]
        for f in (0.4, 0.9):  # <1: no saturation, the exact-commute regime
            got = np.asarray(
                _adj_contrast(x, f, jnp.asarray([mean], jnp.float32))
            )[0] * 255.0
            want_native = np.asarray(
                ImageEnhance.Contrast(Image.fromarray(native)).enhance(f)
            )
            want = cv2.resize(
                want_native, (S, S), interpolation=cv2.INTER_LINEAR
            ).astype(np.float32)
            # quantization stack-up: PIL rounds native pixels pre-resize
            # (±0.5, preserved through the convex resize), cv2 rounds its
            # uint8 output (±0.5) with 2^-11 fixed-point weights — the two
            # paths round at different points, so ≤2 levels max and well
            # under half a level on average
            err = np.abs(got - want)
            assert err.max() <= 2.0, (hw, f)
            assert err.mean() <= 0.6, (hw, f)
            # the threaded mean rounds to PIL's exact degenerate gray value
            degenerate = ImageEnhance.Contrast(
                Image.fromarray(native)
            ).degenerate.getpixel((0, 0))[0]
            assert int(np.floor(mean + 0.5)) == degenerate
