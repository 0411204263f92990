"""process_attentions / apply_attention_mask tests (reference models.py:93-144)."""

import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.models.extractor import apply_attention_mask, process_attentions
from timetuning_tpu.ops.morphology import (
    connected_components,
    gaussian_blur,
    gaussian_kernel1d,
    remove_small_components,
)


def test_gaussian_kernel_matches_torch_formula():
    # torchvision _get_gaussian_kernel1d: exp(-(x/sigma)^2/2), normalized
    k = gaussian_kernel1d(7, 0.6)
    x = np.linspace(-3, 3, 7)
    want = np.exp(-0.5 * (x / 0.6) ** 2)
    want /= want.sum()
    np.testing.assert_allclose(k, want, rtol=1e-6)


def test_gaussian_blur_matches_scipy():
    from scipy.ndimage import correlate1d

    rng = np.random.default_rng(0)
    img = rng.random((14, 14)).astype(np.float32)
    k = gaussian_kernel1d(7, 0.6)
    # scipy "mirror" == numpy/torch "reflect" (no edge duplication)
    want = correlate1d(correlate1d(img, k, axis=0, mode="mirror"), k, axis=1,
                       mode="mirror")
    got = np.asarray(gaussian_blur(jnp.asarray(img), 7, 0.6))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_connected_components_labels():
    m = np.zeros((10, 10), np.float32)
    m[1:3, 1:3] = 1   # component A (4 px)
    m[6:9, 6:9] = 1   # component B (9 px)
    m[0, 9] = 1       # singleton C
    lab = np.asarray(connected_components(jnp.asarray(m)))
    assert lab[0, 0] == -1
    ids = {lab[1, 1], lab[7, 7], lab[0, 9]}
    assert len(ids) == 3  # three distinct components
    assert (lab[1:3, 1:3] == lab[1, 1]).all()


def test_remove_small_components():
    m = np.zeros((10, 10), np.float32)
    m[1:4, 1:4] = 1   # 9 px — kept
    m[8, 8] = 1       # 1 px — removed
    m[0, 6:8] = 1     # 2 px — removed (≤2 rule, models.py:126-130)
    out = np.asarray(remove_small_components(jnp.asarray(m), min_size=3))
    assert out[2, 2] == 1
    assert out[8, 8] == 0
    assert out[0, 6] == 0


def _make_attention(B, heads, res, fg_slice):
    """CLS-attention tensor with concentrated mass on fg_slice."""
    N = res * res
    att = np.full((B, heads, N + 1, N + 1), 1e-4, np.float32)
    fg = np.zeros((res, res), bool)
    fg[fg_slice] = True
    att[:, :, 0, 1:] = np.where(fg.reshape(-1), 1.0, 1e-4)
    return jnp.asarray(att), fg


def test_process_attentions_recovers_foreground():
    res = 14
    att, fg = _make_attention(2, 3, res, (slice(4, 10), slice(4, 10)))
    mask = np.asarray(process_attentions(att, res))
    assert mask.shape == (2, 1, res, res)
    got = mask[0, 0] > 0.5
    # high-mass block recovered (blur rounds the corners slightly)
    agree = (got == fg).mean()
    assert agree > 0.9, agree


def test_apply_attention_mask_zeroes_background():
    res = 4
    att, fg = _make_attention(2, 2, res, (slice(0, 2), slice(0, 4)))
    feats = jnp.ones((1, 2, res * res, 5))
    masked, masks = apply_attention_mask(feats, att, res)
    assert masked.shape == (1, 2, res * res, 5)
    assert masks.shape == (1, 2, res * res)
    m = np.asarray(masks)[0, 0].reshape(res, res)
    # masked features are exactly features * mask
    np.testing.assert_allclose(
        np.asarray(masked)[0, 0, :, 0], np.asarray(masks)[0, 0], atol=1e-6
    )
