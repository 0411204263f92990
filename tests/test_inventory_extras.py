"""Tests for the inventory-parity extras: FeatureExtractorV2, assignment
histograms, functional geometric transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.data.transforms import (
    center_crop,
    horizontal_flip,
    random_crop,
    rotate90,
    vertical_flip,
)
from timetuning_tpu.models.extractor import FeatureExtractorV2
from timetuning_tpu.models.vit import ViTConfig, VisionTransformer
from timetuning_tpu.obs.histograms import (
    assignment_entropy,
    assignment_histogram,
    log_assignment_histogram,
)


def test_feature_extractor_v2_heads():
    vcfg = ViTConfig(patch_size=8, embed_dim=32, depth=1, num_heads=2,
                     img_size=32, attn_impl="xla")
    fe = FeatureExtractorV2(
        backbone=VisionTransformer(vcfg),
        segmentation_head_dims=(24, 12),
        propagation_head_dims=(20,),
    )
    x = jnp.zeros((2, 32, 32, 3))
    variables = fe.init(jax.random.PRNGKey(0), x)
    (seg, prop), attn = fe.apply(variables, x)
    assert seg.shape == (2, 16, 12)
    assert prop.shape == (2, 16, 20)
    (seg_raw, prop_raw), _ = fe.apply(
        variables, x, use_segmentation_head=False, use_propagation_head=False
    )
    assert seg_raw.shape == (2, 16, 32)
    assert prop_raw.shape == (2, 16, 32)
    assert set(variables["params"].keys()) == {
        "backbone", "segmentation_head", "propagation_head",
    }


def test_assignment_histogram_and_entropy():
    scores = jnp.asarray(
        [[[2.0, 0.0, 0.0], [0.0, 3.0, 0.0]], [[5.0, 0.0, 0.0], [0.0, 0.0, 1.0]]]
    )  # argmaxes: 0, 1, 0, 2
    h = np.asarray(assignment_histogram(scores, 3))
    np.testing.assert_array_equal(h, [2, 1, 1])
    # uniform distribution has maximal entropy
    assert assignment_entropy(np.ones(4)) > assignment_entropy(
        np.asarray([100, 1, 1, 1])
    )


def test_log_assignment_histogram(tmp_path):
    from timetuning_tpu.obs.logging import MetricsWriter

    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    ent = log_assignment_histogram(w, np.asarray([5, 5, 5]), step=1)
    w.close()
    assert ent == pytest.approx(assignment_entropy(np.asarray([5, 5, 5])))
    assert "Scores/entropy" in open(str(tmp_path / "metrics.jsonl")).read()


def test_functional_transforms():
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.random((2, 8, 10, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(vertical_flip(clip)), np.asarray(clip)[:, ::-1]
    )
    np.testing.assert_array_equal(
        np.asarray(horizontal_flip(clip)), np.asarray(clip)[:, :, ::-1]
    )
    cc = center_crop(clip, 6)
    assert cc.shape == (2, 6, 6, 3)
    np.testing.assert_array_equal(np.asarray(cc), np.asarray(clip)[:, 1:7, 2:8])
    rc = random_crop(jax.random.PRNGKey(0), clip, 5)
    assert rc.shape == (2, 5, 5, 3)
    sq = clip[:, :8, :8]
    r = rotate90(sq, 1)
    np.testing.assert_array_equal(np.asarray(r), np.rot90(np.asarray(sq), 1, (1, 2)))
