"""bfscore, optical flow, linear probe, CBFE tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.eval.bfscore import bfscore, evaluate_bf_score
from timetuning_tpu.eval.cbfe import (
    CBFEConfig,
    cluster_precisions,
    find_good_threshold,
    masks_from_threshold,
    overcluster,
)
from timetuning_tpu.eval.linear_probe import LinearProbeConfig, LinearProbeTrainer


def _square(h=32, w=32, y0=8, y1=24, x0=8, x1=24, val=1):
    m = np.zeros((h, w), int)
    m[y0:y1, x0:x1] = val
    return m


def test_bfscore_perfect_and_absent():
    gt = _square(val=1) + _square(32, 32, 0, 4, 0, 4, 2) * 0  # class1 only
    scores, mean = bfscore(gt, gt, threshold=2)
    assert scores[1] == pytest.approx(1.0)
    assert mean == pytest.approx(1.0)
    # class present in neither → None and excluded
    gt2 = gt.copy()
    scores2, _ = bfscore(gt2, gt2)
    assert 0 not in scores2


def test_evaluate_bf_score_batch():
    gt = np.stack([_square(val=1) > 0] * 3)
    assert evaluate_bf_score(gt, gt) == pytest.approx(1.0)
    off = np.stack([np.roll(m, 10, axis=0) for m in gt])
    assert evaluate_bf_score(gt, off) < 0.8


def test_optical_flow_baseline():
    cv2 = pytest.importorskip("cv2")
    from timetuning_tpu.eval.optical_flow import propagate_flow

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    frames = np.stack([np.roll(base, s, axis=1) for s in [0, 3, 6]])
    mask = _square(64, 64, 16, 48, 8, 40)
    out = propagate_flow(frames, mask)
    assert out.shape == (2, 64, 64)
    # the propagated mask should roughly track the horizontal shift
    want = np.roll(mask, 6, axis=1)
    iou = np.logical_and(out[1] > 0, want > 0).sum() / max(
        np.logical_or(out[1] > 0, want > 0).sum(), 1
    )
    assert iou > 0.5


def test_linear_probe_learns_separable():
    """Features linearly separable by class → probe reaches high mIoU."""
    res, C, D = 4, 3, 8
    rng = np.random.default_rng(0)
    W = rng.normal(size=(C, D)).astype(np.float32) * 3

    def make_batch(seed):
        r = np.random.default_rng(seed)
        labels = r.integers(0, C, size=(4, res, res))
        feats = W[labels] + 0.05 * r.normal(size=(4, res, res, D)).astype(np.float32)
        masks = np.kron(labels, np.ones((4, 4), int))  # upsample 4x to 16
        return feats.reshape(4, res * res, D), masks

    batches = [make_batch(s) for s in range(4)]

    def feature_fn(x):
        return jnp.asarray(x)

    cfg = LinearProbeConfig(num_classes=C, mask_size=16, num_epochs=5, lr=0.5)
    tr = LinearProbeTrainer(feature_fn, res, cfg, steps_per_epoch=len(batches))
    for _ in range(5):
        loss = tr.train_epoch(batches)
    miou = tr.validate(batches)
    assert miou > 0.8, (loss, miou)


def test_cbfe_pipeline_pieces():
    rng = np.random.default_rng(0)
    cfg = CBFEConfig(num_clusters=8, resolution=16, pca_dim=4, sweep_steps=5)
    # two clusters of features: fg-ish and bg-ish over a 4x4 grid
    layout = rng.integers(0, 2, size=(4, 1, 4, 4))
    centers = np.asarray([[5, 0, 0, 0], [0, 5, 0, 0]], np.float32)
    feats = centers[layout].reshape(4, 1, 16, 4) + 0.01 * rng.normal(size=(4, 1, 16, 4)).astype(np.float32)
    assign = overcluster(jnp.asarray(feats), cfg)
    assert assign.shape == (4, 16, 16)

    attn_fg = jnp.asarray(
        np.kron(layout[:, 0], np.ones((4, 4))).reshape(4, 16, 16) > 0.5
    )
    precs = cluster_precisions(assign, attn_fg, cfg.num_clusters)
    assert precs.shape == (cfg.num_clusters,)
    # clusters covering layout==1 should have precision ~1, others ~0
    p = np.asarray(precs)
    assert ((p > 0.9) | (p < 0.1)).mean() > 0.7

    gt_fg = np.asarray(attn_fg)
    th, j = find_good_threshold(assign, precs, gt_fg, cfg)
    masks = np.asarray(masks_from_threshold(assign, precs, th))
    assert j > 0.9
    assert masks.shape == gt_fg.shape
