"""Evaluator pipeline on synthetic separable features."""

import numpy as np
import jax.numpy as jnp
import pytest

from timetuning_tpu.eval.evaluator import (
    Evaluator,
    evaluate_localizations,
    evaluate_propagation,
)
from timetuning_tpu.eval.metrics import PredsmIoU


def test_evaluate_localizations_protocols():
    rng = np.random.default_rng(0)
    gts = rng.integers(0, 3, size=(2, 2, 8, 8))
    perm = np.array([1, 2, 0])
    preds = perm[gts]  # perfect up to relabeling
    m = PredsmIoU(8, 8, involve_bg=True)
    for proto in ["frame-wise", "sample-wise", "dataset-wise"]:
        s = evaluate_localizations(m, gts, preds, proto)
        assert s == pytest.approx(1.0), proto


def test_ignore_index_filtering():
    gts = np.full((1, 1, 4, 4), 255)
    gts[0, 0, :2] = 1
    preds = np.ones((1, 1, 4, 4), int)
    m = PredsmIoU(8, 8, involve_bg=True)
    s = evaluate_localizations(m, gts, preds, "dataset-wise", ignore_index=255)
    assert s == pytest.approx(1.0)


def test_evaluate_propagation_mean():
    gts = np.zeros((1, 2, 6, 6), int)
    gts[:, :, :3] = 1
    m = PredsmIoU(4, 4, involve_bg=True)
    s = evaluate_propagation(m, gts, gts)
    assert s == pytest.approx(1.0)


def _fake_dataset(n_batches=2, B=2, F=2, H=28, W=28):
    """Frames whose 'features' (per 7x7 patch grid) are determined by a
    3-class layout; annotations agree with the layout."""
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(n_batches):
        layout = rng.integers(0, 3, size=(B, F, 7, 7))
        frames = np.zeros((B, F, H, W, 3), np.float32)
        ann = np.kron(layout, np.ones((4, 4), int))  # upsample to 28x28
        batches.append((frames, ann, layout))
    return batches


def test_evaluator_end_to_end_kmeans():
    batches = _fake_dataset()

    centers = np.asarray([[4, 0, 0, 0], [0, 4, 0, 0], [0, 0, 4, 0]], np.float32)

    def feature_fn(frames, use_mask):
        # derive features from the stored layout via closure lookup
        idx = feature_fn.layouts.pop(0)
        BF = frames.shape[0]
        lay = idx.reshape(BF, 49)
        feats = centers[lay] + 0.01 * np.random.default_rng(1).normal(
            size=(BF, 49, 4)
        ).astype(np.float32)
        return jnp.asarray(feats), None

    feature_fn.layouts = [b[2] for b in batches]

    ev = Evaluator(
        data_iter_factory=lambda: [(b[0], b[1]) for b in batches],
        feature_fn=feature_fn,
        spatial_resolution=7,
        num_classes=3,
        involve_bg=True,
        ignore_index=None,
    )
    score = ev.evaluate(
        evaluation_protocol="dataset-wise", eval_resolution=28, num_clusters=3
    )
    # bilinear feature upsampling blurs the 4px class boundaries, so a band
    # of boundary pixels mismatches the nearest-upsampled annotations
    assert score > 0.8


def test_evaluator_prototypes_path():
    batches = _fake_dataset(n_batches=1)
    centers = np.eye(3, dtype=np.float32)

    def feature_fn(frames, use_mask):
        idx = feature_fn.layouts.pop(0)
        BF = frames.shape[0]
        lay = idx.reshape(BF, 49)
        return jnp.asarray(centers[lay]), None

    feature_fn.layouts = [b[2] for b in batches]
    ev = Evaluator(
        data_iter_factory=lambda: [(b[0], b[1]) for b in batches],
        feature_fn=feature_fn,
        spatial_resolution=7,
        num_classes=3,
        clustering_algorithm="prototypes",
        prototypes=jnp.asarray(centers),
        ignore_index=None,
    )
    score = ev.evaluate(
        evaluation_protocol="dataset-wise", eval_resolution=28, num_clusters=3
    )
    assert score > 0.8


def _stateless_setup(n_batches=3, B=2, F=2):
    """Frames that encode their own patch layout (red channel = class id per
    4x4 block), with a stateless feature_fn — re-iterable for the two-pass
    streaming protocol."""
    rng = np.random.default_rng(7)
    centers = np.asarray(
        [[4, 0, 0, 0], [0, 4, 0, 0], [0, 0, 4, 0]], np.float32
    )
    batches = []
    for _ in range(n_batches):
        layout = rng.integers(0, 3, size=(B, F, 7, 7))
        frames = np.kron(
            layout.astype(np.float32), np.ones((4, 4), np.float32)
        )[..., None].repeat(3, axis=-1)                       # [B,F,28,28,3]
        ann = np.kron(layout, np.ones((4, 4), int))
        batches.append((frames, ann))
    def feature_fn(frames, use_mask):
        BF = frames.shape[0]
        lay = np.asarray(frames)[:, ::4, ::4, 0].reshape(BF, 49).astype(int)
        # noise must be a pure function of the batch content — the streaming
        # protocol extracts features twice (two passes over the data)
        seed = int(lay.sum()) % (2 ** 31)
        noise = np.random.default_rng(seed)
        feats = centers[lay] + 0.01 * noise.normal(size=(BF, 49, 4)).astype(
            np.float32
        )
        return jnp.asarray(feats), None

    return batches, feature_fn


def test_streaming_dataset_wise_matches_in_memory():
    """With an uncapped pixel sample the streaming path is the in-memory
    computation: same PCA (from moments), same k-means fit (same point order
    + seed), same assignments → same score."""
    batches, feature_fn = _stateless_setup()
    kw = dict(
        data_iter_factory=lambda: list(batches),
        feature_fn=feature_fn,
        spatial_resolution=7,
        num_classes=3,
        involve_bg=True,
        ignore_index=None,
    )
    s_mem = Evaluator(**kw).evaluate(
        evaluation_protocol="dataset-wise", eval_resolution=28, num_clusters=3
    )
    s_stream = Evaluator(**kw).evaluate(
        evaluation_protocol="dataset-wise", eval_resolution=28, num_clusters=3,
        streaming=True, sample_cap=10_000_000,
    )
    assert s_stream == pytest.approx(s_mem, abs=1e-3)
    assert s_mem > 0.8


def test_streaming_dataset_wise_bounded_sample():
    """A tight sample cap (the faiss max_points_per_centroid regime) still
    recovers the easy clustering; memory stays O(batch) by construction."""
    batches, feature_fn = _stateless_setup(n_batches=4)
    ev = Evaluator(
        data_iter_factory=lambda: list(batches),
        feature_fn=feature_fn,
        spatial_resolution=7,
        num_classes=3,
        involve_bg=True,
        ignore_index=None,
    )
    score = ev.evaluate(
        evaluation_protocol="dataset-wise", eval_resolution=28, num_clusters=3,
        streaming=True, sample_cap=768,
    )
    assert score > 0.8


def test_streaming_respects_fg_masks():
    """Streaming dataset-wise with precomputed FG masks == in-memory with
    the same masks (mask applied at patch level in both passes)."""
    batches, feature_fn = _stateless_setup(n_batches=2)
    total = sum(b[0].shape[0] for b in batches)
    F = batches[0][0].shape[1]
    rng = np.random.default_rng(5)
    fg = (rng.random((total, F, 7, 7)) > 0.3).astype(np.float32)
    kw = dict(
        data_iter_factory=lambda: list(batches),
        feature_fn=feature_fn,
        spatial_resolution=7,
        num_classes=3,
        involve_bg=True,
        ignore_index=None,
        fg_masks=fg,
    )
    s_mem = Evaluator(**kw).evaluate(
        evaluation_protocol="dataset-wise", eval_resolution=28, num_clusters=3
    )
    s_stream = Evaluator(**kw).evaluate(
        evaluation_protocol="dataset-wise", eval_resolution=28, num_clusters=3,
        streaming=True, sample_cap=10_000_000,
    )
    assert s_stream == pytest.approx(s_mem, abs=1e-3)

    # frame-level [total*F, h, w] masks must index by offset*F in the
    # streaming batch loop (clip offsets alone would mask with the wrong
    # clips' masks for F>1)
    kw_flat = dict(kw, fg_masks=fg.reshape(total * F, 7, 7))
    s_flat = Evaluator(**kw_flat).evaluate(
        evaluation_protocol="dataset-wise", eval_resolution=28, num_clusters=3,
        streaming=True, sample_cap=10_000_000,
    )
    assert s_flat == pytest.approx(s_stream, abs=1e-6)


def test_streaming_prototypes_matches_in_memory():
    """streaming=True must honor clustering_algorithm='prototypes' (one-pass
    argmax path) and match the in-memory prototype protocol."""
    batches, feature_fn = _stateless_setup(n_batches=2)
    protos = jnp.asarray(
        np.asarray([[4, 0, 0, 0], [0, 4, 0, 0], [0, 0, 4, 0]], np.float32)
    )
    kw = dict(
        data_iter_factory=lambda: list(batches),
        feature_fn=feature_fn,
        spatial_resolution=7,
        num_classes=3,
        involve_bg=True,
        ignore_index=None,
        clustering_algorithm="prototypes",
        prototypes=protos,
    )
    s_mem = Evaluator(**kw).evaluate(
        evaluation_protocol="dataset-wise", eval_resolution=28, num_clusters=3
    )
    s_stream = Evaluator(**kw).evaluate(
        evaluation_protocol="dataset-wise", eval_resolution=28, num_clusters=3,
        streaming=True,
    )
    assert s_stream == pytest.approx(s_mem, abs=1e-6)
    assert s_mem > 0.8
