"""Data layer tests over a synthetic DAVIS-layout tree (SURVEY.md §4)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from timetuning_tpu.data.datasets import (
    SamplingMode,
    VideoDataset,
    build_dataset_tree,
    diff_annotation_data_directories,
    generate_clip_indices,
    train_val_split,
)
from timetuning_tpu.data.loader import ClipLoader, make_loader


@pytest.fixture(scope="module")
def davis_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("davis")
    frames = root / "JPEGImages" / "480p"
    annots = root / "Annotations" / "480p"
    rng = np.random.default_rng(0)
    for v in range(3):
        fdir = frames / f"video{v}"
        adir = annots / f"video{v}"
        fdir.mkdir(parents=True)
        adir.mkdir(parents=True)
        for f in range(8):
            img = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
            cv2.imwrite(str(fdir / f"{f:05d}.jpg"), img)
            ann = np.zeros((48, 64), np.uint8)
            ann[:, : 8 * (v + 1)] = v + 1
            cv2.imwrite(str(adir / f"{f:05d}.png"), ann)
    return str(root)


def test_build_tree(davis_tree):
    tree = build_dataset_tree(os.path.join(davis_tree, "JPEGImages"))
    assert len(tree) == 3
    assert all(len(v) == 8 for v in tree.values())


def test_sampling_modes():
    import random

    rng = random.Random(0)
    for mode in SamplingMode:
        idx = generate_clip_indices(rng, 20, 4, 2, mode, regular_step=3)
        assert len(idx) == 2
        for clip in idx:
            if mode == SamplingMode.FULL:
                assert list(clip) == list(range(20))
            else:
                assert len(clip) == 4
                assert all(0 <= i < 20 for i in clip)
                assert list(clip) == sorted(clip)
        if mode == SamplingMode.REGULAR:
            steps = np.diff(idx[0])
            assert np.all(steps == 3)
        if mode == SamplingMode.DENSE:
            assert np.all(np.diff(idx[0]) == 1)


def test_short_video_sampling():
    import random

    idx = generate_clip_indices(random.Random(0), 2, 4, 1, SamplingMode.UNIFORM)
    assert len(idx[0]) == 4  # sampled with replacement


def test_video_dataset_shapes(davis_tree):
    ds = VideoDataset(
        frames_root=os.path.join(davis_tree, "JPEGImages"),
        annotations_root=os.path.join(davis_tree, "Annotations"),
        num_frames=4,
        decode_size=64,
    )
    assert len(ds) == 3
    item = ds[0]
    assert item["frames"].shape == (1, 4, 64, 64, 3)
    assert item["annotations"].shape == (1, 4, 64, 64)
    assert item["frames"].dtype == np.uint8
    # annotation labels survive the nearest resize
    assert set(np.unique(item["annotations"])) <= {0, 1, 2, 3}


def test_dataset_epoch_determinism(davis_tree):
    ds = VideoDataset(
        frames_root=os.path.join(davis_tree, "JPEGImages"),
        annotations_root=os.path.join(davis_tree, "Annotations"),
        num_frames=3,
        decode_size=32,
    )
    a = ds[1]["frames"]
    b = ds[1]["frames"]
    np.testing.assert_array_equal(a, b)  # same epoch → same clip
    ds.set_epoch(1)
    c = ds[1]["frames"]
    assert not np.array_equal(a, c)  # new epoch → new sample


def test_clip_loader_sharding(davis_tree):
    ds = VideoDataset(
        frames_root=os.path.join(davis_tree, "JPEGImages"),
        annotations_root=os.path.join(davis_tree, "Annotations"),
        num_frames=2,
        decode_size=32,
    )
    seen = []
    for rank in range(2):
        loader = ClipLoader(
            ds, batch_size=1, shuffle=False, world_size=2, rank=rank,
            drop_last=False, num_workers=2,
        )
        for frames, annots, labels in loader:
            assert frames.shape == (1, 2, 32, 32, 3)
            seen += labels.tolist()
    assert sorted(seen) == [0, 1, 2]  # two hosts cover the set disjointly


def test_make_loader_factory(davis_tree):
    loader = make_loader(
        "davis", num_clip_frames=2, batch_size=2, root=davis_tree,
        decode_size=32, shuffle=True, drop_last=False,
    )
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0][0].shape[0] == 2


def test_diff_annotation_directories(davis_tree):
    assert diff_annotation_data_directories(
        os.path.join(davis_tree, "JPEGImages"), os.path.join(davis_tree, "Annotations")
    ) == {}


def test_train_val_split(davis_tree):
    train, val = train_val_split(os.path.join(davis_tree, "JPEGImages", "480p"), 1 / 3)
    assert len(train) == 2 and len(val) == 1
    assert set(train) | set(val) == {"video0", "video1", "video2"}
