"""Data-layer fuzz: hostile directory layouts the walker/decoder must survive.

VERDICT r4 #8 — the reference's loader tolerates several real-world filename
conventions and tree shapes (data_loader.py:595-614: numbered frames with
and without zero padding, per-video annotation dirs with fewer files than
frames, mixed content). These tests drive the walker (`build_dataset_tree`),
the sampler, and the decode path over adversarial trees: mixed resolutions
inside one video, truncated/zero-byte images, annotation/frame count
mismatch, non-contiguous and unpadded frame numbering, stray non-image
files, exotic pixel formats, and seeded randomized layouts.
"""

import os
import random

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from timetuning_tpu.data.datasets import (
    SamplingMode,
    VideoDataset,
    build_dataset_tree,
)
from timetuning_tpu.data.loader import ClipLoader

pytestmark = pytest.mark.quick


def _write_jpg(path, h, w, color=None, rng=None):
    if color is not None:
        img = np.full((h, w, 3), color, np.uint8)
    else:
        img = (rng or np.random.default_rng(0)).integers(
            0, 255, size=(h, w, 3), dtype=np.uint8)
    assert cv2.imwrite(str(path), img)
    return img


def _item_invariants(item, num_clips, F, decode):
    assert item["frames"].shape == (num_clips, F, decode, decode, 3)
    assert item["frames"].dtype == np.uint8
    assert item["annotations"].dtype == np.uint8
    assert item["gray_means"].shape == (num_clips, F)
    assert np.all(np.isfinite(item["gray_means"]))
    assert np.all(item["gray_means"] >= 0) and np.all(
        item["gray_means"] <= 255)
    assert item["orig_size"].shape == (2,) and np.all(item["orig_size"] > 0)


def test_mixed_resolutions_per_video(tmp_path):
    """One video whose frames change resolution mid-stream — both the
    faithful and the fast_decode (DCT-reduced) paths must produce the
    square decode buffer for every frame."""
    vdir = tmp_path / "v0"
    vdir.mkdir()
    # first frame large (so fast_decode picks an aggressive 1/k), then a
    # frame SMALLER than the buffer (the reduced decode would undershoot)
    # colors are BGR (cv2.imwrite): R-, G-, B-bright after the RGB convert
    _write_jpg(vdir / "00000.jpg", 256, 512, color=(10, 10, 200))
    _write_jpg(vdir / "00001.jpg", 24, 16, color=(10, 200, 10))
    _write_jpg(vdir / "00002.jpg", 128, 64, color=(200, 10, 10))
    for fast in (False, True):
        ds = VideoDataset(frames_root=str(tmp_path),
                          sampling_mode=SamplingMode.FULL,
                          decode_size=32, fast_decode=fast)
        item = ds[0]
        _item_invariants(item, 1, 3, 32)
        # each solid-color frame survives the resize recognizably
        for f, ch in enumerate([0, 1, 2]):
            assert item["frames"][0, f, :, :, ch].mean() > 150, (fast, f)


def test_truncated_and_zero_byte_images_fail_loudly(tmp_path):
    vdir = tmp_path / "v0"
    vdir.mkdir()
    _write_jpg(vdir / "00000.jpg", 32, 32)
    # zero-byte file with an image extension
    (vdir / "00001.jpg").write_bytes(b"")
    ds = VideoDataset(frames_root=str(tmp_path),
                      sampling_mode=SamplingMode.FULL, decode_size=16)
    with pytest.raises(ValueError, match="failed to decode"):
        ds[0]
    # header-only truncation (cuts inside the JPEG header, not just the
    # entropy data — cv2 tolerates truncated scans but not a broken header)
    raw = (vdir / "00000.jpg").read_bytes()
    (vdir / "00001.jpg").write_bytes(raw[:8])
    with pytest.raises(ValueError, match="failed to decode"):
        ds[0]


def test_annotation_frame_count_mismatch(tmp_path):
    """Annotations covering only a prefix of the frames (YTVOS sparse
    annotation convention) — frames beyond the annotated prefix get zeros
    instead of crashing or mispairing."""
    froot, aroot = tmp_path / "frames", tmp_path / "annots"
    (froot / "v0").mkdir(parents=True)
    (aroot / "v0").mkdir(parents=True)
    for f in range(6):
        _write_jpg(froot / "v0" / f"{f:05d}.jpg", 24, 24)
    for f in range(2):
        ann = np.full((24, 24), 3, np.uint8)
        assert cv2.imwrite(str(aroot / "v0" / f"{f:05d}.png"), ann)
    ds = VideoDataset(frames_root=str(froot), annotations_root=str(aroot),
                      sampling_mode=SamplingMode.FULL, decode_size=16)
    item = ds[0]
    _item_invariants(item, 1, 6, 16)
    assert np.all(item["annotations"][0, :2] == 3)
    assert np.all(item["annotations"][0, 2:] == 0)


def test_noncontiguous_unpadded_numbering(tmp_path):
    """Frames named 1.jpg, 3.jpg, 10.jpg, 100.jpg — numeric order, not the
    lexicographic order (1, 10, 100, 3) that would scramble time."""
    vdir = tmp_path / "v0"
    vdir.mkdir()
    order = [1, 3, 10, 100]
    for rank, n in enumerate(order):
        _write_jpg(vdir / f"{n}.jpg", 16, 16, color=(50 * rank,) * 3)
    tree = build_dataset_tree(str(tmp_path))
    files = tree[str(vdir)]
    assert [os.path.basename(f) for f in files] == [
        "1.jpg", "3.jpg", "10.jpg", "100.jpg"]
    ds = VideoDataset(frames_root=str(tmp_path),
                      sampling_mode=SamplingMode.FULL, decode_size=16)
    item = ds[0]
    means = item["frames"][0].reshape(4, -1).mean(axis=1)
    assert np.all(np.diff(means) > 10), means  # strictly brighter in time


def test_stray_files_ignored(tmp_path):
    vdir = tmp_path / "v0"
    vdir.mkdir()
    for f in range(3):
        _write_jpg(vdir / f"{f:05d}.jpg", 16, 16)
    (vdir / "README.txt").write_text("not a frame")
    (vdir / ".DS_Store").write_bytes(b"\x00\x01")
    (vdir / "notes.json").write_text("{}")
    (tmp_path / "stray_root_file.txt").write_text("x")
    tree = build_dataset_tree(str(tmp_path))
    assert len(tree) == 1
    assert len(tree[str(vdir)]) == 3


def test_exotic_pixel_formats(tmp_path):
    """16-bit PNG, grayscale JPEG, RGBA PNG in one video — all decode to
    uint8 RGB without wrapping or channel loss."""
    vdir = tmp_path / "v0"
    vdir.mkdir()
    img16 = np.full((20, 20), 0xC0C0, np.uint16)       # high byte 0xC0
    assert cv2.imwrite(str(vdir / "00000.png"), img16)
    gray = np.full((20, 20), 77, np.uint8)
    assert cv2.imwrite(str(vdir / "00001.jpg"), gray)
    rgba = np.zeros((20, 20, 4), np.uint8)
    rgba[..., 2] = 250                                  # BGRA red channel
    rgba[..., 3] = 128
    assert cv2.imwrite(str(vdir / "00002.png"), rgba)
    ds = VideoDataset(frames_root=str(tmp_path),
                      sampling_mode=SamplingMode.FULL, decode_size=16)
    item = ds[0]
    _item_invariants(item, 1, 3, 16)
    assert abs(int(item["frames"][0, 0, 0, 0, 0]) - 0xC0) <= 1   # high byte
    assert abs(int(item["frames"][0, 1].mean()) - 77) <= 2       # gray→RGB
    assert item["frames"][0, 2, :, :, 0].mean() > 200            # R kept


def test_single_frame_video_all_modes(tmp_path):
    vdir = tmp_path / "v0"
    vdir.mkdir()
    _write_jpg(vdir / "0.jpg", 16, 16)
    for mode in SamplingMode:
        ds = VideoDataset(frames_root=str(tmp_path), sampling_mode=mode,
                          num_frames=4, decode_size=16, regular_step=2)
        item = ds[0]
        F = 1 if mode == SamplingMode.FULL else 4
        _item_invariants(item, 1, F, 16)


def test_empty_root_and_frameless_dirs(tmp_path):
    (tmp_path / "empty_video").mkdir()
    (tmp_path / "docs").mkdir()
    (tmp_path / "docs" / "readme.md").write_text("x")
    tree = build_dataset_tree(str(tmp_path))
    assert tree == {}
    ds = VideoDataset(frames_root=str(tmp_path))
    assert len(ds) == 0


def test_randomized_hostile_trees(tmp_path):
    """Seeded random layouts: random video/frame counts, mixed extensions
    and resolutions, padded/unpadded names, optional annotation prefixes —
    every item of every sampling mode must satisfy the invariants, and a
    2-worker loader must drain cleanly."""
    rng = random.Random(1234)
    nrng = np.random.default_rng(1234)
    for case in range(4):
        root = tmp_path / f"case{case}"
        froot, aroot = root / "frames", root / "annots"
        n_videos = rng.randint(1, 4)
        for v in range(n_videos):
            vdir = froot / f"vid_{v}"
            adir = aroot / f"vid_{v}"
            vdir.mkdir(parents=True)
            adir.mkdir(parents=True)
            n_frames = rng.randint(1, 9)
            padded = rng.random() < 0.5
            step = rng.randint(1, 7)
            for f in range(n_frames):
                n = f * step + rng.randint(0, max(step - 1, 0))
                name = f"{n:05d}" if padded else str(n)
                ext = rng.choice([".jpg", ".jpeg", ".png"])
                h = rng.choice([16, 24, 48, 33])
                w = rng.choice([16, 24, 48, 31])
                _write_jpg(vdir / f"{name}{ext}", h, w, rng=nrng)
            # annotations for a random prefix (≥1 — a video with NO
            # annotation dir at all trips the alignment check by design)
            for f in range(rng.randint(1, n_frames)):
                n = f * step
                name = f"{n:05d}" if padded else str(n)
                ann = (nrng.integers(0, 4, size=(24, 24))).astype(np.uint8)
                assert cv2.imwrite(str(adir / f"{name}.png"), ann)
        for mode in SamplingMode:
            ds = VideoDataset(
                frames_root=str(froot), annotations_root=str(aroot),
                sampling_mode=mode, num_frames=3, decode_size=16,
                num_clips=rng.randint(1, 2), seed=case,
            )
            assert len(ds) == n_videos
            for i in range(len(ds)):
                item = ds[i]
                F = item["frames"].shape[1]
                _item_invariants(item, ds.num_clips, F, 16)
                assert item["annotations"].max(initial=0) <= 3
        ds = VideoDataset(frames_root=str(froot),
                          annotations_root=str(aroot),
                          sampling_mode=SamplingMode.UNIFORM, num_frames=2,
                          decode_size=16)
        loader = ClipLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                            seed=7, drop_last=False)
        n = 0
        for frames, _annots, _labels in loader:
            n += frames.shape[0]
        assert n == len(ds)


def test_annotation_only_mismatched_video_names_raise(tmp_path):
    """An extra frame-bearing dir on one side must raise, not silently
    shift every video onto another video's annotations."""
    froot, aroot = tmp_path / "frames", tmp_path / "annots"
    for v in ("a", "b"):
        (froot / v).mkdir(parents=True)
        _write_jpg(froot / v / "0.jpg", 16, 16)
    (aroot / "a").mkdir(parents=True)
    ann = np.zeros((16, 16), np.uint8)
    assert cv2.imwrite(str(aroot / "a" / "0.png"), ann)
    with pytest.raises(ValueError, match="do not align"):
        VideoDataset(frames_root=str(froot), annotations_root=str(aroot))
