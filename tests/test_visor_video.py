"""VISOR conversion + video→frames decoding tests."""

import os
import zipfile

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from timetuning_tpu.data.datasets import build_dataset_tree, convert_video_to_frames
from timetuning_tpu.data.visor import extract_zips, group_frames_by_video, visor_to_davis


def test_group_frames_by_video(tmp_path):
    flat = tmp_path / "flat"
    flat.mkdir()
    rng = np.random.default_rng(0)
    for vid in ["P01_01", "P01_02"]:
        for f in range(3):
            cv2.imwrite(
                str(flat / f"{vid}_frame_{f:010d}.jpg"),
                rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8),
            )
    out = tmp_path / "grouped"
    n = group_frames_by_video(str(flat), str(out))
    assert n == 2
    assert sorted(os.listdir(out)) == ["P01_01", "P01_02"]
    assert len(os.listdir(out / "P01_01")) == 3


def test_visor_to_davis(tmp_path):
    root = tmp_path / "visor"
    (root / "images").mkdir(parents=True)
    (root / "annotations").mkdir()
    img = np.zeros((8, 8, 3), np.uint8)
    cv2.imwrite(str(root / "images" / "v1_frame_0000000001.jpg"), img)
    cv2.imwrite(str(root / "annotations" / "v1_frame_0000000001.png"), img[..., 0])
    out = tmp_path / "davis"
    visor_to_davis(str(root), str(out))
    assert os.path.exists(out / "JPEGImages" / "v1" / "0000000001.jpg")
    assert os.path.exists(out / "Annotations" / "v1" / "0000000001.png")


def test_extract_zips(tmp_path):
    zdir = tmp_path / "zips"
    zdir.mkdir()
    with zipfile.ZipFile(zdir / "part1.zip", "w") as zf:
        zf.writestr("a/file.txt", "hello")
    out = extract_zips(str(zdir), str(tmp_path / "out"))
    assert len(out) == 1
    assert open(tmp_path / "out" / "a" / "file.txt").read() == "hello"


def test_convert_video_to_frames(tmp_path):
    video = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 5, (32, 32))
    if not vw.isOpened():
        pytest.skip("no mp4 encoder in this OpenCV build")
    rng = np.random.default_rng(0)
    for _ in range(5):
        vw.write(rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8))
    vw.release()
    out = str(tmp_path / "frames")
    n = convert_video_to_frames(video, out)
    assert n == 5
    assert len(os.listdir(out)) == 5
    # and the tree walker auto-converts videos it encounters
    vdir = tmp_path / "tree" / "videoA"
    vdir.mkdir(parents=True)
    import shutil

    shutil.copy(video, vdir / "raw.mp4")
    tree = build_dataset_tree(str(tmp_path / "tree"))
    assert any("raw" in k for k in tree)
