"""End-to-end smoke of the Pascal-based CLIs (linear probe, CBFE) on a
synthetic VOC tree, plus pascal_loader semantics."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from timetuning_tpu.cli import cbfe as cli_cbfe
from timetuning_tpu.cli import linear_probe as cli_probe
from timetuning_tpu.data.pascal import PascalVOCDataset, pascal_loader


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    (root / "images").mkdir()
    (root / "SegmentationClass").mkdir()
    (root / "SegmentationClassAug").mkdir()
    (root / "sets").mkdir()
    rng = np.random.default_rng(0)
    names = [f"img{i}" for i in range(6)]
    for n in names:
        img = np.full((64, 64, 3), 40, np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        y = rng.integers(8, 24)
        img[y : y + 24, 16:48] = [200, 60, 60]
        mask[y : y + 24, 16:48] = 1
        cv2.imwrite(str(root / "images" / f"{n}.jpg"), img[..., ::-1])
        cv2.imwrite(str(root / "SegmentationClass" / f"{n}.png"), mask)
        cv2.imwrite(str(root / "SegmentationClassAug" / f"{n}.png"), mask)
    (root / "sets" / "val.txt").write_text("\n".join(names[:3]))
    (root / "sets" / "trainaug.txt").write_text("\n".join(names[3:]))
    return str(root)


def test_pascal_loader_shapes(voc_tree):
    loader = pascal_loader(2, voc_tree, "val", val_size=16, train_size=32)
    batches = list(loader)
    assert len(batches) == 2
    imgs, masks = batches[0]
    assert imgs.shape == (2, 32, 32, 3)
    assert masks.shape == (2, 16, 16)
    assert set(np.unique(masks)) <= {0, 1}


def test_pascal_dataset_split(voc_tree):
    assert len(PascalVOCDataset(voc_tree, "val")) == 3
    assert len(PascalVOCDataset(voc_tree, "trainaug")) == 3


def test_linear_probe_cli_smoke(voc_tree, capsys):
    rc = cli_probe.main([
        "--architecture", "vit-tiny-test",
        "--pascal_root", voc_tree,
        "--batch_size", "3",
        "--num_classes", "2",
        "--num_epochs", "2",
        "--input_resolution", "32",
        "--mask_size", "16",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "val mIoU" in out


def test_cbfe_cli_smoke(voc_tree, capsys):
    rc = cli_cbfe.main([
        "--architecture", "vit-tiny-test",
        "--pascal_root", voc_tree,
        "--batch_size", "3",
        "--num_clusters", "6",
        "--input_resolution", "32",
        "--resolution", "16",
        "--eval_resolution", "16",
        "--num_eval_clusters", "2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "threshold=" in out
    assert "masked dataset-wise mIoU" in out


def test_setup_sbd_annotations_encodes_voc_and_sbd(tmp_path):
    """SegmentationClassAug must receive BOTH the SBD .mat encodes and
    VOC's own SegmentationClass masks (the 2012-only annotations a
    trainaug split needs — reference data_loader.py:1028-1040), with VOC
    taking precedence for overlapping names."""
    import os

    import scipy.io
    from PIL import Image

    from timetuning_tpu.data.pascal import (
        PascalVOCDataset,
        setup_sbd_annotations,
    )

    voc = tmp_path / "voc"
    sbd = tmp_path / "sbd"
    (voc / "SegmentationClass").mkdir(parents=True)
    (voc / "images").mkdir()
    (voc / "sets").mkdir()
    (sbd / "dataset" / "cls").mkdir(parents=True)

    # VOC-only mask: palette png whose INDICES are the class ids
    pal_img = Image.fromarray(np.full((8, 8), 5, np.uint8), mode="P")
    pal_img.putpalette([0, 0, 0] * 256)
    pal_img.save(voc / "SegmentationClass" / "voc_only.png")
    # overlap name: VOC says class 7, SBD says class 2 — VOC must win
    ov = Image.fromarray(np.full((8, 8), 7, np.uint8), mode="P")
    ov.putpalette([0, 0, 0] * 256)
    ov.save(voc / "SegmentationClass" / "overlap.png")
    for name, cls in (("sbd_only", 3), ("overlap", 2)):
        scipy.io.savemat(
            sbd / "dataset" / "cls" / f"{name}.mat",
            {"GTcls": {"Segmentation": np.full((8, 8), cls, np.uint8)}},
        )

    n = setup_sbd_annotations(str(voc), str(sbd))
    assert n == 3  # voc_only + overlap (VOC) + sbd_only

    aug = voc / "SegmentationClassAug"
    got = {
        f[:-4]: np.asarray(Image.open(aug / f))
        for f in sorted(os.listdir(aug))
    }
    assert set(got) == {"voc_only", "overlap", "sbd_only"}
    assert got["voc_only"].max() == got["voc_only"].min() == 5
    assert got["sbd_only"].max() == 3
    assert got["overlap"].max() == 7  # VOC precedence

    # a trainaug split over a VOC-only name now loads (previously
    # FileNotFoundError: the mask never reached SegmentationClassAug)
    import cv2

    cv2.imwrite(str(voc / "images" / "voc_only.jpg"),
                np.zeros((8, 8, 3), np.uint8))
    (voc / "sets" / "trainaug.txt").write_text("voc_only\n")
    ds = PascalVOCDataset(str(voc), image_set="trainaug")
    img, mask = ds[0]
    assert mask.max() == 5
