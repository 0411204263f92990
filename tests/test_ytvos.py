"""YTVOS meta.json category mapping (reference data_loader.py:453-506)."""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from timetuning_tpu.data.datasets import YTVOSDataset, make_categories_dict


@pytest.fixture()
def ytvos_tree(tmp_path):
    base = tmp_path / "train"
    rng = np.random.default_rng(0)
    meta = {"videos": {}}
    for v, (o1cat, o2cat) in enumerate([("person", "dog"), ("dog", "car")]):
        name = f"vid{v}"
        fdir = base / "JPEGImages" / name
        adir = base / "Annotations" / name
        fdir.mkdir(parents=True)
        adir.mkdir(parents=True)
        for f in range(4):
            cv2.imwrite(str(fdir / f"{f:05d}.jpg"),
                        rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8))
            ann = np.zeros((32, 32), np.uint8)
            ann[:16] = 1   # object id 1
            ann[16:] = 2   # object id 2
            cv2.imwrite(str(adir / f"{f:05d}.png"), ann)
        meta["videos"][name] = {
            "objects": {"1": {"category": o1cat}, "2": {"category": o2cat}}
        }
    (base / "meta.json").write_text(json.dumps(meta))
    return str(base)


def test_make_categories_dict(ytvos_tree):
    mapping = make_categories_dict(ytvos_tree + "/meta.json")
    # person=1, dog=2, car=3 (first-seen order)
    assert mapping["vid0"] == {"1": 1, "2": 2}
    assert mapping["vid1"] == {"1": 2, "2": 3}


def test_ytvos_dataset_remaps_instances(ytvos_tree):
    ds = YTVOSDataset(
        frames_root=ytvos_tree + "/JPEGImages",
        annotations_root=ytvos_tree + "/Annotations",
        meta_file=ytvos_tree + "/meta.json",
        num_frames=2,
        decode_size=32,
    )
    item0 = ds[0]
    # vid0: object 1 -> person(1), object 2 -> dog(2)
    assert set(np.unique(item0["annotations"])) == {1, 2}
    item1 = ds[1]
    # vid1: object 1 -> dog(2), object 2 -> car(3)
    assert set(np.unique(item1["annotations"])) == {2, 3}
