"""Rehearse the reference's in-training Pascal localization curve (VERDICT
r4 #5) — the last unreplicated training-time trajectory.

The reference trains TimeT on YTVOS and evaluates Pascal dataset-wise
(k=21, eval res = input/2) every 4 epochs, logging ``Scores/localization``
which climbs 0.06 → ~0.125 over 24 epochs (time_tuning.py:637-645,
Images/Performance.jpg). Real YTVOS/Pascal don't exist in this zero-egress
environment, so this tool exercises the identical LOOP end-to-end on
synthetic structured data: a DAVIS-layout train tree of moving colored
boxes and a VOC-layout eval tree whose classes are the same box colors —
so the SSL features have real structure to localize and the trajectory is
meaningfully non-flat.

Writes ``docs/eval_curve.json``: the Scores/localization trajectory (one
point per eval epoch), per-epoch training losses, and the exact config.
The REAL replication (when artifacts mount) is one command — the parity
harness's trajectory stage:

    python -m timetuning_tpu.cli.parity --timet_pth dino_s16.pth \
        --train_trajectory true --ytvos_root /data/ytvos \
        --pascal_root /data/voc --expected_localization 0.125

Usage (CPU, ~10 min):  python tools/rehearse_pascal_curve.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# 3 foreground classes by color (BGR for cv2.imwrite), class 0 = background
_CLASS_COLORS = [(40, 40, 220), (40, 220, 40), (220, 40, 40)]


def _paint(img, mask, cls, y, x, h, w):
    img[y:y + h, x:x + w] = _CLASS_COLORS[cls - 1]
    mask[y:y + h, x:x + w] = cls


def build_train_tree(root: str, n_videos=16, n_frames=10, size=96,
                     seed=0) -> None:
    import cv2

    rng = np.random.default_rng(seed)
    for v in range(n_videos):
        vdir = os.path.join(root, "JPEGImages", f"video{v:02d}")
        os.makedirs(vdir, exist_ok=True)
        cls = int(rng.integers(1, len(_CLASS_COLORS) + 1))
        y0, x0 = rng.integers(4, size // 3, size=2)
        vy, vx = rng.integers(1, 4, size=2)
        h, w = rng.integers(size // 4, size // 2, size=2)
        # FIXED background statistics (small per-pixel noise only): a
        # per-video random background would dominate the dataset-wise
        # k-means and collapse every cluster onto background groups
        for f in range(n_frames):
            img = rng.integers(40, 60, size=(size, size, 3)).astype(np.uint8)
            mask = np.zeros((size, size), np.uint8)
            y = int(min(y0 + vy * f, size - h - 1))
            x = int(min(x0 + vx * f, size - w - 1))
            _paint(img, mask, cls, y, x, int(h), int(w))
            cv2.imwrite(os.path.join(vdir, f"{f:05d}.jpg"), img)


def build_voc_tree(root: str, n_train=10, n_val=8, size=96, seed=1) -> None:
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "SegmentationClass"), exist_ok=True)
    os.makedirs(os.path.join(root, "SegmentationClassAug"), exist_ok=True)
    os.makedirs(os.path.join(root, "sets"), exist_ok=True)
    names = [f"img{i:03d}" for i in range(n_train + n_val)]
    for i, n in enumerate(names):
        img = rng.integers(40, 60, size=(size, size, 3)).astype(np.uint8)
        mask = np.zeros((size, size), np.uint8)
        cls = int(rng.integers(1, len(_CLASS_COLORS) + 1))
        h, w = rng.integers(size // 4, size // 2, size=2)
        y = int(rng.integers(0, size - h))
        x = int(rng.integers(0, size - w))
        _paint(img, mask, cls, y, x, int(h), int(w))
        cv2.imwrite(os.path.join(root, "images", f"{n}.jpg"), img)
        cv2.imwrite(os.path.join(root, "SegmentationClass", f"{n}.png"), mask)
        cv2.imwrite(
            os.path.join(root, "SegmentationClassAug", f"{n}.png"), mask)
    with open(os.path.join(root, "sets", "trainaug.txt"), "w") as f:
        f.write("\n".join(names[:n_train]))
    with open(os.path.join(root, "sets", "val.txt"), "w") as f:
        f.write("\n".join(names[n_train:]))


def main() -> int:
    p = argparse.ArgumentParser("rehearse_pascal_curve")
    p.add_argument("--num_epochs", type=int, default=24,
                   help="the Performance.jpg horizon")
    p.add_argument("--eval_every", type=int, default=4)
    p.add_argument("--architecture", type=str, default="vit-tiny-test")
    p.add_argument("--input_resolution", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--out", type=str,
                   default=os.path.join(REPO, "docs", "eval_curve.json"))
    p.add_argument("--work_dir", type=str, default=None)
    args = p.parse_args()

    work = args.work_dir or tempfile.mkdtemp(prefix="pascal_curve_")
    train_root = os.path.join(work, "train_tree")
    voc_root = os.path.join(work, "voc_tree")
    if not os.path.isdir(train_root):
        build_train_tree(train_root)
    if not os.path.isdir(voc_root):
        build_voc_tree(voc_root)

    from timetuning_tpu.cli.train import main as train_main

    log_dir = os.path.join(work, "logs")
    rc = train_main([
        "--architecture", args.architecture,
        "--dataset", "davis",
        "--data_root", train_root,
        "--pascal_root", voc_root,
        "--log_dir", log_dir,
        "--batch_size", str(args.batch_size),
        "--num_epochs", str(args.num_epochs),
        "--eval_every", str(args.eval_every),
        # 3 fg classes + bg — the synthetic analogue of Pascal's 21
        "--eval_num_clusters", "4",
        "--num_frames", "3",
        "--num_workers", "2",
        "--num_clusters", "16",
        "--input_resolution", str(args.input_resolution),
        "--n_last_frames", "2",
        "--size_mask_neighborhood", "1",
        "--evaluation_protocol", "dataset-wise",
        "--compute_dtype", "float32",
        # the tiny test arch is depth-2: the reference's blocks.10/11
        # unfreeze set would leave EVERYTHING frozen and the dense-feature
        # eval flat — train the last block, like the reference trains its
        # last two of 12
        "--unfreeze_layers", "blocks.1",
        "--head_lr", "1e-3",
        "--seed", "1",
    ])
    if rc not in (0, None):
        raise SystemExit(f"training failed rc={rc}")

    # newest run dir's metrics.jsonl
    runs = []
    for day in sorted(os.listdir(log_dir)):
        d = os.path.join(log_dir, day)
        if os.path.isdir(d):
            runs += [os.path.join(d, t) for t in sorted(os.listdir(d))]
    metrics_path = os.path.join(runs[-1], "metrics.jsonl")
    loc, losses = [], {}
    with open(metrics_path) as f:
        for line in f:
            row = json.loads(line)
            if row.get("tag") == "Scores/localization":
                loc.append({"epoch": row["step"],
                            "localization": round(row["value"], 4)})
            elif row.get("tag") == "Loss/train":
                losses[row["step"]] = round(row["value"], 4)
    out = {
        "metric": "pascal_localization_rehearsal",
        "what": "in-training dataset-wise Pascal eval loop, every "
                f"{args.eval_every} epochs over {args.num_epochs} epochs "
                "(reference time_tuning.py:637-645 / Images/Performance.jpg "
                "— 0.06→0.125 at k=21 on real YTVOS+Pascal)",
        "data": "SYNTHETIC structured trees (moving colored boxes; classes "
                "= box colors) — rehearses the loop, not the number; see "
                "cli.parity --train_trajectory for the real replication",
        "config": {
            "architecture": args.architecture,
            "input_resolution": args.input_resolution,
            "eval_resolution": args.input_resolution // 2,
            "eval_num_clusters": 4,
            "protocol": "dataset-wise",
            "num_epochs": args.num_epochs,
            "eval_every": args.eval_every,
        },
        "trajectory": loc,
        "loss_per_epoch_logpoints": losses,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"trajectory": loc, "written": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
