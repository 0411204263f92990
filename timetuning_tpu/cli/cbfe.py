"""CBFE CLI — the ``python cluster_based_foreground_extraction.py``
equivalent (reference :281-372: k=300 overclustering at 448 input, FG-mask
tuning on the train split, masked Evaluator rerun on val)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from timetuning_tpu.cli.train import str2bool
from timetuning_tpu.runtime import setup_compilation_cache


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("timetuning_tpu.cbfe")
    p.add_argument("--architecture", type=str, default="dino-s16")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--pascal_root", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_clusters", type=int, default=300)
    p.add_argument("--input_resolution", type=int, default=448)
    p.add_argument("--resolution", type=int, default=100)
    p.add_argument("--eval_resolution", type=int, default=100)
    p.add_argument("--num_eval_clusters", type=int, default=21)
    p.add_argument("--many_to_one", type=str2bool, default=True)
    return p


def run_cbfe(args, log=print) -> dict:
    """CBFE pipeline + masked Evaluator rerun; returns {"threshold",
    "train_jaccard", "val_jaccard", "val_bf", "masked_miou"}
    (reference cluster_based_foreground_extraction.py:281-348)."""
    from timetuning_tpu.data.pascal import pascal_loader
    from timetuning_tpu.data.transforms import IMAGENET_STD, eval_preprocess_batch
    from timetuning_tpu.eval.cbfe import CBFEConfig, ClusterBasedForegroundExtraction
    from timetuning_tpu.eval.evaluator import Evaluator
    from timetuning_tpu.models.extractor import process_attentions
    from timetuning_tpu.models.registry import get_backbone

    bb = get_backbone(args.architecture, args.model_path)
    res = bb.spatial_resolution(args.input_resolution)

    @jax.jit
    def feats_attn_jit(frames_u8):
        x = eval_preprocess_batch(
            frames_u8, out_size=args.input_resolution, std=IMAGENET_STD
        )
        out = bb.module.apply(bb.variables, x, want_attention=True)
        feats = out["tokens"][:, 1:] if bb.drop_cls else out["tokens"]
        masks = process_attentions(out["attention"], res)[:, 0]
        return feats, masks

    def feature_fn(frames):
        feats, masks = feats_attn_jit(jnp.asarray(frames))
        return feats[:, None], masks  # [B, 1, N, D], [B, r, r]

    train_loader = pascal_loader(
        args.batch_size, args.pascal_root, "trainaug", args.resolution,
        args.input_resolution,
    )
    val_loader = pascal_loader(
        args.batch_size, args.pascal_root, "val", args.resolution,
        args.input_resolution,
    )
    cbfe = ClusterBasedForegroundExtraction(
        feature_fn,
        CBFEConfig(num_clusters=args.num_clusters, resolution=args.resolution),
    )
    result = cbfe.get_foreground_masks(train_loader, val_loader)
    log(
        f"threshold={result['threshold']} train_j={result['train_jaccard']:.4f} "
        f"val_j={result['val_jaccard']:.4f} val_bf={result['val_bf']:.4f}"
    )

    # masked Evaluator rerun (reference :340-348)
    def eval_feature_fn(frames, want_attention=False):
        feats, _ = feats_attn_jit(jnp.asarray(frames))
        return feats, None

    ev = Evaluator(
        data_iter_factory=lambda: iter(val_loader),
        feature_fn=eval_feature_fn,
        spatial_resolution=res,
        num_classes=args.num_eval_clusters,
        involve_bg=True,
        fg_masks=result["fg_masks"][:, None],
        ignore_index=255,
    )
    score = ev.evaluate(
        many_to_one=args.many_to_one,
        evaluation_protocol="dataset-wise",
        eval_resolution=args.eval_resolution,
        num_clusters=args.num_eval_clusters,
        use_mask=True,
    )
    log(f"masked dataset-wise mIoU: {score}")
    return {
        "threshold": result["threshold"],
        "train_jaccard": float(result["train_jaccard"]),
        "val_jaccard": float(result["val_jaccard"]),
        "val_bf": float(result["val_bf"]),
        "masked_miou": float(score),
    }


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_compilation_cache()
    run_cbfe(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
