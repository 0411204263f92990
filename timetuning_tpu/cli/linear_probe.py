"""Linear-probe CLI — the ``python linear_finetune.py`` equivalent
(reference linear_finetune.py:55-96)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from timetuning_tpu.runtime import setup_compilation_cache


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("timetuning_tpu.linear_probe")
    p.add_argument("--architecture", type=str, default="dino-s16")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--pascal_root", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_classes", type=int, default=21)
    p.add_argument("--num_epochs", type=int, default=50)
    p.add_argument("--input_resolution", type=int, default=448)
    p.add_argument("--mask_size", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.01)
    return p


def run_linear_probe(args, log=print) -> dict:
    """Train + validate the frozen-backbone linear probe; returns
    {"best_miou", "final_miou"} (reference linear_finetune.py:55-89)."""
    from timetuning_tpu.data.pascal import pascal_loader
    from timetuning_tpu.data.transforms import IMAGENET_STD, eval_preprocess_batch
    from timetuning_tpu.eval.linear_probe import LinearProbeConfig, LinearProbeTrainer
    from timetuning_tpu.models.registry import get_backbone

    bb = get_backbone(args.architecture, args.model_path)
    res = bb.spatial_resolution(args.input_resolution)

    @jax.jit
    def feats_jit(frames_u8):
        x = eval_preprocess_batch(
            frames_u8, out_size=args.input_resolution, std=IMAGENET_STD
        )
        out = bb.module.apply(bb.variables, x)
        return out["tokens"][:, 1:] if bb.drop_cls else out["tokens"]

    def feature_fn(frames):
        return feats_jit(jnp.asarray(frames))

    train_loader = pascal_loader(
        args.batch_size, args.pascal_root, "trainaug", args.mask_size,
        args.input_resolution,
    )
    val_loader = pascal_loader(
        args.batch_size, args.pascal_root, "val", args.mask_size,
        args.input_resolution,
    )
    cfg = LinearProbeConfig(
        num_classes=args.num_classes, mask_size=args.mask_size,
        num_epochs=args.num_epochs, lr=args.lr,
    )
    tr = LinearProbeTrainer(feature_fn, res, cfg, steps_per_epoch=len(train_loader))
    best = miou = 0.0
    for epoch in range(args.num_epochs):
        loss = tr.train_epoch(train_loader)
        miou = tr.validate(val_loader)
        best = max(best, miou)
        log(f"epoch {epoch}: loss={loss:.4f} val mIoU={miou:.4f} best={best:.4f}")
    return {"best_miou": best, "final_miou": miou}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_compilation_cache()
    run_linear_probe(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
