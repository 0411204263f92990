"""Evaluation CLI — the ``python evaluation.py`` equivalent
(reference evaluation.py:490-563 flag surface)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from timetuning_tpu.cli.train import str2bool
from timetuning_tpu.runtime import setup_compilation_cache


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("timetuning_tpu.evaluate")
    p.add_argument("--architecture", type=str, default="dino-s16")
    p.add_argument("--model_path", type=str, default=None,
                   help="backbone or TimeT checkpoint (.pth)")
    p.add_argument("--dataset", type=str, default="davis_val")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_frames", type=int, default=4)
    p.add_argument("--input_resolution", type=int, default=224)
    p.add_argument("--eval_resolution", type=int, default=112)
    p.add_argument("--num_clusters", type=int, default=10)
    p.add_argument("--evaluation_protocol", type=str, default="frame-wise",
                   choices=["frame-wise", "sample-wise", "dataset-wise"])
    p.add_argument("--clustering_algorithm", type=str, default="k-means",
                   choices=["k-means", "prototypes"])
    p.add_argument("--many_to_one", type=str2bool, default=False)
    p.add_argument("--precision_based", type=str2bool, default=False)
    p.add_argument("--use_mask", type=str2bool, default=False)
    p.add_argument("--use_annotations", type=str2bool, default=False)
    p.add_argument("--uvos", type=str2bool, default=False)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--streaming", type=str2bool, default=False,
                   help="bounded-memory dataset-wise protocol (two passes, "
                        "never concatenates the dataset's features)")
    p.add_argument("--sample_cap", type=int, default=None,
                   help="k-means fit sample size for --streaming "
                        "(default max(256*k, 16384), the faiss subsample rule)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 runs the backbone and the preprocess "
                        "resize in bf16 (the perf path, same contract as "
                        "cli.propagate); float32 stays bit-faithful")
    p.add_argument("--logging_directory", type=str, default=None,
                   help="write per-clip reordered/raw cluster-map gifs here "
                        "during evaluation (reference evaluation.py:270-300)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_compilation_cache()

    from timetuning_tpu.data.datasets import SamplingMode
    from timetuning_tpu.data.loader import make_loader
    from timetuning_tpu.data.transforms import eval_preprocess_flat
    from timetuning_tpu.eval.evaluator import Evaluator
    from timetuning_tpu.models.registry import get_backbone

    # Prototype clustering needs the checkpoint's prototype bank, and — for
    # published TimeT checkpoints, whose prototypes live in projection-head
    # space — head-projected features to score against it.
    protos = None
    head_params = None
    head_dims = None
    tree = None
    if args.clustering_algorithm == "prototypes":
        if not args.model_path:
            raise SystemExit(
                "--clustering_algorithm prototypes requires --model_path "
                "(a TimeT checkpoint carrying the prototype bank)"
            )
        from timetuning_tpu.core.checkpoint import import_timet_pth

        tree = import_timet_pth(args.model_path)
        if "prototypes" not in tree:
            raise SystemExit(
                "checkpoint has no prototype bank — use "
                "--clustering_algorithm k-means for plain backbone weights"
            )

    # one torch.load total: in prototype mode the backbone weights come
    # from the already-imported TimeT tree instead of a second load
    cdt = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    bb = get_backbone(
        args.architecture, None if tree is not None else args.model_path,
        dtype=cdt,
    )
    if tree is not None:
        bb.variables = {"params": tree["feature_extractor"]["backbone"]}
    res = bb.spatial_resolution(args.input_resolution)

    if args.clustering_algorithm == "prototypes":
        from timetuning_tpu.models.import_torch import head_dims_from_params

        protos = jnp.asarray(tree["prototypes"])
        # gate on head PRESENCE, not on a dim-inequality heuristic: a head
        # whose output width equals the backbone width would otherwise be
        # silently skipped, scoring raw features against head-space
        # prototypes (TimeT prototypes always live in head space when a
        # head was trained)
        head_params = tree.get("feature_extractor", {}).get("head")
        if head_params:
            head_dims = head_dims_from_params(head_params)
            if head_dims[-1] != protos.shape[-1]:
                raise SystemExit(
                    f"projection head output {head_dims[-1]} != prototype "
                    f"dim {protos.shape[-1]}"
                )
        elif protos.shape[-1] != bb.feature_dim:
            raise SystemExit(
                f"prototype dim {protos.shape[-1]} != backbone feature "
                f"dim {bb.feature_dim} and the checkpoint has no "
                "projection head to bridge them"
            )

    from functools import partial

    @partial(jax.jit, static_argnames=("want_attention",))
    def feats_jit(frames_flat_u8, want_attention=False):
        # frames arrive with (W, 3) flattened on the host (free view): the
        # bf16 path then routes to the fused Pallas preprocess on TPU with
        # a flat-born device layout (ops/preprocess_pallas docstring)
        h, w3 = frames_flat_u8.shape[-2:]
        x = eval_preprocess_flat(frames_flat_u8, (h, w3 // 3),
                                 out_size=args.input_resolution,
                                 compute_dtype=cdt)
        out = bb.module.apply(bb.variables, x, want_attention=want_attention)
        f = out["tokens"][:, 1:] if bb.drop_cls else out["tokens"]
        if head_dims is not None:
            from timetuning_tpu.models.heads import ProjectionHead

            f = ProjectionHead(head_dims).apply({"params": head_params}, f)
        return f, out.get("attention")

    def feature_fn(frames, want_attention=False):
        fr = np.asarray(frames)
        flat = fr.reshape(fr.shape[:-2] + (fr.shape[-2] * fr.shape[-1],))
        return feats_jit(jnp.asarray(flat), want_attention)

    loader = make_loader(
        args.dataset,
        num_clip_frames=args.num_frames,
        batch_size=args.batch_size,
        sampling_mode=SamplingMode.UNIFORM,
        shuffle=False,
        num_workers=args.num_workers,
        root=args.data_root,
        drop_last=False,
    )
    ev = Evaluator(
        data_iter_factory=lambda: iter(loader),
        feature_fn=feature_fn,
        spatial_resolution=res,
        num_classes=args.num_clusters,
        involve_bg=True,
        clustering_algorithm=args.clustering_algorithm,
        prototypes=protos,
        uvos=args.uvos,
        ignore_index=None,
        logging_directory=args.logging_directory,
    )
    score = ev.evaluate(
        many_to_one=args.many_to_one,
        evaluation_protocol=args.evaluation_protocol,
        eval_resolution=args.eval_resolution,
        num_clusters=args.num_clusters,
        use_mask=args.use_mask,
        use_annotations=args.use_annotations,
        precision_based=args.precision_based,
        streaming=args.streaming,
        sample_cap=args.sample_cap,
    )
    print(f"score: {score}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
