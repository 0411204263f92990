"""Semi-supervised mask propagation CLI — the ``python mask_propagation.py``
equivalent (reference mask_propagation.py:717-870: bs=1, 25 uniform frames,
n_last=4, neighborhood 12, topk 5, uvos binarization; optional optical-flow
baseline)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from timetuning_tpu.cli.train import str2bool
from timetuning_tpu.runtime import setup_compilation_cache


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("timetuning_tpu.propagate")
    p.add_argument("--architecture", type=str, default="dino-s16")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--dataset", type=str, default="davis_val")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--num_frames", type=int, default=25)
    p.add_argument("--n_last_frames", type=int, default=4)
    p.add_argument("--size_mask_neighborhood", type=int, default=12)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--input_resolution", type=int, default=224)
    p.add_argument("--uvos", type=str2bool, default=True)
    p.add_argument("--use_optical_flow", type=str2bool, default=False)
    p.add_argument("--metric", type=str, default="jf",
                   choices=["jf", "miou", "propagation"])
    # the reference's mIoU scoring knobs (mask_propagation.py:854-860:
    # frame-wise protocol, k=10, many_to_one=False, involve_bg=False)
    p.add_argument("--evaluation_protocol", type=str, default="frame-wise",
                   choices=["frame-wise", "sample-wise", "dataset-wise"])
    p.add_argument("--many_to_one", type=str2bool, default=False)
    p.add_argument("--num_clusters", type=int, default=10)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 runs the backbone AND the 480p "
                        "preprocess resize in bf16 (the perf path — "
                        "halves the pipeline's dominant HBM traffic); "
                        "float32 is bit-faithful to the reference")
    p.add_argument("--clip_batch", type=int, default=1,
                   help="clips per device dispatch — a pure throughput "
                        "knob (the batched program is the same math as "
                        "the reference's bs=1, vmapped); metrics are "
                        "bit-identical at any value")
    return p


def run_propagation(args, metrics: tuple = ("jf", "miou", "propagation")) -> dict:
    """Propagate GT first-frame masks through every clip of the dataset and
    score the requested metric variants. Returns a dict with any of
    ``{"jf": {...}, "miou": float, "propagation": float}``. Shared by this
    CLI (one metric) and cli.parity (all three)."""
    from timetuning_tpu.data.datasets import SamplingMode
    from timetuning_tpu.data.loader import make_loader
    from timetuning_tpu.data.transforms import eval_preprocess_flat
    from timetuning_tpu.eval.evaluator import evaluate_localizations, evaluate_propagation
    from timetuning_tpu.eval.metrics import PredsmIoU
    from timetuning_tpu.eval.vos import evaluate_sequence, j_and_f
    from timetuning_tpu.models.registry import get_backbone
    from timetuning_tpu.ops.propagation import propagate_labels_batch
    from timetuning_tpu.ops.resize import resize_bilinear, resize_nearest

    cdt = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    bb = get_backbone(args.architecture, args.model_path, dtype=cdt)
    res = bb.spatial_resolution(args.input_resolution)
    S = args.input_resolution
    # clips per device dispatch: the batched program is the bs=1 math
    # vmapped over clips (identical results), amortizing dispatch latency
    # and filling the chip (a single 25-frame ViT pass under-fills it —
    # see docs/mfu_roofline.json's propagation row)
    CB = max(1, int(getattr(args, "clip_batch", 1)))

    @jax.jit
    def extract(frames_flat_u8):                 # [CB, T, H, W*3]
        # frames arrive channel-interleaved-FLAT (a free numpy view): on
        # TPU+bf16 the preprocess routes to the fused Pallas kernel, and
        # the flat-born device layout avoids a ~1.3 ms/200-frame relayout
        # (ops/preprocess_pallas docstring)
        bt = frames_flat_u8.reshape((-1,) + frames_flat_u8.shape[2:])
        h, w3 = bt.shape[-2:]
        x = eval_preprocess_flat(bt, (h, w3 // 3), out_size=S,
                                 compute_dtype=cdt)
        out = bb.module.apply(bb.variables, x)
        tok = out["tokens"][:, 1:] if bb.drop_cls else out["tokens"]
        return tok.reshape(frames_flat_u8.shape[:2] + tok.shape[1:])

    @jax.jit
    def propagate_batch(feats, first_onehots):   # [CB, T, N, D], [CB, K, N]
        segs = propagate_labels_batch(
            feats, first_onehots,
            n_last=args.n_last_frames,
            radius=args.size_mask_neighborhood,
            topk=args.topk,
        )                                         # [CB, T-1, K, N]
        B, T1, K, _ = segs.shape
        maps = segs.reshape(B * T1, K, res, res)
        up = resize_bilinear(maps, (S, S))
        return jnp.argmax(up, axis=1).reshape(B, T1, S, S)

    loader = make_loader(
        args.dataset, num_clip_frames=args.num_frames, batch_size=1,
        sampling_mode=SamplingMode.UNIFORM, shuffle=False,
        num_workers=args.num_workers, root=args.data_root, drop_last=False,
    )
    all_gt, all_pred, sequences = [], [], []

    def score_clip(ann: np.ndarray, preds: np.ndarray) -> None:
        all_gt.append(ann[1:])
        all_pred.append(preds)
        # official DAVIS semi-supervised protocol (davis2017-evaluation)
        # scores masks[1:-1]: the GT-given first frame AND the last frame
        # are excluded from J&F (the reference's evaluate_semisupervised is
        # dead code there — the official harness is the arbiter); object
        # ids come from the FULL ground truth like that harness, so objects
        # visible only in excluded frames still score over the middle
        # frames. mIoU / propagation metrics keep all predicted frames
        # like the reference's evaluate_localizations path.
        obj_ids = [int(i) for i in np.unique(ann) if i != 0]
        sequences.append(
            evaluate_sequence(preds[:-1], ann[1:-1], obj_ids=obj_ids)
        )

    group: list = []                               # [(frames, ann, K)]

    def flush_group() -> None:
        if not group:
            return
        # one K per dispatch: the group max (padded channels are all-zero,
        # never beating a valid label's argmax; ties at 0 resolve to the
        # first index = background) — same padding rule as the per-clip
        # path, widened across the group
        K = max(k for _, _, k in group)
        nb = len(group)
        fr = np.stack([f for f, _, _ in group]
                      + [group[-1][0]] * (CB - nb))
        onehots = []
        for _, ann, _ in group:
            first = np.asarray(
                resize_nearest(jnp.asarray(ann[0:1], jnp.float32),
                               (res, res))
            )[0].astype(np.int64)
            onehots.append(np.eye(K, dtype=np.float32)[first].T.reshape(K, -1))
        oh = np.stack(onehots + [onehots[-1]] * (CB - nb))
        # flatten the trailing (W, 3) on the host — a free view — so the
        # device array is born in the layout the fused preprocess wants
        fr_flat = fr.reshape(fr.shape[:3] + (fr.shape[3] * fr.shape[4],))
        feats = extract(jnp.asarray(fr_flat))
        preds = np.asarray(propagate_batch(feats, jnp.asarray(oh)))[:nb]
        for (_, ann, _), pr in zip(group, preds):
            score_clip(ann, pr)
        group.clear()

    for frames, annots, _ in loader:
        frames, annots = frames[0], annots[0]              # loader bs 1
        if args.uvos:
            annots = (annots > 0).astype(np.uint8)
        ann = np.asarray(
            resize_nearest(jnp.asarray(annots, jnp.float32), (S, S))
        ).astype(np.int64)
        # round the channel count up to a multiple of 4: the programs are
        # jitted per distinct K, and per-clip object counts would otherwise
        # trigger a multi-second recompile for every new count
        K = max(int(ann.max()) + 1, 2)
        K = -(-K // 4) * 4
        if args.use_optical_flow:
            import cv2

            from timetuning_tpu.eval.optical_flow import propagate_flow

            frames_s = np.stack(
                [cv2.resize(f, (S, S), interpolation=cv2.INTER_LINEAR)
                 for f in frames]
            )
            score_clip(ann, propagate_flow(frames_s, ann[0]))
            continue
        group.append((frames, ann, K))
        if len(group) == CB:
            flush_group()
    flush_group()

    gts = np.stack(all_gt)
    preds = np.stack(all_pred)
    out = {}
    if "jf" in metrics:
        out["jf"] = j_and_f(sequences)
    if "miou" in metrics:
        # reference scoring config (mask_propagation.py:754,841):
        # PredsmIoU(num_clusters, 10, involve_bg=False) under the chosen
        # protocol — the published propagation-mIoU recipe
        out["miou"] = evaluate_localizations(
            PredsmIoU(getattr(args, "num_clusters", 10), 10,
                      involve_bg=False),
            gts, preds,
            getattr(args, "evaluation_protocol", "frame-wise"),
            many_to_one=bool(getattr(args, "many_to_one", False)),
        )
    if "propagation" in metrics:
        out["propagation"] = evaluate_propagation(
            PredsmIoU(256, 256, involve_bg=True), gts, preds
        )
    return out


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_compilation_cache()
    results = run_propagation(args, metrics=(args.metric,))
    if args.metric == "jf":
        print(f"J&F: {results['jf']}")
    elif args.metric == "propagation":
        print(f"propagation J: {results['propagation']}")
    else:
        print("mIoU:", results["miou"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
