"""Benchmark: mask-propagation eval pipeline throughput (frames/sec/chip).

BASELINE.json config row 4 — the `cli.propagate` compute path as one jitted
program per clip: 480p decode-resize → ViT-S/16 dense features → k-NN label
propagation (n_last=4, radius=12, topk=5, reference mask_propagation.py
defaults) → upsampled argmax. Measured steady-state with on-device inputs
and chained dispatches (host IO excluded: on a real TPU host the loader and
DMA overlap this compute; through a tunneled dev chip the CLI is
dispatch-latency bound and unrepresentative).

Prints one JSON line like bench.py.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser("bench_eval")
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--num_frames", type=int, default=25)
    p.add_argument("--input_resolution", type=int, default=224)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--clip_batch", type=int, default=1,
                   help="clips per dispatch (cli.propagate --clip_batch)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from timetuning_tpu.runtime import setup_compilation_cache

    setup_compilation_cache()

    from timetuning_tpu.data.transforms import eval_preprocess_flat
    from timetuning_tpu.models.registry import get_backbone
    from timetuning_tpu.ops.propagation import propagate_labels_batch
    from timetuning_tpu.ops.resize import resize_bilinear

    T, S, K = args.num_frames, args.input_resolution, 2
    CB = max(1, args.clip_batch)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bb = get_backbone("dino-s16", None, dtype=dtype)
    res = bb.spatial_resolution(S)
    H, W = 480, 854

    @jax.jit
    def clip_eval(frames_u8, first_onehots):     # [CB,T,H,W*3], [CB,K,N]
        # channel-interleaved-flat frames, as the CLI uploads them (the
        # fused Pallas preprocess wants the flat-born device layout)
        bt = frames_u8.reshape((-1,) + frames_u8.shape[2:])
        x = eval_preprocess_flat(bt, (H, W), out_size=S, compute_dtype=dtype)
        out = bb.module.apply(bb.variables, x)
        feats = out["tokens"][:, 1:].reshape(CB, T, res * res, -1)
        # the batch entry point routes to the fused Pallas propagation
        # kernel (a naive outer vmap of the single-clip scan measured
        # 2.2x slower even at CB=1: batched gathers/updates lower poorly)
        segs = propagate_labels_batch(
            feats, first_onehots, n_last=4, radius=12, topk=5
        )                                          # [CB, T-1, K, N]
        maps = segs.reshape(CB * (T - 1), K, res, res)
        up = resize_bilinear(maps, (S, S))
        return jnp.argmax(up, axis=1).astype(jnp.uint8).reshape(
            CB, T - 1, S, S)

    from bench_util import time_chained_fps

    make = jax.jit(lambda key: (
        jax.random.randint(key, (CB, T, H, W * 3), 0, 255, jnp.uint8),
        jax.random.uniform(key, (CB, K, res * res)),
    ))
    bufs = [make(jax.random.PRNGKey(i)) for i in range(2)]
    fps = time_chained_fps(clip_eval, bufs, iters=args.iters,
                           units_per_call=CB * T)
    print(json.dumps({
        "metric": "propagation_eval_fps",
        "value": round(fps, 1),
        "unit": f"frames/sec/chip ({args.dtype}, {T}-frame 480p clips, "
                f"ViT-s16 @ {S}, radius 12, clip_batch={CB})",
        "ms_per_clip": round(1000 * T / fps, 2),
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
