"""Auxiliary benchmark: full TimeT train-step throughput (clips/sec/chip).

The training workload (BASELINE.md "default train config"): ViT-S/16 +
projection head, EMA teacher, 200 prototypes, Sinkhorn, batched propagation
loss, optimizer + EMA + prototype renorm — one jitted step. The reference
runs this workload at bs=128 on an RTX 3090 (README.md:40) with three
full-clip ViT passes and a serial per-sample propagation loop.

Prints one JSON line (same shape as bench.py; the driver's headline metric
remains bench.py's dense-feature fps).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def make_clip_generator(B: int, F: int, size: int):
    """Jitted generator of *structured* synthetic video clips: K colored
    boxes moving with constant velocity over a smooth color-gradient
    background. Random-noise frames make the propagation target degenerate;
    moving objects give the SSL objective something real to learn, so the
    loss curve is meaningful (VERDICT r1 weak #3)."""
    import jax
    import jax.numpy as jnp

    K_OBJ = 3

    yy = jnp.linspace(0.0, 1.0, size)[:, None, None]
    xx = jnp.linspace(0.0, 1.0, size)[None, :, None]

    def one_clip(key):
        k_bg, k_bg2, k_col, k_pos, k_vel, k_sz = jax.random.split(key, 6)
        bg_a = jax.random.uniform(k_bg, (1, 1, 3), minval=-1.0, maxval=1.0)
        bg_b = jax.random.uniform(k_bg2, (1, 1, 3), minval=-1.0, maxval=1.0)
        colors = jax.random.uniform(k_col, (K_OBJ, 3), minval=-2.0, maxval=2.0)
        pos0 = jax.random.uniform(k_pos, (K_OBJ, 2), minval=0.15, maxval=0.85)
        vel = jax.random.uniform(k_vel, (K_OBJ, 2), minval=-0.06, maxval=0.06)
        half = jax.random.uniform(k_sz, (K_OBJ, 1), minval=0.06, maxval=0.18)

        def frame(t):
            img = bg_a * yy + bg_b * xx                     # [S, S, 3]
            c = pos0 + vel * t                               # [K, 2]

            def paint(img, i):
                inside = (
                    (jnp.abs(yy[:, :, 0] - c[i, 0]) < half[i, 0])
                    & (jnp.abs(xx[:, :, 0] - c[i, 1]) < half[i, 0])
                )
                return jnp.where(inside[:, :, None], colors[i], img), None

            img, _ = jax.lax.scan(paint, img, jnp.arange(K_OBJ))
            return img

        return jax.vmap(frame)(jnp.arange(F, dtype=jnp.float32))

    @jax.jit
    def gen(key):
        return jax.vmap(one_clip)(jax.random.split(key, B))

    return gen


def _gather_sweep(args) -> None:
    """Raw ``clippack_gather`` throughput vs thread count (VERDICT r4 #6).

    Builds (or reuses) a synthetic pack sized well past LLC, then times the
    native threaded gather of clip-shaped id batches at several thread
    counts, page-cache warm. Reports GB/s, the equivalent gathered clips/s
    at the training clip size (4 frames, 256² RGB decode buffers), and the
    host cores needed to gather-feed the measured device step rate (1,800
    clips/s at bs=128 on v5e — docs/mfu_roofline.json). No jax import: the
    sweep must be schedulable on loader cores only."""
    import os
    import tempfile

    import numpy as np

    from timetuning_tpu.native import ClipPack, _HEADER_BYTES, _MAGIC

    F, H, W, C = 4, 256, 256, 3
    frame_bytes = H * W * C
    n_frames = max(2048, int(2e9) // frame_bytes // 4)  # ~500 MB pack
    pack = os.path.join(tempfile.gettempdir(), "gather_sweep.clippack")
    need = _HEADER_BYTES + n_frames * frame_bytes
    if not (os.path.exists(pack) and os.path.getsize(pack) == need):
        header = np.array([_MAGIC, n_frames, H, W, C], np.int64)
        with open(pack, "wb") as f:
            f.write(header.tobytes())
            f.write(b"\0" * (_HEADER_BYTES - header.nbytes))
            chunk = np.random.default_rng(0).integers(
                0, 255, size=(256, frame_bytes), dtype=np.uint8)
            written = 0
            while written < n_frames:
                k = min(256, n_frames - written)
                f.write(chunk[:k].tobytes())
                written += k
    reader = ClipPack(pack)
    if not reader.using_native:
        print(json.dumps({"metric": "clippack_gather_sweep",
                          "error": "native library unavailable"}))
        return
    rng = np.random.default_rng(1)
    batch_clips = 128
    ids = [
        np.concatenate([
            np.arange(F) + s for s in rng.integers(
                0, n_frames - F, size=batch_clips)
        ]).astype(np.int64)
        for _ in range(4)
    ]
    for batch in ids:        # page-cache warm pass over every id batch —
        reader.gather(batch)  # the first thread count must not pay faults
    table = []
    for nt in (1, 2, 4, 8):
        reader.n_threads = nt
        reader.gather(ids[0])
        t0 = time.perf_counter()
        iters = 6
        for i in range(iters):
            reader.gather(ids[i % len(ids)])
        dt = time.perf_counter() - t0
        gb_s = iters * batch_clips * F * frame_bytes / dt / 1e9
        table.append({
            "threads": nt,
            "gb_per_sec": round(gb_s, 2),
            "clips_per_sec": round(gb_s * 1e9 / (F * frame_bytes), 1),
        })
    reader.close()
    device_cps = 1800.0  # measured v5e step rate at bs=128 (mfu_roofline)
    best = max(t["gb_per_sec"] for t in table)
    per_thread = table[0]["gb_per_sec"]
    need_gb_s = device_cps * F * frame_bytes / 1e9
    print(json.dumps({
        "metric": "clippack_gather_sweep",
        "host_cores": os.cpu_count(),
        "frame_bytes": frame_bytes,
        "clip_bytes": F * frame_bytes,
        "sweep": table,
        "device_step_clips_per_sec": device_cps,
        "gather_gb_s_needed_for_device_rate": round(need_gb_s, 2),
        "cores_needed_for_device_rate":
            max(1, int(np.ceil(need_gb_s / per_thread))),
        "note": "1-thread rate is the per-core memcpy bound; on this "
                f"{os.cpu_count()}-core VM extra threads time-slice one "
                "core, so the sweep's flatness is expected — the per-core "
                "bound times N cores is the host budget on a real TPU host",
        "best_gb_s": best,
    }))


def main() -> None:
    p = argparse.ArgumentParser("bench_train")
    p.add_argument("--steps", type=int, default=None,
                   help="loss-curve mode: run N steps on structured "
                        "synthetic clips and dump the loss series")
    p.add_argument("--curve_out", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--data_root", type=str, default=None,
                   help="real-data mode: DAVIS-layout tree — measures the "
                        "full pipeline (decode/gather → host→device → fused "
                        "augmentation → train step) sustained over epochs")
    p.add_argument("--dataset", type=str, default="davis")
    p.add_argument("--pack", action="store_true",
                   help="real-data mode: build + use the decode-once clip "
                        "pack (native threaded gather) instead of per-epoch "
                        "JPEG re-decode")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3,
                   help="real-data mode: first epoch warms compile + page "
                        "cache; the rest are measured")
    p.add_argument("--fast_decode", action="store_true",
                   help="JPEG DCT-domain reduced decode (>=2x sources)")
    p.add_argument("--loader_only", action="store_true",
                   help="real-data mode: measure host-side loader "
                        "throughput only (no device work) — the meaningful "
                        "number in tunneled environments where per-step "
                        "host->device uploads are artificially slow")
    p.add_argument("--arch", type=str, default="s16",
                   choices=["s16", "b16", "s8"],
                   help="BASELINE.json config rows: ViT-S/16 (default), "
                        "ViT-B/16 scale-up, ViT-S/8 dense grid")
    p.add_argument("--use_queue", action="store_true",
                   help="the use_teacher+use_queue YTVOS variant "
                        "(reference time_tuning.py:617-618, queue 16384)")
    p.add_argument("--gather_sweep", action="store_true",
                   help="measure raw clippack_gather GB/s vs thread count "
                        "(no jax) — the memcpy bound of the packed data "
                        "runtime, and the host cores needed to sustain the "
                        "device step rate (VERDICT r4 #6)")
    args = p.parse_args()

    if args.gather_sweep:
        return _gather_sweep(args)

    import jax
    import jax.numpy as jnp

    from timetuning_tpu.runtime import setup_compilation_cache

    setup_compilation_cache()

    from timetuning_tpu.core.optimizer import swav_optimizer
    from timetuning_tpu.core.timet import (
        TimeT,
        TimeTConfig,
        init_state,
        make_train_step,
    )
    from timetuning_tpu.models.extractor import FeatureExtractor
    from timetuning_tpu.models.vit import VisionTransformer, vit_small

    from timetuning_tpu.models.vit import vit_base

    B, F = args.batch_size, 4
    n_steps = args.steps or 100
    if args.arch == "b16":
        cfg = vit_base(16, img_size=224, dtype=jnp.bfloat16)
    elif args.arch == "s8":
        cfg = vit_small(8, img_size=224, dtype=jnp.bfloat16)
    else:
        cfg = vit_small(16, img_size=224, dtype=jnp.bfloat16)
    fe = FeatureExtractor(
        backbone=VisionTransformer(cfg), head_dims=(1024, 1024, 512, 256)
    )
    model = TimeT(feature_extractor=fe, n_prototypes=200)
    tcfg = TimeTConfig(
        n_prototypes=200, use_teacher=True, use_queue=args.use_queue,
        queue_size=16384,  # reference default (time_tuning.py:617)
        num_epochs=1, steps_per_epoch=max(n_steps, 100),
        spatial_resolution=224 // cfg.patch_size,
        frozen_trunk_blocks=10,  # reference unfreezes blocks 10/11 only
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 224, 224, 3))
    params = model.init(rng, sample)["params"]
    tx, trainable_mask = swav_optimizer(
        params, lr=1e-4, num_epochs=1, steps_per_epoch=max(n_steps, 100),
        opt_over_trainable=True,
    )
    state = init_state(model, tcfg, tx, rng, sample,
                       trainable_mask=trainable_mask)
    step = jax.jit(
        make_train_step(model, tcfg, tx, trainable_mask=trainable_mask,
                        opt_over_trainable=True),
        donate_argnums=(0,),
    )

    if args.data_root:
        # ---- real-data mode: loader → fused augmentation → step, sustained
        from timetuning_tpu.core.train import make_full_step
        from timetuning_tpu.data.datasets import SamplingMode
        from timetuning_tpu.data.loader import make_loader
        from timetuning_tpu.data.transforms import AugmentConfig

        pack_path = None
        if args.pack:
            import os

            from timetuning_tpu.native import build_clip_pack

            pack_path = os.path.join(args.data_root, "bench.clippack")
            if not (os.path.exists(pack_path)
                    and os.path.exists(pack_path + ".index.json")):
                plain = make_loader(
                    args.dataset, num_clip_frames=F, batch_size=B,
                    root=args.data_root, decode_size=256,
                    fast_decode=args.fast_decode, load_annotations=False,
                )
                t0 = time.perf_counter()
                build_clip_pack(plain.dataset, pack_path)
                print(f"# pack built in {time.perf_counter()-t0:.1f}s",
                      flush=True)
        loader = make_loader(
            args.dataset, num_clip_frames=F, batch_size=B, shuffle=True,
            num_workers=args.num_workers, root=args.data_root,
            decode_size=256, sampling_mode=SamplingMode.UNIFORM,
            pack_path=pack_path, fast_decode=args.fast_decode,
            # match the training driver: the loss never reads annotations
            load_annotations=False,
        )
        steps_per_epoch = len(loader)
        if steps_per_epoch == 0:
            raise SystemExit(
                f"dataset at {args.data_root} has fewer than batch_size="
                f"{B} videos — lower --batch_size"
            )
        if not args.loader_only and args.epochs < 2:
            raise SystemExit(
                "--epochs must be >= 2: epoch 0 pays compile + page-cache "
                "warmup and only later epochs are measured"
            )
        full_step = make_full_step(  # jits internally (donated state)
            model, tcfg, tx, AugmentConfig(out_size=224),
            trainable_mask=trainable_mask,
        )
        # double-buffered device prefetch: batch N+1 uploads while batch N
        # computes (mirrors core/train.py's epoch loop)
        import numpy as _np

        from timetuning_tpu.data.loader import device_prefetch

        _dev0 = jax.devices()[0]

        def _to_dev(batch):
            sizes = getattr(batch, "orig_sizes", None)
            gmeans = getattr(batch, "gray_means", None)
            if gmeans is None:
                gmeans = _np.full(batch[0].shape[:2], _np.nan, _np.float32)
            return (
                jax.device_put(_np.ascontiguousarray(batch[0]), _dev0),
                None if sizes is None
                else jax.device_put(_np.ascontiguousarray(sizes), _dev0),
                jax.device_put(_np.ascontiguousarray(gmeans), _dev0),
            )

        # loader-only epochs (host-side ceiling), after one warming epoch
        for _ in loader:
            pass
        t0 = time.perf_counter()
        nb = 0
        for ep_ in range(1, 3):   # two epochs: average over the 4-step noise
            loader.set_epoch(ep_)
            for _ in loader:
                nb += 1
        loader_cps = nb * B / (time.perf_counter() - t0)

        if args.loader_only:
            print(json.dumps({
                "metric": "clip_loader_clips_per_sec",
                "value": round(loader_cps, 1),
                "unit": f"clips/sec host-side "
                        f"({'packed native gather' if args.pack else 'jpeg decode'}, "
                        f"B={B}, workers={args.num_workers})",
                "steps_per_epoch": steps_per_epoch,
                "vs_baseline": None,
            }))
            return

        # host→device upload bandwidth (the tunnel/PCIe leg): decides
        # whether the pipeline number below is wire-bound on this host.
        # Measured after the --loader_only early return — that mode
        # isolates the host side and must not push 200 MB over the link.
        x_up = _np.zeros((B, F, 256, 256, 3), _np.uint8)
        up = jax.device_put(x_up, _dev0)
        _np.asarray(up[0, 0, 0, 0])           # sync
        t0 = time.perf_counter()
        up = jax.device_put(x_up, _dev0)
        _np.asarray(up[0, 0, 0, 0])           # force real completion
        upload_s = time.perf_counter() - t0
        upload_mbps = x_up.nbytes / 1e6 / upload_s
        upload_cps = B / upload_s
        del up

        rng_i = 0
        sustained = None
        losses = []  # device arrays — floated once at the end
        # --steps in real-data mode: keep cycling epochs until N total
        # optimization steps ran through decode → augment → loss (the
        # real-data loss-curve demonstration), then dump --curve_out
        n_epochs = args.epochs
        if args.steps:
            n_epochs = max(n_epochs, -(-args.steps // steps_per_epoch))
        t_steady = None      # wall-clock after epoch 0 (compile+cache warm)
        steps_warm = 0
        for ep in range(n_epochs):
            loader.set_epoch(ep)
            t0 = time.perf_counter()
            n = 0
            for frames_dev, sizes_dev, gmeans_dev in device_prefetch(
                loader, _to_dev
            ):
                state, m = full_step(
                    state, frames_dev, sizes_dev, gmeans_dev,
                    jax.random.PRNGKey(rng_i),
                )
                losses.append(m["loss"])
                # backpressure: sync the loss from a few steps back. Without
                # it the host races ahead of the (tunnel-slow) uploads and
                # every in-flight batch stays alive — measured 45 GB RSS at
                # step ~450 of a 550-step curve run. A small lag keeps
                # dispatch async while bounding in-flight work.
                if len(losses) > 4:
                    float(losses[-5])
                rng_i += 1
                n += 1
                if args.steps and rng_i >= args.steps:
                    break
            float(m["loss"])  # sync the epoch
            dt = time.perf_counter() - t0
            if ep > 0:  # epoch 0 pays compile + page-cache warmup
                sustained = n * B / dt
            else:
                t_steady = time.perf_counter()
                steps_warm = rng_i
            print(f"# epoch {ep}: {n} steps, {n*B/dt:.0f} clips/s", flush=True)
            if args.steps and rng_i >= args.steps:
                break
        # reconcile: sustained ≈ harmonic combination of the three serial
        # stages (loader and upload overlap the step via the worker pool and
        # device_prefetch, so the bound is the SLOWEST stage)
        stages = {
            "loader": loader_cps,
            "upload": upload_cps,
            # the step-only rate is measured by the synthetic mode; here
            # report which host stage binds
        }
        binding = min(stages, key=stages.get)
        out = {
            "metric": "timet_epoch_pipeline_clips_per_sec",
            "value": round(sustained, 1) if sustained else None,
            "unit": f"clips/sec/chip sustained ({'packed' if args.pack else 'jpeg'} "
                    f"loader + augment + step, B={B})",
            "loader_only_clips_per_sec": round(loader_cps, 1),
            "upload_mb_per_sec": round(upload_mbps, 1),
            "upload_clips_per_sec": round(upload_cps, 1),
            "binding_host_stage": binding,
            "steps_per_epoch": steps_per_epoch,
            "vs_baseline": None,
        }
        if args.curve_out:
            fl = [float(v) for v in losses]
            steady_steps = len(fl) - steps_warm
            steady_cps = (
                round(steady_steps * B / (time.perf_counter() - t_steady), 1)
                if t_steady is not None and steady_steps > 0 else None
            )  # excludes the compile/page-cache warmup epoch, like `value`
            curve = {
                "metric": "timet_loss_curve_realdata",
                "data_path": f"{'packed' if args.pack else 'jpeg'} "
                             f"{args.dataset} tree at {args.data_root}",
                "batch_size": B,
                "steps": len(fl),
                "clips_per_sec_sustained": steady_cps,
                "loss_first": round(fl[0], 4),
                "loss_min": round(min(fl), 4),
                "loss_last": round(fl[-1], 4),
                "losses": [round(v, 4) for v in fl],
            }
            with open(args.curve_out, "w") as f:
                json.dump(curve, f)
            out["curve_out"] = args.curve_out
            out["loss_first"] = curve["loss_first"]
            out["loss_last"] = curve["loss_last"]
        print(json.dumps(out))
        return

    if args.steps:
        # ---- loss-curve mode: N real optimization steps on structured clips
        gen = make_clip_generator(B, F, 224)
        losses = []
        t0 = time.perf_counter()
        for i in range(args.steps):
            clips = gen(jax.random.PRNGKey(10_000 + i))
            state, m = step(state, clips, jax.random.PRNGKey(i))
            losses.append(m["loss"])  # device array — keep dispatch async
        losses = [float(v) for v in losses]
        dt = time.perf_counter() - t0
        out = {
            "metric": "timet_loss_curve",
            "batch_size": B,
            "steps": args.steps,
            "clips_per_sec_sustained": round(B * args.steps / dt, 1),
            "loss_first": round(losses[0], 4),
            "loss_min": round(min(losses), 4),
            "loss_last": round(losses[-1], 4),
            "losses": [round(v, 4) for v in losses],
        }
        if args.curve_out:
            with open(args.curve_out, "w") as f:
                json.dump(out, f)
        print(json.dumps({k: v for k, v in out.items() if k != "losses"}))
        return

    make = jax.jit(lambda key: jax.random.normal(key, (B, F, 224, 224, 3)))
    bufs = [make(jax.random.PRNGKey(i)) for i in range(2)]
    # warmup: first post-compile steps run slower (cache/queue effects)
    for i in range(6):
        state, m = step(state, bufs[i % 2], jax.random.PRNGKey(i))
    float(m["loss"])  # sync

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, bufs[i % 2], jax.random.PRNGKey(i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters

    print(
        json.dumps(
            {
                "metric": "timet_train_step_clips_per_sec",
                "value": round(B / dt, 1),
                "unit": f"clips/sec/chip (4-frame 224px clips, ViT-{args.arch}"
                        f"{', queue' if args.use_queue else ''})",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
