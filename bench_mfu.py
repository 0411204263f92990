"""MFU / roofline accounting for the headline workloads (VERDICT r3 #5).

For each workload this prints: model FLOPs per unit (frame or clip),
measured throughput, achieved TF/s, and % of the chip's bf16 peak — so
"N× the target" statements are grounded in achieved-vs-peak terms.

Methodology
-----------
* **Model FLOPs** come from XLA's own cost analysis
  (``jit(...).lower(...).compile().cost_analysis()['flops']``) of an
  ``attn_impl='xla'`` twin of the program. The production path runs
  Pallas kernels, which are opaque custom calls XLA cannot cost — the XLA
  twin computes the same math, so its FLOP count is the model count
  (2·MACs convention; includes elementwise work, which is <2% here).
* **Throughput** is measured on the PRODUCTION program (fused kernels),
  steady-state with chained dispatches and distinct on-device buffers
  (bench_util.time_chained_fps — the tunnel runtime memoizes repeated
  identical calls).
* **Peak**: TPU v5e ≈ 197 TF/s bf16 (394 int8). MFU = achieved / peak.

Prints one JSON line per workload plus a trailing summary line.
"""

from __future__ import annotations

import json
import sys

V5E_BF16_PEAK_TFS = 197.0


def _flops_of(fn, *args) -> float:
    import jax

    return float(
        jax.jit(fn).lower(*args).compile().cost_analysis()["flops"]
    )


def _dense_row(name, vit_cfg_fn, patch, img, batch, iters=40):
    import jax
    import jax.numpy as jnp

    from timetuning_tpu.models.vit import VisionTransformer

    from bench_util import time_chained_fps

    cfg = vit_cfg_fn(patch, img_size=img, dtype=jnp.bfloat16)
    model = VisionTransformer(cfg)
    x0 = jnp.zeros((1, img, img, 3), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]

    def fwd(p, frames):
        return model.apply({"params": p}, frames)["tokens"]

    # FLOP count from the XLA twin (same math, costable)
    import dataclasses

    xla_model = VisionTransformer(dataclasses.replace(cfg, attn_impl="xla"))

    def fwd_xla(p, frames):
        return xla_model.apply({"params": p}, frames)["tokens"]

    xb = jnp.zeros((batch, img, img, 3), jnp.bfloat16)
    flops = _flops_of(fwd_xla, params, xb) / batch

    make = jax.jit(
        lambda key: jax.random.normal(key, (batch, img, img, 3), jnp.bfloat16)
    )
    bufs = [make(jax.random.PRNGKey(i)) for i in range(2)]
    fps = time_chained_fps(
        jax.jit(fwd), [(params, bufs[0]), (params, bufs[1])],
        iters=iters, units_per_call=batch,
    )
    return {
        "workload": name,
        "unit": "frame",
        "gflops_per_unit": round(flops / 1e9, 2),
        "rate_per_sec": round(fps, 1),
        "achieved_tf_s": round(fps * flops / 1e12, 1),
        "pct_v5e_bf16_peak": round(100 * fps * flops / 1e12
                                   / V5E_BF16_PEAK_TFS, 1),
    }


def _train_row(batch=128, iters=20):
    import jax
    import jax.numpy as jnp

    from timetuning_tpu.core.optimizer import swav_optimizer
    from timetuning_tpu.core.timet import (
        TimeT, TimeTConfig, init_state, make_train_step,
    )
    from timetuning_tpu.models.extractor import FeatureExtractor
    from timetuning_tpu.models.vit import VisionTransformer, vit_small

    from bench_util import time_chained_fps

    import dataclasses

    def build(attn_impl):
        cfg = vit_small(16, img_size=224, dtype=jnp.bfloat16)
        cfg = dataclasses.replace(cfg, attn_impl=attn_impl)
        fe = FeatureExtractor(backbone=VisionTransformer(cfg),
                              head_dims=(1024, 1024, 512, 256))
        model = TimeT(feature_extractor=fe, n_prototypes=200)
        tcfg = TimeTConfig(
            n_prototypes=200, use_teacher=True, use_queue=False,
            num_epochs=1, steps_per_epoch=100, spatial_resolution=14,
            frozen_trunk_blocks=10,
        )
        rng = jax.random.PRNGKey(0)
        sample = jnp.zeros((1, 224, 224, 3))
        params = model.init(rng, sample)["params"]
        tx, mask = swav_optimizer(params, lr=1e-4, num_epochs=1,
                                  steps_per_epoch=100,
                                  opt_over_trainable=True)
        state = init_state(model, tcfg, tx, rng, sample, trainable_mask=mask)
        step = make_train_step(model, tcfg, tx, trainable_mask=mask,
                               opt_over_trainable=True)
        return state, step

    clips0 = jnp.zeros((batch, 4, 224, 224, 3), jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    state_x, step_x = build("xla")
    flops = _flops_of(step_x, state_x, clips0, key) / batch

    state, step = build("auto")
    step = jax.jit(step)
    make = jax.jit(lambda k: jax.random.normal(
        k, (batch, 4, 224, 224, 3), jnp.bfloat16))
    bufs = [make(jax.random.PRNGKey(i)) for i in range(2)]

    # steady-state loop keeping state on device (donation would invalidate
    # the repeated-arg harness, so carry the state manually)
    import time as _time

    for i in range(3):
        state, m = step(state, bufs[i % 2], jax.random.PRNGKey(i))
    float(m["loss"])
    t0 = _time.perf_counter()
    for i in range(iters):
        state, m = step(state, bufs[i % 2], jax.random.PRNGKey(i))
    float(m["loss"])
    cps = iters * batch / (_time.perf_counter() - t0)
    return {
        "workload": "timet_train_step_s16_b128",
        "unit": "clip(4f)",
        "gflops_per_unit": round(flops / 1e9, 2),
        "rate_per_sec": round(cps, 1),
        "achieved_tf_s": round(cps * flops / 1e12, 1),
        "pct_v5e_bf16_peak": round(100 * cps * flops / 1e12
                                   / V5E_BF16_PEAK_TFS, 1),
    }


def _prop_row(T=25, S=224, CB=8, iters=10):
    """Mask-propagation eval pipeline (bench_eval.py workload): 480p
    decode-resize -> ViT-S/16 dense features -> k-NN label propagation
    -> upsampled argmax, ``CB`` clips per dispatch (the cli.propagate
    --clip_batch product path; CB=8 is the measured sweet spot)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from timetuning_tpu.data.transforms import eval_preprocess_batch
    from timetuning_tpu.models.vit import VisionTransformer, vit_small
    from timetuning_tpu.ops.propagation import propagate_labels_batch
    from timetuning_tpu.ops.resize import resize_bilinear

    from bench_util import time_chained_fps

    K = 2
    cfg = vit_small(16, img_size=S, dtype=jnp.bfloat16)
    res = S // 16

    def build(attn_impl):
        model = VisionTransformer(dataclasses.replace(cfg,
                                                      attn_impl=attn_impl))
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, S, S, 3), jnp.bfloat16))

        def clip_eval(frames_u8, first_onehots):
            bt = frames_u8.reshape((-1,) + frames_u8.shape[2:])
            # the bf16 preprocess is the production perf path (round 5);
            # the XLA costing twin keeps the same math
            x = eval_preprocess_batch(bt, out_size=S,
                                      compute_dtype=jnp.bfloat16)
            feats = model.apply(params, x)["tokens"][:, 1:]
            feats = feats.reshape(CB, T, res * res, -1)
            segs = propagate_labels_batch(
                feats, first_onehots, n_last=4, radius=12, topk=5
            )
            maps = segs.reshape(CB * (T - 1), K, res, res)
            up = resize_bilinear(maps, (S, S))
            return jnp.argmax(up, axis=1).astype(jnp.uint8).reshape(
                CB, T - 1, S, S)

        return clip_eval

    make = jax.jit(lambda key: (
        jax.random.randint(key, (CB, T, 480, 854, 3), 0, 255, jnp.uint8),
        jax.random.uniform(key, (CB, K, res * res)),
    ))
    bufs = [make(jax.random.PRNGKey(i)) for i in range(2)]
    flops = _flops_of(build("xla"), *bufs[0]) / (CB * T)
    fps = time_chained_fps(jax.jit(build("auto")), bufs, iters=iters,
                           units_per_call=CB * T)
    return {
        "workload": f"propagation_eval_s16_480p_25f_cb{CB}",
        "unit": "frame",
        "gflops_per_unit": round(flops / 1e9, 2),
        "rate_per_sec": round(fps, 1),
        "achieved_tf_s": round(fps * flops / 1e12, 1),
        "pct_v5e_bf16_peak": round(100 * fps * flops / 1e12
                                   / V5E_BF16_PEAK_TFS, 1),
    }


def main() -> None:
    from timetuning_tpu.runtime import setup_compilation_cache

    setup_compilation_cache()

    from timetuning_tpu.models.vit import vit_base, vit_small

    rows = [
        _dense_row("dense_features_s16_b256", vit_small, 16, 224, 256),
        _dense_row("dense_features_b16_b128", vit_base, 16, 224, 128),
        _dense_row("dense_features_s8_448_flash_b8", vit_small, 8, 448, 8,
                   iters=10),
        _train_row(),
        _prop_row(),
    ]
    for r in rows:
        print(json.dumps(r), flush=True)
    print(json.dumps({
        "metric": "mfu_summary",
        "peak_tf_s": V5E_BF16_PEAK_TFS,
        "flop_convention": "2*MACs, XLA cost_analysis of the attn_impl="
                           "'xla' twin program",
    }))


if __name__ == "__main__":
    sys.exit(main())
