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

import json
import sys
import time


def main() -> None:
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

    B, F = 32, 4
    cfg = vit_small(16, img_size=224, dtype=jnp.bfloat16)
    fe = FeatureExtractor(
        backbone=VisionTransformer(cfg), head_dims=(1024, 1024, 512, 256)
    )
    model = TimeT(feature_extractor=fe, n_prototypes=200)
    tcfg = TimeTConfig(
        n_prototypes=200, use_teacher=True, use_queue=False,
        num_epochs=1, steps_per_epoch=100, spatial_resolution=14,
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 224, 224, 3))
    params = model.init(rng, sample)["params"]
    tx, _ = swav_optimizer(params, lr=1e-4, num_epochs=1, steps_per_epoch=100)
    state = init_state(model, tcfg, tx, rng, sample)
    step = jax.jit(make_train_step(model, tcfg, tx), donate_argnums=(0,))

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
                "unit": "clips/sec/chip (4-frame 224px clips)",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
