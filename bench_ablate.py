"""On-chip phase ablation of the flagship TimeT train step (S/16, B=128).

Answers "where do the step's milliseconds live" by timing each phase of
the step in isolation and reconciling against the full step:

  * ``full_step``        — the production jitted train step (state carried).
  * ``trunk_fwd``        — the shared frozen trunk (blocks 0-9, no grad)
                           over all B*F frames: the no-grad substrate every
                           pass reuses (reference trains only blocks 10/11 +
                           head, time_tuning.py:574).
  * ``trunk_student_tail`` — trunk + the student's trainable tail
                           (blocks 10-11 + norm), i.e. the full student
                           backbone forward.
  * ``propagation``      — the batched label-propagation loss substrate at
                           step shapes (reference leibniz loss path,
                           time_tuning.py:214-268).
  * ``sinkhorn``         — the Sinkhorn assignment at step shapes
                           ([B*N, K] = [25088, 200], 10 iterations).

Methodology matches bench_util: alternate ≥2 distinct device buffers
(the tunnel runtime memoizes identical dispatches), warm synced calls,
then a chain of dispatches synced ONCE via scalar readback. One caveat
unique to this bench: isolated small ops additionally pay a fixed
per-dispatch floor through the tunnel (~1.3 ms on this VM, measured here
as ``dispatch_floor`` by timing a trivial scalar program the same way and
confirmed by iteration-count extrapolation: sinkhorn at 3 vs 10 iters
differs by only ~66 us/iter around that fixed cost). Small-phase rows
therefore report both the raw measurement and a floor-corrected estimate;
inside the single jitted train step the phases pay their device time
only, so the corrected numbers are the ones that add up.

Prints one JSON line per phase plus a residual line (teacher tail +
gradient path + optimizer/EMA + glue = full - student fwd - small
phases).
"""

from __future__ import annotations

import json
import sys
import time


def _timeit_ms(fn, bufs, iters=20, warm=3):
    """Mean ms/call of chained dispatches; fn must return a scalar
    (readback sync — block_until_ready can be a no-op on the tunnel)."""
    out = None
    for i in range(warm):
        out = fn(*bufs[i % len(bufs)])
        _ = float(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*bufs[i % len(bufs)])
    _ = float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    from timetuning_tpu.runtime import setup_compilation_cache

    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from timetuning_tpu.core.optimizer import swav_optimizer
    from timetuning_tpu.core.timet import (TimeT, TimeTConfig, init_state,
                                           make_train_step)
    from timetuning_tpu.models.extractor import FeatureExtractor
    from timetuning_tpu.models.vit import VisionTransformer, vit_small
    from timetuning_tpu.ops.propagation import propagate_labels_batch
    from timetuning_tpu.ops.sinkhorn import sinkhorn_assignment

    B, F = 128, 4
    cfg = vit_small(16, img_size=224, dtype=jnp.bfloat16)
    fe = FeatureExtractor(backbone=VisionTransformer(cfg),
                          head_dims=(1024, 1024, 512, 256))
    model = TimeT(feature_extractor=fe, n_prototypes=200)
    tcfg = TimeTConfig(n_prototypes=200, use_teacher=True, use_queue=False,
                       num_epochs=1, steps_per_epoch=100,
                       spatial_resolution=14, frozen_trunk_blocks=10)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 224, 224, 3))
    params = model.init(rng, sample)["params"]
    tx, mask = swav_optimizer(params, lr=1e-4, num_epochs=1,
                              steps_per_epoch=100, opt_over_trainable=True)
    state = init_state(model, tcfg, tx, rng, sample, trainable_mask=mask)
    step = jax.jit(make_train_step(model, tcfg, tx, trainable_mask=mask,
                                   opt_over_trainable=True))

    make = jax.jit(
        lambda k: jax.random.normal(k, (B, F, 224, 224, 3), jnp.bfloat16))
    bufs = [make(jax.random.PRNGKey(i)) for i in range(2)]

    # Fixed per-dispatch floor through the tunnel (subtracted from the
    # small-phase rows; the big rows dwarf it).
    tiny = jax.jit(lambda x: (x * 1.0000001).sum())
    scal = [(jnp.float32(i),) for i in range(2)]
    floor_ms = _timeit_ms(tiny, scal, iters=30)
    print(json.dumps({"phase": "dispatch_floor", "ms": round(floor_ms, 2),
                      "note": "fixed tunnel dispatch cost paid by every "
                              "isolated measurement below"}), flush=True)

    # (a) full production step — carry state so it is the real loop.
    st = [state]

    def full(clip, key):
        st[0], m = step(st[0], clip, key)
        return m["loss"]

    full_ms = _timeit_ms(
        full, [(bufs[i % 2], jax.random.PRNGKey(i)) for i in range(4)])
    print(json.dumps({"phase": "full_step", "ms": round(full_ms, 2),
                      "clips_per_sec": round(B / full_ms * 1e3)}),
          flush=True)

    # (b) shared frozen trunk over all frames (the no-grad substrate).
    vp = params["feature_extractor"]["backbone"]

    def _trunk(clip):
        frames = clip.reshape(B * F, 224, 224, 3)
        return fe.backbone.apply({"params": vp}, frames,
                                 stop_block=tcfg.frozen_trunk_blocks)["hidden"]

    trunk_ms = _timeit_ms(jax.jit(lambda c: _trunk(c).mean()),
                          [(b,) for b in bufs])
    print(json.dumps({"phase": "trunk_fwd_512f", "ms": round(trunk_ms, 2),
                      "pct_of_step": round(100 * trunk_ms / full_ms, 1)}),
          flush=True)

    # (c) trunk + student tail = the full student backbone forward.
    @jax.jit
    def trunk_tail(clip):
        h = _trunk(clip)
        out = fe.backbone.apply({"params": vp}, h,
                                start_block=tcfg.frozen_trunk_blocks)
        return out["tokens"].mean()

    tt_ms = _timeit_ms(trunk_tail, [(b,) for b in bufs])
    print(json.dumps({"phase": "trunk_student_tail", "ms": round(tt_ms, 2),
                      "pct_of_step": round(100 * tt_ms / full_ms, 1)}),
          flush=True)

    # (d) propagation at step shapes: feats [B, F, 196, 384].
    mkf = jax.jit(lambda k: (
        jax.random.normal(k, (B, F, 196, 384), jnp.bfloat16),
        jax.random.uniform(k, (B, 200, 196), jnp.float32)))
    fb = [mkf(jax.random.PRNGKey(i)) for i in range(2)]
    prop = jax.jit(lambda f, s: propagate_labels_batch(
        f, s, n_last=tcfg.n_last_frames, radius=tcfg.size_mask_neighborhood,
        topk=tcfg.topk).mean())
    prop_ms = _timeit_ms(prop, fb)
    print(json.dumps({"phase": "propagation", "ms_raw": round(prop_ms, 2),
                      "ms_corrected": round(max(prop_ms - floor_ms, 0.0), 2)}),
          flush=True)

    # (e) Sinkhorn at step shapes [B*196, 200], 10 iters.
    mks = jax.jit(
        lambda k: jax.random.normal(k, (B * 196, 200), jnp.float32) * 0.3)
    sb = [(mks(jax.random.PRNGKey(i)),) for i in range(2)]
    sk = jax.jit(lambda s: sinkhorn_assignment(
        s, tcfg.epsilon, tcfg.sinkhorn_iterations).mean())
    sk_ms = _timeit_ms(sk, sb)
    print(json.dumps({"phase": "sinkhorn", "ms_raw": round(sk_ms, 2),
                      "ms_corrected": round(max(sk_ms - floor_ms, 0.0), 2)}),
          flush=True)

    resid = (full_ms - tt_ms - max(prop_ms - floor_ms, 0.0)
             - max(sk_ms - floor_ms, 0.0))
    print(json.dumps({
        "phase": "residual_teacher_tail_grad_opt",
        "ms": round(resid, 2),
        "pct_of_step": round(100 * resid / full_ms, 1),
        "note": "teacher tail fwd + backward through tail+head + "
                "optimizer/EMA + glue",
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
