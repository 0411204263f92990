"""ZeRO-1 optimizer-state sharding (beyond-reference; the reference
replicates AdamW state on every DDP rank, time_tuning.py:379-429).

Proven on the 8-virtual-device CPU mesh:
1. **Trajectory equivalence**: the ZeRO-1 step (reduce-scattered gradients,
   per-device chunk AdamW over the flat trainable vector, psum-rebuilt
   updates) matches the replicated trainable-subtree path over multiple
   steps — including the lr-group factors and the scheduled weight decay,
   which travel as per-element vectors in the sharded state.
2. **State sharding**: the Adam moment leaves live as [padded] vectors
   sharded P('data') — each device holds 1/world of the moments.
3. **Checkpoint migration**: a trainable-subtree opt_state converts exactly
   into the ZeRO-1 layout (resume path for pre-ZeRO-1 checkpoints).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from timetuning_tpu.core.optimizer import (
    migrate_subtree_to_zero1,
    swav_optimizer,
    swav_optimizer_zero1,
)
from timetuning_tpu.core.timet import (
    TimeT,
    TimeTConfig,
    init_state,
    make_train_step,
    state_partition_specs,
)
from timetuning_tpu.models.extractor import FeatureExtractor
from timetuning_tpu.models.vit import ViTConfig, VisionTransformer

IMG, PATCH = 32, 8
RES = IMG // PATCH
F = 3


def _build(world, zero1):
    vcfg = ViTConfig(patch_size=PATCH, embed_dim=32, depth=2, num_heads=2,
                     img_size=IMG, attn_impl="xla")
    fe = FeatureExtractor(backbone=VisionTransformer(vcfg), head_dims=(48, 24))
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    cfg = TimeTConfig(
        n_prototypes=8, use_teacher=True, use_queue=False,
        num_epochs=2, steps_per_epoch=4,
        spatial_resolution=RES, n_last_frames=2, size_mask_neighborhood=1,
        axis_name="data", world_size=world,
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, IMG, IMG, 3))
    params = model.init(rng, sample)["params"]
    kw = dict(lr=1e-3, num_epochs=2, steps_per_epoch=4,
              unfreeze_layers=("blocks.1",))
    if zero1:
        tx, mask, plan = swav_optimizer_zero1(params, world_size=world, **kw)
    else:
        tx, mask = swav_optimizer(params, opt_over_trainable=True, **kw)
        plan = None
    state = init_state(model, cfg, tx, rng, sample,
                       trainable_mask=mask, zero1_plan=plan)
    step = make_train_step(model, cfg, tx, trainable_mask=mask,
                           opt_over_trainable=True, zero1_plan=plan)
    return state, step, plan, mask


def _shard_step(step, state, plan):
    mesh = Mesh(np.array(jax.devices()), ("data",))
    specs = state_partition_specs(
        state, "data", zero1_padded=plan.padded if plan else None
    )
    return jax.jit(
        jax.shard_map(
            step, mesh=mesh,
            in_specs=(specs, P("data"), P()),
            out_specs=(specs, P()),
        )
    ), specs


def test_zero1_matches_replicated_subtree():
    n_dev = jax.device_count()
    assert n_dev >= 2
    clips = jnp.asarray(
        np.random.default_rng(3).normal(size=(3, 2 * n_dev, F, IMG, IMG, 3)),
        jnp.float32,
    )

    state_a, step_a, _, _ = _build(n_dev, zero1=False)
    state_b, step_b, plan, _ = _build(n_dev, zero1=True)
    assert plan.padded % n_dev == 0 and plan.padded >= plan.length

    fa, _ = _shard_step(step_a, state_a, None)
    fb, _ = _shard_step(step_b, state_b, plan)
    for i in range(clips.shape[0]):
        rng = jax.random.PRNGKey(100 + i)
        state_a, ma = fa(state_a, clips[i], rng)
        state_b, mb = fb(state_b, clips[i], rng)
        np.testing.assert_allclose(
            float(ma["loss"]), float(mb["loss"]), rtol=1e-5
        )
    # Matching trajectories through 3 AdamW+wd+lr-group updates. Tolerance
    # note: the two paths reduce gradients differently (per-leaf psum vs
    # flat-vector reduce-scatter); where a gradient is ~0, Adam's
    # m/(sqrt(v)+eps) normalization amplifies the last-ulp rounding
    # difference up to ±lr·factor, so the bound is lr-scale, not ulp-scale.
    # Exact elementwise equivalence of the transformations themselves is
    # proven collective-free in test_zero1_tx_matches_subtree_tx_exactly.
    flat_a = jax.tree.leaves(state_a.params)
    flat_b = jax.tree.leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=3e-3
        )
    # teacher EMA too (trainable-subtree EMA path is shared)
    np.testing.assert_allclose(
        np.asarray(state_a.teacher_params["prototypes"]),
        np.asarray(state_b.teacher_params["prototypes"]),
        rtol=2e-3, atol=3e-3,
    )


def test_zero1_tx_matches_subtree_tx_exactly():
    """Collective-free exactness: assembling the per-device chunk updates
    (the same ``zero1_tx`` applied to each device's slice of the
    ``Zero1State`` leaves) must reproduce the subtree ``swav_optimizer``
    update BIT-for-bit over multiple steps — same Adam, same scheduled
    decay, same lr-group factors, just flattened and chunked."""
    from jax.flatten_util import ravel_pytree

    from timetuning_tpu.core.optimizer import trainable_subtree

    vcfg = ViTConfig(patch_size=PATCH, embed_dim=32, depth=2, num_heads=2,
                     img_size=IMG, attn_impl="xla")
    fe = FeatureExtractor(backbone=VisionTransformer(vcfg), head_dims=(48, 24))
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, IMG, IMG, 3)))["params"]
    kw = dict(lr=1e-3, num_epochs=2, steps_per_epoch=4,
              unfreeze_layers=("blocks.1",))
    world = 4
    tx_sub, mask = swav_optimizer(params, opt_over_trainable=True, **kw)
    tx_g, _, plan = swav_optimizer_zero1(params, world_size=world, **kw)

    sub = trainable_subtree(params, mask)
    p_flat, unravel = ravel_pytree(sub)
    opt_sub = tx_sub.init(sub)
    opt_vec = tx_g.init(jnp.pad(p_flat, (0, plan.padded - plan.length)))

    rng = np.random.default_rng(7)
    for step in range(3):
        g_sub = jax.tree.map(
            lambda p: jnp.asarray(
                rng.normal(scale=1e-2, size=p.shape), jnp.float32
            ),
            sub,
        )
        u_sub, opt_sub = tx_sub.update(g_sub, opt_sub, sub)
        want = optax.apply_updates(sub, u_sub)

        g_flat, _ = ravel_pytree(g_sub)
        g_pad = jnp.pad(g_flat, (0, plan.padded - plan.length))
        p_pad = jnp.pad(p_flat, (0, plan.padded - plan.length))
        chunks, new_states = [], []
        for d in range(world):
            opt_d = jax.tree.map(
                lambda x: x[d * plan.chunk:(d + 1) * plan.chunk]
                if getattr(x, "ndim", 0) == 1 and x.shape[0] == plan.padded
                else x,
                opt_vec,
            )
            sl = slice(d * plan.chunk, (d + 1) * plan.chunk)
            u_d, opt_d = tx_g.update(g_pad[sl], opt_d, p_pad[sl])
            chunks.append(u_d)
            new_states.append(opt_d)
        u_full = jnp.concatenate(chunks)[: plan.length]
        got = unravel(p_flat + u_full)
        for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # stitch the sharded opt states back into the [padded] layout
        opt_vec = jax.tree.map(
            lambda *xs: jnp.concatenate(xs)
            if getattr(xs[0], "ndim", 0) == 1 and xs[0].shape[0] == plan.chunk
            else xs[0],
            *new_states,
        )
        sub = want
        p_flat, unravel = ravel_pytree(sub)


def test_zero1_moments_are_sharded():
    n_dev = jax.device_count()
    state, step, plan, _ = _build(n_dev, zero1=True)
    f, specs = _shard_step(step, state, plan)
    adam = [s for s in state.opt_state
            if isinstance(s, optax.ScaleByAdamState)][0]
    assert adam.mu.shape == (plan.padded,)
    spec_adam = [s for s in specs.opt_state
                 if isinstance(s, optax.ScaleByAdamState)][0]
    assert spec_adam.mu == P("data") and spec_adam.count == P()

    clip = jnp.asarray(
        np.random.default_rng(5).normal(size=(2 * n_dev, F, IMG, IMG, 3)),
        jnp.float32,
    )
    state, _ = f(state, clip, jax.random.PRNGKey(7))
    adam = [s for s in state.opt_state
            if isinstance(s, optax.ScaleByAdamState)][0]
    # each device holds exactly its 1/world chunk of the moments
    shards = adam.mu.addressable_shards
    assert len(shards) == n_dev
    assert all(s.data.shape == (plan.chunk,) for s in shards)
    assert float(jnp.abs(adam.mu[: plan.length]).max()) > 0.0


def test_subtree_checkpoint_migrates_into_zero1():
    n_dev = jax.device_count()
    clips = jnp.asarray(
        np.random.default_rng(11).normal(size=(2, 2 * n_dev, F, IMG, IMG, 3)),
        jnp.float32,
    )
    # two steps on the subtree layout = "the old checkpoint"
    state_a, step_a, _, _ = _build(n_dev, zero1=False)
    fa, _ = _shard_step(step_a, state_a, None)
    for i in range(2):
        state_a, _ = fa(state_a, clips[i], jax.random.PRNGKey(i))

    # migrate into a zero1 run and take one more step on each path
    state_b, step_b, plan, _ = _build(n_dev, zero1=True)
    state_b = state_b.replace(
        params=state_a.params,
        teacher_params=state_a.teacher_params,
        step=state_a.step,
        opt_state=migrate_subtree_to_zero1(state_a.opt_state, plan),
    )
    fb, _ = _shard_step(step_b, state_b, plan)
    extra = jnp.asarray(
        np.random.default_rng(13).normal(size=(2 * n_dev, F, IMG, IMG, 3)),
        jnp.float32,
    )
    state_a, ma = fa(state_a, extra, jax.random.PRNGKey(40))
    state_b, mb = fb(state_b, extra, jax.random.PRNGKey(40))
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-5)
    # lr-scale tolerance: same Adam near-zero-gradient rounding
    # amplification as test_zero1_matches_replicated_subtree
    np.testing.assert_allclose(
        np.asarray(state_a.params["prototypes"]),
        np.asarray(state_b.params["prototypes"]),
        rtol=2e-3, atol=3e-3,
    )


def test_zero1_requires_mesh_and_subtree():
    vcfg = ViTConfig(patch_size=PATCH, embed_dim=32, depth=2, num_heads=2,
                     img_size=IMG, attn_impl="xla")
    fe = FeatureExtractor(backbone=VisionTransformer(vcfg), head_dims=(48, 24))
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, IMG, IMG, 3)))["params"]
    tx, mask, plan = swav_optimizer_zero1(
        params, world_size=4, lr=1e-3, unfreeze_layers=("blocks.1",)
    )
    cfg = TimeTConfig(n_prototypes=8, spatial_resolution=RES,
                      axis_name=None, world_size=1)
    with pytest.raises(ValueError, match="zero1_plan requires"):
        make_train_step(model, cfg, tx, trainable_mask=mask,
                        opt_over_trainable=True, zero1_plan=plan)


def test_zero1_migration_rejects_foreign_trainable_set():
    """migrate_zero1_to_subtree guards against silent truncation: nonzero
    moments beyond the current trainable length (a LARGER saved set whose
    padding coincides) and a mismatched decay fingerprint both raise."""
    from timetuning_tpu.core.optimizer import (
        migrate_zero1_to_subtree,
        zero1_plan_with_padding,
    )
    from timetuning_tpu.core.timet import TimeT, init_state  # noqa: F401

    state, _, plan, mask = _build(jax.device_count(), zero1=True)
    params = state.params

    # clean round trip first (sanity)
    sub = migrate_zero1_to_subtree(state.opt_state, params, mask, plan=plan)
    assert isinstance(sub[0], optax.ScaleByAdamState)

    # 1) moments beyond the trainable length: simulate a larger saved set
    big = zero1_plan_with_padding(plan, plan.padded + 8)
    mu_big = np.zeros(big.padded, np.float32)
    mu_big[: plan.length + 4] = 0.5          # 4 foreign elements
    bad = state.opt_state._replace(
        adam=state.opt_state.adam._replace(
            mu=jnp.asarray(mu_big), nu=jnp.asarray(mu_big)
        ),
        lr_vec=jnp.asarray(big.lr_vec),
        decay_vec=jnp.asarray(big.decay_vec),
    )
    with pytest.raises(ValueError, match="different \\(larger\\) trainable"):
        migrate_zero1_to_subtree(bad, params, mask, plan=big)

    # 2) decay fingerprint mismatch (same length, different layout)
    flipped = np.asarray(plan.decay_vec).copy()
    flipped[:8] = 1.0 - flipped[:8]
    bad2 = state.opt_state._replace(decay_vec=jnp.asarray(flipped))
    with pytest.raises(ValueError, match="fingerprint"):
        migrate_zero1_to_subtree(bad2, params, mask, plan=plan)
