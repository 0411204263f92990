"""Integration tests for the TimeT train step (tiny model, synthetic clips)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from timetuning_tpu.core.optimizer import swav_optimizer
from timetuning_tpu.core.timet import TimeT, TimeTConfig, init_state, make_train_step
from timetuning_tpu.models.extractor import FeatureExtractor
from timetuning_tpu.models.vit import ViTConfig, VisionTransformer

B, F, IMG, PATCH = 4, 3, 32, 8
RES = IMG // PATCH  # 4 → N=16 patches


def tiny_model(n_protos=8):
    vcfg = ViTConfig(
        patch_size=PATCH, embed_dim=32, depth=2, num_heads=2, img_size=IMG,
        attn_impl="xla",
    )
    fe = FeatureExtractor(backbone=VisionTransformer(vcfg), head_dims=(48, 24))
    return TimeT(feature_extractor=fe, n_prototypes=n_protos)


def make_everything(use_teacher=True, use_queue=False, axis_name=None, world=1):
    model = tiny_model()
    cfg = TimeTConfig(
        n_prototypes=8,
        use_teacher=use_teacher,
        use_queue=use_queue,
        queue_size=64,
        num_epochs=2,
        steps_per_epoch=4,
        spatial_resolution=RES,
        n_last_frames=2,
        size_mask_neighborhood=1,
        axis_name=axis_name,
        world_size=world,
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, IMG, IMG, 3))
    variables = jax.eval_shape(model.init, rng, sample)
    # real init (small model, fast)
    params = model.init(rng, sample)["params"]
    tx, _ = swav_optimizer(
        params, lr=1e-3, num_epochs=2, steps_per_epoch=4,
        unfreeze_layers=("blocks.1",),
    )
    state = init_state(model, cfg, tx, rng, sample)
    step = make_train_step(model, cfg, tx)
    return model, cfg, tx, state, step


def _clip(seed=0, b=B):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, F, IMG, IMG, 3)).astype(np.float32))


def test_train_step_runs_and_updates():
    model, cfg, tx, state, step = make_everything()
    clip = _clip()
    new_state, metrics = jax.jit(step)(state, clip, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # prototypes stay unit-norm after the update
    norms = np.linalg.norm(np.asarray(new_state.params["prototypes"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # unfrozen block changed, frozen block did not
    assert set(state.params) == {"feature_extractor", "prototypes"}
    p0 = state.params["feature_extractor"]["backbone"]
    p1 = new_state.params["feature_extractor"]["backbone"]
    assert np.allclose(
        p0["blocks_0"]["attn"]["qkv"]["kernel"], p1["blocks_0"]["attn"]["qkv"]["kernel"]
    )
    assert not np.allclose(
        p0["blocks_1"]["attn"]["qkv"]["kernel"], p1["blocks_1"]["attn"]["qkv"]["kernel"]
    )
    # head + prototypes changed
    assert not np.allclose(
        state.params["feature_extractor"]["head"]["lin0"]["kernel"],
        new_state.params["feature_extractor"]["head"]["lin0"]["kernel"],
    )


def test_teacher_ema_moves_toward_student():
    model, cfg, tx, state, step = make_everything()
    s1, _ = jax.jit(step)(state, _clip(1), jax.random.PRNGKey(2))
    # momentum m≈0.995 → teacher ≈ student after one step (reference EMA
    # direction quirk, time_tuning.py:113-115)
    t = np.asarray(s1.teacher_params["feature_extractor"]["head"]["lin0"]["kernel"])
    s = np.asarray(s1.params["feature_extractor"]["head"]["lin0"]["kernel"])
    prev = np.asarray(state.params["feature_extractor"]["head"]["lin0"]["kernel"])
    assert np.abs(t - s).max() < np.abs(prev - s).max() + 1e-9
    assert not np.allclose(t, prev)


def test_queue_fills_and_is_used():
    model, cfg, tx, state, step = make_everything(use_queue=True)
    jstep = jax.jit(step)
    fills = []
    for i in range(3):
        state, _ = jstep(state, _clip(i), jax.random.PRNGKey(i))
        fills.append(int(state.queue_fill))
    # B*10 = 40 per step, queue_size 64 → 40, 64, 64
    assert fills == [40, 64, 64]
    assert np.abs(np.asarray(state.queue)).sum() > 0


def test_no_teacher_mode():
    model, cfg, tx, state, step = make_everything(use_teacher=False)
    assert state.teacher_params is None
    s1, m = jax.jit(step)(state, _clip(2), jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))


def test_dp_matches_single_device():
    """pjit data-parallel step == single-device step on the concatenated
    batch: same loss, same updated params (SURVEY.md §4 distributed seam)."""
    n_dev = jax.device_count()
    assert n_dev >= 2

    # single device, full batch
    model, cfg, tx, state, step = make_everything()
    clip = _clip(7, b=8)
    rng = jax.random.PRNGKey(0)
    s_single, m_single = jax.jit(step)(state, clip, rng)

    # sharded: same params, batch split over the mesh
    model2, cfg2, tx2, state2, step2 = make_everything(
        axis_name="data", world=n_dev
    )
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    P = jax.sharding.PartitionSpec
    rep = P()

    state_specs = jax.tree.map(lambda _: rep, state2)
    shard_step = jax.jit(
        jax.shard_map(
            lambda st, c, r: step2(st, c, r),
            mesh=mesh,
            in_specs=(state_specs, P("data"), rep),
            out_specs=(state_specs, rep),
        )
    )
    s_shard, m_shard = shard_step(state2, clip, rng)
    np.testing.assert_allclose(
        float(m_shard["loss"]), float(m_single["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(s_shard.params["prototypes"]),
        np.asarray(s_single.params["prototypes"]),
        rtol=1e-3, atol=1e-5,
    )


def test_split_trunk_matches_full_step():
    """frozen_trunk_blocks (shared trunk across the three passes) must be a
    pure FLOP optimization: same loss, same updated params as the full
    three-pass step."""
    import dataclasses

    model, cfg, tx, state, step = make_everything()
    clip = _clip(11)
    rng = jax.random.PRNGKey(5)
    s_full, m_full = jax.jit(step)(state, clip, rng)

    cfg_split = dataclasses.replace(cfg, frozen_trunk_blocks=1)
    step_split = make_train_step(model, cfg_split, tx)
    s_split, m_split = jax.jit(step_split)(state, clip, rng)

    np.testing.assert_allclose(
        float(m_split["loss"]), float(m_full["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s_split.params), jax.tree.leaves(s_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_split.teacher_params),
                    jax.tree.leaves(s_full.teacher_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_opt_over_trainable_matches_full_tree():
    """The trainable-subtree optimizer path (subtree adam state, subtree
    pmean, EMA only on trainable leaves) must produce the exact same
    trajectory as the full-tree path: frozen leaves never change, so
    skipping them is pure traffic elimination."""
    model, cfg, _, _, _ = make_everything(use_teacher=True, use_queue=True)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, IMG, IMG, 3))
    params = model.init(rng, sample)["params"]

    tx_full, mask = swav_optimizer(
        params, lr=1e-3, num_epochs=2, steps_per_epoch=4,
        unfreeze_layers=("blocks.1",),
    )
    tx_sub, mask2 = swav_optimizer(
        params, lr=1e-3, num_epochs=2, steps_per_epoch=4,
        unfreeze_layers=("blocks.1",), opt_over_trainable=True,
    )
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, mask, mask2))

    s_full = init_state(model, cfg, tx_full, rng, sample, params=params)
    s_sub = init_state(model, cfg, tx_sub, rng, sample, params=params,
                       trainable_mask=mask)
    step_full = jax.jit(make_train_step(model, cfg, tx_full,
                                        trainable_mask=mask))
    step_sub = jax.jit(make_train_step(model, cfg, tx_sub,
                                       trainable_mask=mask,
                                       opt_over_trainable=True))

    for i in range(3):
        k = jax.random.PRNGKey(100 + i)
        clip = _clip(20 + i)
        s_full, m_full = step_full(s_full, clip, k)
        s_sub, m_sub = step_sub(s_sub, clip, k)
        np.testing.assert_allclose(float(m_sub["loss"]), float(m_full["loss"]),
                                   rtol=1e-6)

    import flax.traverse_util as tu

    flat_full = tu.flatten_dict(s_full.params)
    flat_sub = tu.flatten_dict(s_sub.params)
    flat_mask = tu.flatten_dict(mask)
    for k in flat_full:
        np.testing.assert_allclose(
            np.asarray(flat_sub[k]), np.asarray(flat_full[k]),
            rtol=1e-5, atol=1e-7, err_msg=f"params {k} (trainable={flat_mask[k]})",
        )
    for k, v in tu.flatten_dict(s_full.teacher_params).items():
        np.testing.assert_allclose(
            np.asarray(tu.flatten_dict(s_sub.teacher_params)[k]), np.asarray(v),
            rtol=1e-5, atol=1e-7, err_msg=f"teacher {k}",
        )
    np.testing.assert_allclose(np.asarray(s_sub.queue), np.asarray(s_full.queue),
                               rtol=1e-6)
    # the subtree opt state is genuinely smaller (frozen leaves absent)
    n_sub = sum(np.size(x) for x in jax.tree.leaves(s_sub.opt_state))
    n_full = sum(np.size(x) for x in jax.tree.leaves(s_full.opt_state))
    assert n_sub < n_full


def test_opt_over_trainable_multichip_matches_single():
    """Subtree path under shard_map on an 8-device mesh == single-device run
    on the concatenated batch (grads pmean over the subtree only)."""
    from jax.sharding import Mesh, PartitionSpec as P

    from timetuning_tpu.core.timet import state_partition_specs

    model = tiny_model()
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, IMG, IMG, 3))
    params = model.init(rng, sample)["params"]
    n_dev = 8
    clip = _clip(42, b=n_dev)

    def build(axis_name, world):
        cfg = TimeTConfig(
            n_prototypes=8, use_teacher=True, use_queue=False,
            num_epochs=2, steps_per_epoch=4, spatial_resolution=RES,
            n_last_frames=2, size_mask_neighborhood=1,
            axis_name=axis_name, world_size=world,
        )
        tx, mask = swav_optimizer(
            params, lr=1e-3, num_epochs=2, steps_per_epoch=4,
            unfreeze_layers=("blocks.1",), opt_over_trainable=True,
        )
        state = init_state(model, cfg, tx, rng, sample, params=params,
                           trainable_mask=mask)
        step = make_train_step(model, cfg, tx, trainable_mask=mask,
                               opt_over_trainable=True)
        return state, step

    state1, step1 = build(None, 1)
    s_single, m_single = jax.jit(step1)(state1, clip, jax.random.PRNGKey(3))

    state8, step8 = build("data", n_dev)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    specs = state_partition_specs(state8, "data")
    shard_step = jax.jit(
        jax.shard_map(
            step8, mesh=mesh,
            in_specs=(specs, P("data"), P()),
            out_specs=(specs, P()),
        )
    )
    s_shard, m_shard = shard_step(state8, clip, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(m_shard["loss"]), float(m_single["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(s_shard.params["prototypes"]),
        np.asarray(s_single.params["prototypes"]),
        rtol=1e-3, atol=1e-5,
    )


def test_split_trunk_with_queue_and_trainable_mask():
    """Split trunk composes with the queue and the restricted-autodiff
    trainable mask."""
    import dataclasses

    from timetuning_tpu.core.optimizer import swav_optimizer

    model, cfg, tx, state, step = make_everything(use_queue=True)
    rng0 = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, IMG, IMG, 3))
    params = model.init(rng0, sample)["params"]
    tx2, mask = swav_optimizer(params, lr=1e-3, num_epochs=2, steps_per_epoch=4,
                               unfreeze_layers=("blocks.1",))
    cfg_split = dataclasses.replace(cfg, frozen_trunk_blocks=1)
    step2 = make_train_step(model, cfg_split, tx2, trainable_mask=mask)
    s1, m1 = jax.jit(step2)(state, _clip(3), jax.random.PRNGKey(7))
    s_ref, m_ref = jax.jit(make_train_step(model, cfg, tx2))(
        state, _clip(3), jax.random.PRNGKey(7)
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m_ref["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params["prototypes"]),
        np.asarray(s_ref.params["prototypes"]), rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(s1.queue), np.asarray(s_ref.queue),
                               rtol=1e-4, atol=1e-6)


def _tiny_auto_model():
    vcfg = ViTConfig(
        patch_size=PATCH, embed_dim=32, depth=2, num_heads=2, img_size=IMG,
        attn_impl="auto",
    )
    fe = FeatureExtractor(backbone=VisionTransformer(vcfg), head_dims=(48, 24))
    return TimeT(feature_extractor=fe, n_prototypes=8)


def test_grad_attn_impl_clone_matches_default():
    """grad_attn_impl="xla" on an attn_impl="auto" model BUILDS the grad-path
    clone (verified below); its trajectory must equal grad_attn_impl=None,
    since on CPU in f32 the "auto" dispatcher lowers to the same XLA blocks.
    This guards the clone wiring: a clone whose config leaked into the wrong
    pass, or whose param tree diverged, would break the equality."""
    model = _tiny_auto_model()
    base = dict(
        n_prototypes=8, use_teacher=True, num_epochs=2, steps_per_epoch=4,
        spatial_resolution=RES, n_last_frames=2, size_mask_neighborhood=1,
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, IMG, IMG, 3))
    params = model.init(rng, sample)["params"]
    tx, _ = swav_optimizer(
        params, lr=1e-3, num_epochs=2, steps_per_epoch=4,
        unfreeze_layers=("blocks.1",),
    )
    # precondition: the clone condition actually fires for the "xla" arm
    assert model.feature_extractor.backbone.config.attn_impl == "auto"
    states = {}
    for impl in [None, "xla"]:
        cfg = TimeTConfig(**base, grad_attn_impl=impl)
        st = init_state(model, cfg, tx, rng, sample)
        step = jax.jit(make_train_step(model, cfg, tx))
        for i in range(2):
            st, m = step(st, _clip(i), jax.random.PRNGKey(i))
        states[impl] = (st, m)
    a, b = states[None], states["xla"]
    np.testing.assert_allclose(float(a[1]["loss"]), float(b[1]["loss"]),
                               rtol=1e-6)
    for la, lb in zip(jax.tree.leaves(a[0].params), jax.tree.leaves(b[0].params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6,
                                   atol=1e-7)


def test_grad_attn_impl_respects_forced_impl():
    """An explicitly forced attn_impl (not "auto") must NOT be rerouted by
    grad_attn_impl — forcing pins the kernel path."""
    model = tiny_model()  # attn_impl="xla" (forced)
    cfg = TimeTConfig(
        n_prototypes=8, num_epochs=1, steps_per_epoch=2,
        spatial_resolution=RES, n_last_frames=2, size_mask_neighborhood=1,
        grad_attn_impl="pallas",  # would crash on CPU if it were honored
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, IMG, IMG, 3))
    params = model.init(rng, sample)["params"]
    tx, _ = swav_optimizer(
        params, lr=1e-3, num_epochs=1, steps_per_epoch=2,
        unfreeze_layers=("blocks.1",),
    )
    st = init_state(model, cfg, tx, rng, sample)
    step = jax.jit(make_train_step(model, cfg, tx))
    st, m = step(st, _clip(0), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_grad_attn_impl_clone_changes_impl_when_different():
    """When the backbone's attn_impl differs from grad_attn_impl, the clone
    is actually built (not skipped) and still applies with the same params."""
    vcfg = ViTConfig(
        patch_size=PATCH, embed_dim=32, depth=2, num_heads=2, img_size=IMG,
        attn_impl="auto",
    )
    fe = FeatureExtractor(backbone=VisionTransformer(vcfg), head_dims=(48, 24))
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    cfg = TimeTConfig(
        n_prototypes=8, num_epochs=1, steps_per_epoch=2,
        spatial_resolution=RES, n_last_frames=2, size_mask_neighborhood=1,
        grad_attn_impl="xla",
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, IMG, IMG, 3))
    params = model.init(rng, sample)["params"]
    tx, _ = swav_optimizer(
        params, lr=1e-3, num_epochs=1, steps_per_epoch=2,
        unfreeze_layers=("blocks.1",),
    )
    st = init_state(model, cfg, tx, rng, sample)
    step = jax.jit(make_train_step(model, cfg, tx))
    st, m = step(st, _clip(0), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
