"""Optional tensor parallelism: dp×tp mesh forward == single-device forward,
with parameters genuinely sharded over the model axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.models.vit import ViTConfig, VisionTransformer
from timetuning_tpu.parallel.tp import (
    make_dp_tp_mesh,
    shard_params,
    tp_feature_fn,
    validate_tp_geometry,
    vit_param_specs,
)

IMG, PATCH = 32, 8


def _model():
    cfg = ViTConfig(patch_size=PATCH, embed_dim=32, depth=2, num_heads=4,
                    img_size=IMG, attn_impl="xla")
    m = VisionTransformer(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))["params"]
    return cfg, m, params


@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4), (8, 1)])
def test_dp_tp_forward_matches_single_device(dp, tp):
    cfg, m, params = _model()
    validate_tp_geometry(cfg, tp)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, IMG, IMG, 3)), jnp.float32
    )
    want = m.apply({"params": params}, x)["tokens"]

    mesh = make_dp_tp_mesh(dp, tp)
    sharded = shard_params(mesh, params)
    fn = tp_feature_fn(m, mesh)(sharded)
    got = fn(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


def test_params_are_actually_sharded():
    cfg, m, params = _model()
    mesh = make_dp_tp_mesh(2, 4)
    sharded = shard_params(mesh, params)
    qkv = sharded["blocks_0"]["attn"]["qkv"]["kernel"]       # [D, 3D] col-par
    assert qkv.shape == (32, 96)
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(32, 24)}                        # 3D/tp = 96/4
    fc2 = sharded["blocks_0"]["mlp"]["fc2"]["kernel"]        # [4D, D] row-par
    assert {s.data.shape for s in fc2.addressable_shards} == {(32, 32)}
    # embeddings replicated
    pos = sharded["pos_embed"]
    assert {s.data.shape for s in pos.addressable_shards} == {pos.shape}


def test_specs_cover_nested_trees():
    cfg, m, params = _model()
    specs = vit_param_specs({"feature_extractor": {"backbone": params}})
    sp = specs["feature_extractor"]["backbone"]["blocks_1"]["attn"]["proj"]["kernel"]
    from jax.sharding import PartitionSpec as P

    assert sp == P("model", None)


def test_geometry_validation():
    cfg, _, _ = _model()
    with pytest.raises(ValueError):
        validate_tp_geometry(cfg, 3)  # 4 heads not divisible by 3


# --- full training step under dp×tp (GSPMD) --------------------------------


def _timet(tx_kind="swav"):
    import optax

    from timetuning_tpu.core.optimizer import swav_optimizer
    from timetuning_tpu.core.timet import TimeT, TimeTConfig, init_state
    from timetuning_tpu.models.extractor import FeatureExtractor

    vcfg = ViTConfig(patch_size=PATCH, embed_dim=32, depth=2, num_heads=2,
                     img_size=IMG, attn_impl="xla")
    fe = FeatureExtractor(backbone=VisionTransformer(vcfg), head_dims=(48, 24))
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    cfg = TimeTConfig(
        n_prototypes=8, use_teacher=True, use_queue=True, queue_size=16,
        num_epochs=1, steps_per_epoch=2, spatial_resolution=IMG // PATCH,
        n_last_frames=2, size_mask_neighborhood=1,
        axis_name=None, world_size=1,
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, IMG, IMG, 3))
    params = model.init(rng, sample)["params"]
    if tx_kind == "swav":
        tx, _ = swav_optimizer(params, lr=1e-3, num_epochs=1, steps_per_epoch=2,
                               unfreeze_layers=("blocks.1",))
    else:
        # SGD for strict math-equivalence checks: Adam's g/(|g|+eps) update is
        # sign-like, so it amplifies float-reduction-order noise on eps-scale
        # gradient elements to ~lr-scale update differences
        tx = optax.sgd(1e-3)
    state = init_state(model, cfg, tx, rng, sample)
    return model, cfg, tx, state


def _clip_rng():
    clip = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 3, IMG, IMG, 3)), jnp.float32
    )
    return clip, jax.random.PRNGKey(1)


def test_dp_tp_train_step_shards_and_runs():
    """The GSPMD dp×tp training step with the production AdamW chain: backbone
    kernels AND Adam moments genuinely sharded over the model axis, queue over
    data, loss equal to the single-device step, shardings preserved on the
    output state."""
    import optax

    from timetuning_tpu.core.timet import make_train_step
    from timetuning_tpu.parallel.tp import make_tp_train_step

    model, cfg, tx, state = _timet()
    clip, rng = _clip_rng()

    ref_step = jax.jit(make_train_step(model, cfg, tx))
    _, ref_metrics = ref_step(state, clip, rng)

    mesh = make_dp_tp_mesh(2, 2)
    tp_step, shardings = make_tp_train_step(
        model, cfg, tx, mesh, state_like=state
    )
    state_tp = jax.device_put(state, shardings)

    # params + moments actually sharded over 'model', queue over 'data'
    qkv = state_tp.params["feature_extractor"]["backbone"]["blocks_0"][
        "attn"]["qkv"]["kernel"]
    assert {s.data.shape for s in qkv.addressable_shards} == {(32, 48)}
    adam = [s for s in jax.tree.leaves(
        state_tp.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
    ) if isinstance(s, optax.ScaleByAdamState)]
    mu_qkv = adam[0].mu["feature_extractor"]["backbone"]["blocks_1"][
        "attn"]["qkv"]["kernel"]
    assert {s.data.shape for s in mu_qkv.addressable_shards} == {(32, 48)}
    assert {s.data.shape for s in state_tp.queue.addressable_shards} == {(8, 24)}

    new_state, metrics = tp_step(state_tp, clip, rng)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-4)
    # output shardings preserved (state can feed the next step directly)
    out_qkv = new_state.params["feature_extractor"]["backbone"]["blocks_0"][
        "attn"]["qkv"]["kernel"]
    assert {s.data.shape for s in out_qkv.addressable_shards} == {(32, 48)}
    mu_out = [s for s in jax.tree.leaves(
        new_state.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
    ) if isinstance(s, optax.ScaleByAdamState)][0].mu
    mu_qkv_out = mu_out["feature_extractor"]["backbone"]["blocks_1"][
        "attn"]["qkv"]["kernel"]
    assert {s.data.shape for s in mu_qkv_out.addressable_shards} == {(32, 48)}


def test_dp_tp_train_step_matches_single_device():
    """Math equivalence: one dp×tp GSPMD step == one single-device step — loss,
    updated params, EMA teacher and queue all match (SGD chain: linear in the
    gradient, so no Adam sign-amplification of reduction-order float noise)."""
    from timetuning_tpu.core.timet import make_train_step
    from timetuning_tpu.parallel.tp import make_tp_train_step

    model, cfg, tx, state = _timet(tx_kind="sgd")
    clip, rng = _clip_rng()

    ref_step = jax.jit(make_train_step(model, cfg, tx))
    ref_state, ref_metrics = ref_step(state, clip, rng)

    mesh = make_dp_tp_mesh(2, 2)
    tp_step, shardings = make_tp_train_step(
        model, cfg, tx, mesh, state_like=state
    )
    new_state, metrics = tp_step(jax.device_put(state, shardings), clip, rng)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-4)
    for name in ("params", "teacher_params"):
        got = jax.tree.map(np.asarray, getattr(new_state, name))
        want = jax.tree.map(np.asarray, getattr(ref_state, name))
        jax.tree.map(
            lambda g, w: np.testing.assert_allclose(g, w, rtol=2e-4, atol=1e-5),
            got, want,
        )
    np.testing.assert_allclose(
        np.asarray(new_state.queue), np.asarray(ref_state.queue),
        rtol=2e-4, atol=1e-5,
    )


def test_tp_train_step_rejects_axis_name():
    import dataclasses

    from timetuning_tpu.parallel.tp import make_tp_train_step

    model, cfg, tx, state = _timet()
    bad = dataclasses.replace(cfg, axis_name="data", world_size=2)
    with pytest.raises(ValueError, match="single global program"):
        make_tp_train_step(model, bad, tx, make_dp_tp_mesh(2, 2),
                           state_like=state)
