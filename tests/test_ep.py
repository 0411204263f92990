"""Expert-parallel MoE layer (parallel/ep.py) on the virtual mesh.

Covers the Switch routing math against a per-token numpy oracle and the
expert-parallel sharding (same program under GSPMD with expert-stacked
weights P('expert')) against the single-device forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from timetuning_tpu.parallel.ep import (
    DATA_AXIS,
    EXPERT_AXIS,
    MoEMlp,
    ep_param_specs,
    make_dp_ep_mesh,
    make_ep_moe_fn,
    validate_ep_geometry,
)


def _build(B=4, S=8, D=16, E=4, H=32, cf=2.0, seed=0):
    module = MoEMlp(n_experts=E, hidden_dim=H, capacity_factor=cf)
    x = jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, S, D)), jnp.float32
    )
    params = module.init(jax.random.PRNGKey(0), x)["params"]
    return module, params, x


def _numpy_oracle(params, x, E, cf, n_groups=1):
    """Per-token reference: route to argmax expert, run its MLP, scale by
    the gate; drop tokens past capacity in token order. Capacity slots are
    per (group, expert): the B*S tokens split into ``n_groups`` equal
    groups, each with its own counters (the GShard grouping)."""
    B, S, D = x.shape
    xt = np.asarray(x).reshape(-1, D)
    T = xt.shape[0]
    Sg = T // n_groups
    C = max(1, int(np.ceil(Sg * cf / E)))
    logits = xt @ np.asarray(params["router"]["kernel"])
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    expert = p.argmax(-1)
    gate = p[np.arange(T), expert]
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    from scipy.stats import norm

    out = np.zeros_like(xt)
    for g in range(n_groups):
        counts = np.zeros(E, int)
        for t in range(g * Sg, (g + 1) * Sg):
            e = expert[t]
            if counts[e] < C:
                counts[e] += 1
                h = xt[t] @ w1[e] + b1[e]
                h = h * norm.cdf(h)                  # exact GELU
                out[t] = gate[t] * (h @ w2[e] + b2[e])
    return out.reshape(B, S, D)


def test_moe_matches_per_token_oracle():
    module, params, x = _build()
    got = np.asarray(module.apply({"params": params}, x))
    want = _numpy_oracle(params, x, E=4, cf=2.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_moe_capacity_overflow_drops_to_zero():
    """With capacity_factor tiny, most tokens overflow and must produce
    exactly 0 (the residual-passthrough convention)."""
    module, params, x = _build(cf=0.05)          # C = 1 slot per expert
    got = np.asarray(module.apply({"params": params}, x)).reshape(-1, 16)
    want = _numpy_oracle(params, x, E=4, cf=0.05).reshape(-1, 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # at most E tokens can be nonzero
    nonzero = (np.abs(got).sum(-1) > 1e-7).sum()
    assert nonzero <= 4


def test_moe_per_sample_groups_match_oracle():
    """group_size=-1 (the MoE-ViT setting): capacity competition is local
    to each sample — matches the oracle with n_groups=B."""
    module, params, x = _build(B=4, S=8, cf=0.6)      # C=2/expert/sample
    grouped = MoEMlp(n_experts=4, hidden_dim=32, capacity_factor=0.6,
                     group_size=-1)
    got = np.asarray(grouped.apply({"params": params}, x))
    want = _numpy_oracle(params, x, E=4, cf=0.6, n_groups=4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # and it really differs from global routing at this tight capacity
    glob = _numpy_oracle(params, x, E=4, cf=0.6, n_groups=1)
    assert np.abs(want - glob).max() > 1e-4


def test_moe_fixed_group_size():
    """group_size=16 over 32 tokens = 2 groups; non-divisor raises."""
    module, params, x = _build(B=4, S=8, cf=0.6)
    g16 = MoEMlp(n_experts=4, hidden_dim=32, capacity_factor=0.6,
                 group_size=16)
    got = np.asarray(g16.apply({"params": params}, x))
    want = _numpy_oracle(params, x, E=4, cf=0.6, n_groups=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    bad = MoEMlp(n_experts=4, hidden_dim=32, group_size=7)
    with pytest.raises(ValueError, match="does not divide"):
        bad.apply({"params": params}, x)


def test_moe_aux_loss_matches_oracle():
    """The sown Switch load-balance aux (E·Σ_e f_e·P_e per group, averaged
    over groups) matches a numpy recomputation; a zero router gives exactly
    1 (uniform P, argmax-ties-to-0 f) and a collapsed router approaches E."""
    _, params, x = _build(B=4, S=8, E=4)
    grouped = MoEMlp(n_experts=4, hidden_dim=32, capacity_factor=2.0,
                     group_size=-1)
    _, vars_ = grouped.apply({"params": params}, x, mutable=["intermediates"])
    aux = float(vars_["intermediates"]["aux_loss"][0])
    xt = np.asarray(x)                                  # groups = samples
    logits = xt @ np.asarray(params["router"]["kernel"])
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)                    # [4, 8, 4]
    oh = np.eye(4)[p.argmax(-1)]
    want = float((4 * (oh.mean(1) * p.mean(1)).sum(-1)).mean())
    np.testing.assert_allclose(aux, want, rtol=1e-5)

    k = params["router"]["kernel"]
    p_uniform = dict(params) | {"router": {"kernel": jnp.zeros_like(k)}}
    _, v0 = grouped.apply({"params": p_uniform}, x, mutable=["intermediates"])
    np.testing.assert_allclose(
        float(v0["intermediates"]["aux_loss"][0]), 1.0, rtol=1e-6
    )
    collapse = jnp.zeros_like(k).at[:, 0].set(50.0)
    p_coll = dict(params) | {"router": {"kernel": collapse}}
    x_pos = jnp.abs(x) + 0.1          # logit_0 = 50·Σx_d > 0 for every token
    _, v1 = grouped.apply({"params": p_coll}, x_pos,
                          mutable=["intermediates"])
    assert float(v1["intermediates"]["aux_loss"][0]) > 3.9   # ≈ E = 4


def _moe_timet(img=32, E=4, **cfg_kw):
    from timetuning_tpu.core.optimizer import swav_optimizer
    from timetuning_tpu.core.timet import (
        TimeT, TimeTConfig, init_state, make_train_step,
    )
    from timetuning_tpu.models.extractor import FeatureExtractor

    model_v, _, _ = _moe_vit(E=E)
    fe = FeatureExtractor(backbone=model_v, head_dims=(48, 24))
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    cfg = TimeTConfig(
        n_prototypes=8, use_teacher=True, num_epochs=1, steps_per_epoch=2,
        spatial_resolution=img // 8, n_last_frames=2,
        size_mask_neighborhood=1, axis_name=None, world_size=1, **cfg_kw,
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, img, img, 3))
    params = model.init(rng, sample)["params"]
    # unfreeze the MoE block so the router/experts actually receive updates
    tx, _ = swav_optimizer(params, lr=1e-3, num_epochs=1, steps_per_epoch=2,
                           unfreeze_layers=("blocks.1",))
    state0 = init_state(model, cfg, tx, rng, sample)
    clip = jnp.asarray(
        np.random.default_rng(3).normal(size=(4, 3, img, img, 3)),
        jnp.float32,
    )
    return model, cfg, tx, state0, clip, make_train_step(model, cfg, tx)


def test_moe_aux_weight_in_train_step():
    """moe_aux_weight adds exactly weight·aux to the reported loss at the
    same state, surfaces the unweighted balance statistic as metrics
    ['moe_aux'] ∈ [1, E], and its gradient actually moves the router
    differently than the gate-only gradient."""
    import dataclasses

    model, cfg0, tx, state0, clip, step0 = _moe_timet()
    from timetuning_tpu.core.timet import make_train_step

    cfg1 = dataclasses.replace(cfg0, moe_aux_weight=0.01)
    step1 = make_train_step(model, cfg1, tx)
    rng = jax.random.PRNGKey(7)
    st0, m0 = jax.jit(step0)(jax.tree.map(jnp.copy, state0), clip, rng)
    st1, m1 = jax.jit(step1)(jax.tree.map(jnp.copy, state0), clip, rng)
    assert "moe_aux" not in m0
    aux = float(m1["moe_aux"])
    assert 1.0 - 1e-5 <= aux <= 4.0 + 1e-5
    np.testing.assert_allclose(
        float(m1["loss"]), float(m0["loss"]) + 0.01 * aux, rtol=1e-5
    )
    r0 = st0.params["feature_extractor"]["backbone"]["blocks_1"]["moe"][
        "router"]["kernel"]
    r1 = st1.params["feature_extractor"]["backbone"]["blocks_1"]["moe"][
        "router"]["kernel"]
    assert float(jnp.abs(r1 - r0).max()) > 0


def test_moe_aux_with_frozen_trunk_tail():
    """With frozen_trunk_blocks=1 the MoE block (block 1) sits on the grad
    path: the split step still reports moe_aux and matches the full step's
    loss (the trunk share is a pure FLOP optimization)."""
    import dataclasses

    model, cfg0, tx, state0, clip, _ = _moe_timet(moe_aux_weight=0.01)
    from timetuning_tpu.core.timet import make_train_step

    step_full = make_train_step(model, cfg0, tx)
    cfg_split = dataclasses.replace(cfg0, frozen_trunk_blocks=1)
    step_split = make_train_step(model, cfg_split, tx)
    rng = jax.random.PRNGKey(7)
    _, m_full = jax.jit(step_full)(jax.tree.map(jnp.copy, state0), clip, rng)
    _, m_split = jax.jit(step_split)(jax.tree.map(jnp.copy, state0), clip, rng)
    np.testing.assert_allclose(float(m_split["loss"]), float(m_full["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_split["moe_aux"]),
                               float(m_full["moe_aux"]), rtol=1e-5)


def test_moe_aux_guards():
    """aux weight on a dense backbone, or with every MoE block frozen out of
    the grad path, is a build-time error — the router would get no
    balancing gradient."""
    import dataclasses

    from timetuning_tpu.core.optimizer import swav_optimizer
    from timetuning_tpu.core.timet import (
        TimeT, TimeTConfig, make_train_step,
    )
    from timetuning_tpu.models.extractor import FeatureExtractor
    from timetuning_tpu.models.vit import ViTConfig, VisionTransformer

    dense_v = VisionTransformer(ViTConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, img_size=32,
        attn_impl="xla",
    ))
    fe = FeatureExtractor(backbone=dense_v, head_dims=(48, 24))
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))[
        "params"]
    tx, _ = swav_optimizer(params, lr=1e-3, num_epochs=1, steps_per_epoch=2)
    cfg = TimeTConfig(n_prototypes=8, spatial_resolution=4,
                      moe_aux_weight=0.01)
    with pytest.raises(ValueError, match="no MoE block"):
        make_train_step(model, cfg, tx)

    model_m, cfg_m, tx_m, _, _, _ = _moe_timet(moe_aux_weight=0.01)
    cfg_frozen = dataclasses.replace(cfg_m, frozen_trunk_blocks=2)
    with pytest.raises(ValueError, match="no MoE block"):
        make_train_step(model_m, cfg_frozen, tx_m)


@pytest.mark.parametrize("dp,ep", [(2, 4), (4, 2)])
def test_ep_grouped_forward_matches_single_device(dp, ep):
    """Expert-parallel sharding of the per-sample-grouped layer (the
    product configuration) == single-device."""
    module = MoEMlp(n_experts=8, hidden_dim=32, capacity_factor=2.0,
                    group_size=-1)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 8, 16)), jnp.float32
    )
    params = module.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(module.apply({"params": params}, x))
    mesh = make_dp_ep_mesh(dp, ep)
    got = make_ep_moe_fn(module, mesh)(params)(params, x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("dp,ep", [(1, 8), (2, 4), (4, 2)])
def test_ep_forward_matches_single_device(dp, ep):
    module, params, x = _build(E=8, B=8)
    want = np.asarray(module.apply({"params": params}, x))

    mesh = make_dp_ep_mesh(dp, ep)
    fwd = make_ep_moe_fn(module, mesh)(params)
    got = fwd(params, x)
    assert got.sharding == NamedSharding(mesh, P(DATA_AXIS))
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=2e-4, atol=2e-5
    )


def test_ep_weights_sharded_over_expert_axis():
    module, params, x = _build(E=8, B=8)
    mesh = make_dp_ep_mesh(2, 4)
    specs = ep_param_specs(params)
    assert specs["w1"] == P(EXPERT_AXIS)
    assert specs["router"]["kernel"] == P()
    w1 = jax.device_put(params["w1"], NamedSharding(mesh, P(EXPERT_AXIS)))
    assert {s.data.shape[0] for s in w1.addressable_shards} == {2}  # 8/4


def test_ep_geometry_validation():
    with pytest.raises(ValueError, match="not divisible"):
        validate_ep_geometry(6, 4)


def test_ep_moe_fn_validates_geometry():
    """make_ep_moe_fn itself rejects n_experts % ep != 0 instead of letting
    GSPMD silently pad to an uneven expert sharding."""
    module, params, x = _build(E=6)
    mesh = make_dp_ep_mesh(2, 4)
    with pytest.raises(ValueError, match="not divisible"):
        make_ep_moe_fn(module, mesh)


def test_ep_param_specs_shape_guard():
    """A non-MoE leaf that reuses the w1/b1/w2/b2 names stays replicated
    when its leading axis is not the expert count."""
    module, params, x = _build(E=4)
    tree = dict(params)
    tree["other"] = {"w1": jnp.zeros((7, 3))}    # 7 != n_experts
    specs = ep_param_specs(tree, n_experts=4)
    assert specs["w1"] == P(EXPERT_AXIS)
    assert specs["other"]["w1"] == P()


def _moe_vit(B=4, img=32, E=4, depth=2):
    from timetuning_tpu.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=depth, num_heads=2,
                    img_size=img, attn_impl="xla",
                    moe_every_k=2, n_experts=E, moe_capacity_factor=2.0)
    model = VisionTransformer(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, img, img, 3)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x[:1])["params"]
    return model, params, x


def test_moe_vit_block_placement_and_tree():
    """moe_every_k=2 on a depth-2 ViT: block 0 dense (mlp), block 1 MoE
    (moe with expert-stacked leaves)."""
    model, params, x = _moe_vit(E=4)
    assert "mlp" in params["blocks_0"] and "moe" not in params["blocks_0"]
    assert "moe" in params["blocks_1"] and "mlp" not in params["blocks_1"]
    assert params["blocks_1"]["moe"]["w1"].shape[0] == 4


@pytest.mark.parametrize("dp,ep", [(2, 2), (1, 4)])
def test_moe_vit_forward_matches_single_device(dp, ep):
    from timetuning_tpu.parallel.ep import make_ep_feature_fn

    model, params, x = _moe_vit(B=4, E=4)
    want = model.apply({"params": params}, x)["tokens"]
    mesh = make_dp_ep_mesh(dp, ep)
    got = make_ep_feature_fn(model, mesh)(params)(params, x)
    assert got.sharding == NamedSharding(mesh, P(DATA_AXIS))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )
    # the expert-stacked leaves really shard over the expert axis
    specs = ep_param_specs(params, n_experts=4)
    assert specs["blocks_1"]["moe"]["w1"] == P(EXPERT_AXIS)
    assert specs["blocks_1"]["moe"]["router"]["kernel"] == P()
    assert specs["blocks_0"]["mlp"]["fc1"]["kernel"] == P()


def test_moe_vit_feature_fn_rejects_dense_backbone():
    from timetuning_tpu.models.vit import ViTConfig, VisionTransformer
    from timetuning_tpu.parallel.ep import make_ep_feature_fn

    dense = VisionTransformer(ViTConfig(patch_size=8, embed_dim=32, depth=2,
                                        num_heads=2, img_size=32))
    with pytest.raises(ValueError, match="MoE"):
        make_ep_feature_fn(dense, make_dp_ep_mesh(2, 2))


def test_moe_vit_grads_match_single_device():
    """Expert parallelism is trainable: the jitted-with-ep-shardings
    gradient equals the unsharded gradient on every leaf (router, experts,
    dense blocks)."""
    from timetuning_tpu.parallel.ep import make_dp_ep_mesh

    model, params, x = _moe_vit(B=4, E=4)
    mesh = make_dp_ep_mesh(2, 2)

    def loss(p):
        return jnp.sum(model.apply({"params": p}, x)["tokens"] ** 2)

    g_ref = jax.grad(loss)(params)
    specs = jax.tree.map(
        lambda sp: NamedSharding(mesh, sp), ep_param_specs(params, 4)
    )
    g_ep = jax.jit(jax.grad(loss), in_shardings=(specs,))(params)
    flat_ref = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(g_ref)}
    for k, v in jax.tree_util.tree_leaves_with_path(g_ep):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_ref[jax.tree_util.keystr(k)]),
            rtol=5e-4, atol=5e-5, err_msg=jax.tree_util.keystr(k),
        )
    assert float(jnp.abs(g_ep["blocks_1"]["moe"]["w1"]).sum()) > 0


def test_moe_timet_train_step_matches_single_device():
    """One dp×ep GSPMD TimeT step on a MoE-ViT == the single-device step:
    loss, updated expert weights, updated queue fill."""
    from timetuning_tpu.core.optimizer import swav_optimizer
    from timetuning_tpu.core.timet import (
        TimeT, TimeTConfig, init_state, make_train_step,
    )
    from timetuning_tpu.models.extractor import FeatureExtractor
    from timetuning_tpu.parallel.ep import (
        ep_state_shardings, make_ep_train_step,
    )

    model_v, _, _ = _moe_vit(E=4)
    fe = FeatureExtractor(backbone=model_v, head_dims=(48, 24))
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    img = 32
    cfg = TimeTConfig(
        n_prototypes=8, use_teacher=True, use_queue=True, queue_size=32,
        num_epochs=1, steps_per_epoch=2, spatial_resolution=img // 8,
        n_last_frames=2, size_mask_neighborhood=1,
        axis_name=None, world_size=1, moe_aux_weight=0.01,
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, img, img, 3))
    params = model.init(rng, sample)["params"]
    tx, _ = swav_optimizer(params, lr=1e-3, num_epochs=1, steps_per_epoch=2)
    state0 = init_state(model, cfg, tx, rng, sample)
    clip = jnp.asarray(
        np.random.default_rng(3).normal(size=(4, 3, img, img, 3)), jnp.float32
    )

    ref_step = jax.jit(make_train_step(model, cfg, tx))
    st_ref, m_ref = ref_step(jax.tree.map(jnp.copy, state0), clip,
                             jax.random.PRNGKey(7))

    mesh = make_dp_ep_mesh(2, 2)
    step_ep, shardings = make_ep_train_step(model, cfg, tx, mesh,
                                            state_like=state0)
    state_ep = jax.device_put(state0, shardings)
    w1 = state_ep.params["feature_extractor"]["backbone"]["blocks_1"][
        "moe"]["w1"]
    assert {s.data.shape[0] for s in w1.addressable_shards} == {2}  # 4/2
    st_ep, m_ep = step_ep(state_ep, clip, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m_ep["loss"]), float(m_ref["loss"]),
                               rtol=2e-4)
    # the Switch balance statistic survives the GSPMD partitioning too
    np.testing.assert_allclose(float(m_ep["moe_aux"]),
                               float(m_ref["moe_aux"]), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(st_ep.params["feature_extractor"]["backbone"]["blocks_1"][
            "moe"]["w1"]),
        np.asarray(st_ref.params["feature_extractor"]["backbone"]["blocks_1"][
            "moe"]["w1"]),
        rtol=2e-4, atol=1e-5,
    )
    assert int(st_ep.queue_fill) == int(st_ref.queue_fill)
    # shardings helper marks exactly the expert leaves
    sh = ep_state_shardings(state0, mesh, 4)
    assert sh.params["feature_extractor"]["backbone"]["blocks_1"]["moe"][
        "w1"].spec == P(EXPERT_AXIS)
    assert sh.params["feature_extractor"]["backbone"]["blocks_0"]["mlp"][
        "fc1"]["kernel"].spec == P()


def test_pp_rejects_moe_vit():
    from timetuning_tpu.parallel.pp import make_dp_pp_mesh, pp_forward_fn

    model, params, x = _moe_vit(E=4)
    with pytest.raises(ValueError, match="expert"):
        pp_forward_fn(model, make_dp_pp_mesh(1, 2), n_micro=2)


def test_export_cli_expert_parallel(tmp_path, capsys):
    """--expert_parallel: expert-sharded MoE artifact over a (2, 2) dp×ep
    mesh, sparse-upcycled from the dense checkpoint — round-trip checked
    against the live forward by the CLI itself."""
    from timetuning_tpu.cli import export as cli_export

    out = str(tmp_path / "feat_ep.stablehlo")
    rc = cli_export.main([
        "--architecture", "vit-tiny-test",
        "--batch_size", "4",
        "--input_resolution", "32",
        "--compute_dtype", "float32",
        "--expert_parallel", "2",
        "--data_parallel", "2",
        "--moe_every_k", "2",
        "--moe_experts", "4",
        "--out", out,
        "--check", "true",
    ])
    stdout = capsys.readouterr().out
    assert rc == 0, stdout
    assert "2x2 expert mesh" in stdout
    assert "round-trip check" in stdout


def test_export_ep_requires_moe_flags(tmp_path):
    from timetuning_tpu.cli import export as cli_export

    with pytest.raises(ValueError, match="moe_every_k"):
        cli_export.export_features(
            "vit-tiny-test", None, 4, 32, "float32", expert_parallel=2,
        )
    with pytest.raises(ValueError, match="mutually"):
        cli_export.export_features(
            "vit-tiny-test", None, 4, 32, "float32", expert_parallel=2,
            tensor_parallel=2, moe_every_k=2, moe_experts=4,
        )


def test_upcycle_copies_dense_weights():
    """Sparse upcycling: shared leaves copied, every expert == the block's
    dense MLP, router left at init."""
    from timetuning_tpu.models.vit import ViTConfig, VisionTransformer
    from timetuning_tpu.parallel.ep import upcycle_dense_to_moe

    import dataclasses

    cfg_d = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                      img_size=32, attn_impl="xla")
    cfg_m = dataclasses.replace(cfg_d, moe_every_k=2, n_experts=4)
    x = jnp.zeros((1, 32, 32, 3))
    dense = VisionTransformer(cfg_d).init(jax.random.PRNGKey(0), x)["params"]
    moe = VisionTransformer(cfg_m).init(jax.random.PRNGKey(1), x)["params"]
    up = upcycle_dense_to_moe(dense, moe, cfg_m)
    np.testing.assert_array_equal(
        up["patch_embed"]["kernel"], dense["patch_embed"]["kernel"]
    )
    np.testing.assert_array_equal(
        up["blocks_0"]["mlp"]["fc1"]["kernel"],
        dense["blocks_0"]["mlp"]["fc1"]["kernel"],
    )
    for e in range(4):
        np.testing.assert_array_equal(
            up["blocks_1"]["moe"]["w1"][e],
            dense["blocks_1"]["mlp"]["fc1"]["kernel"],
        )
        np.testing.assert_array_equal(
            up["blocks_1"]["moe"]["b2"][e],
            dense["blocks_1"]["mlp"]["fc2"]["bias"],
        )
    np.testing.assert_array_equal(
        up["blocks_1"]["moe"]["router"]["kernel"],
        moe["blocks_1"]["moe"]["router"]["kernel"],
    )


def test_ep_gradients_flow():
    """Router (through the gate) and expert weights all receive gradient
    under the EP sharding."""
    module, params, x = _build(E=4, B=4)
    mesh = make_dp_ep_mesh(2, 2)

    def loss(p):
        return jnp.sum(module.apply({"params": p}, x) ** 2)

    g = jax.jit(
        jax.grad(loss),
        in_shardings=(jax.tree.map(
            lambda sp: NamedSharding(mesh, sp), ep_param_specs(params)
        ),),
    )(params)
    assert float(jnp.abs(g["w1"]).sum()) > 0
    assert float(jnp.abs(g["router"]["kernel"]).sum()) > 0
