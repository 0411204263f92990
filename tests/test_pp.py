"""Pipeline-parallel feature forward (parallel/pp.py) on the virtual mesh.

Equivalence target: the single-device VisionTransformer forward
(attn_impl='xla', f32 on CPU). The pipeline stages apply the model's own
Block module to sliced stage params, so agreement here proves the GPipe
schedule (stage stacking, microbatch flow, ppermute hand-offs, bubble
masking, last-stage collection) — the block math is covered elsewhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from timetuning_tpu.models.vit import ViTConfig, VisionTransformer
from timetuning_tpu.parallel.pp import (
    DATA_AXIS,
    PIPE_AXIS,
    make_dp_pp_mesh,
    make_pp_feature_fn,
    stack_stage_params,
    validate_pp_geometry,
)


def _build(img=32, patch=8, depth=4, heads=2, dim=32, batch=4):
    cfg = ViTConfig(patch_size=patch, embed_dim=dim, depth=depth,
                    num_heads=heads, img_size=img, attn_impl="xla")
    model = VisionTransformer(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, img, img, 3)),
        jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), x[:1])["params"]
    return model, params, x


def _reference(model, params, x):
    return model.apply({"params": params}, x)["tokens"]


@pytest.mark.parametrize("dp,pp,n_micro", [
    (1, 4, 4),   # pipe-only, default microbatching
    (2, 4, 2),   # dp×pp
    (4, 2, 1),   # degenerate single microbatch (pure stage split)
    (1, 2, 4),   # more microbatches than stages
])
def test_pp_forward_matches_single_device(dp, pp, n_micro):
    model, params, x = _build(depth=4, batch=8)
    want = _reference(model, params, x)

    mesh = make_dp_pp_mesh(dp, pp)
    fwd = make_pp_feature_fn(model, mesh, n_micro=n_micro)
    got = fwd(params, x)

    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_pp_uneven_stage_depth_rejected():
    model, params, x = _build(depth=3)
    cfg = model.config
    with pytest.raises(ValueError, match="not divisible"):
        validate_pp_geometry(cfg, pp=2, batch=4, dp=1, n_micro=1)
    with pytest.raises(ValueError, match="not divisible"):
        stack_stage_params(params, 2)


def test_pp_geometry_validation():
    model, _, _ = _build(depth=4)
    with pytest.raises(ValueError, match="exceeds"):
        make_dp_pp_mesh(4, 4)
    with pytest.raises(ValueError, match="n_micro"):
        validate_pp_geometry(model.config, pp=2, batch=4, dp=2, n_micro=4)


def test_pp_feature_fn_validates_at_trace_time():
    """Geometry violations surface as the validator's clear ValueError from
    make_pp_feature_fn itself, not an opaque reshape error inside shard_map."""
    model, params, x = _build(depth=3, batch=4)
    mesh = make_dp_pp_mesh(1, 2)
    with pytest.raises(ValueError, match="depth=3 not divisible"):
        make_pp_feature_fn(model, mesh)(params, x)
    model4, params4, x4 = _build(depth=4, batch=4)
    with pytest.raises(ValueError, match="n_micro"):
        make_pp_feature_fn(model4, mesh, n_micro=3)(params4, x4)


def test_pp_auto_n_micro_odd_geometry():
    """dp=1, pp=3, local batch 2: the auto rule picks n_micro=2 (largest
    divisor of the local batch ≤ pp) and the forward still matches the
    single-device reference — the dryrun's odd-device branch."""
    model, params, x = _build(depth=3, batch=2)
    want = _reference(model, params, x)
    mesh = make_dp_pp_mesh(1, 3)
    got = make_pp_feature_fn(model, mesh)(params, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_pp_stage_params_sharded_over_pipe():
    """Each pipe row holds only its own stage's blocks (the memory win):
    the stacked tree's leading axis shards P('pipe')."""
    model, params, x = _build(depth=4)
    stacked, depth = stack_stage_params(params, 4)
    assert depth == 4
    qkv = stacked["attn"]["qkv"]["kernel"]
    assert qkv.shape[:2] == (4, 1)          # [stages, blocks-per-stage, ...]

    mesh = make_dp_pp_mesh(2, 4)
    sharded = jax.device_put(stacked, NamedSharding(mesh, P(PIPE_AXIS)))
    shards = sharded["attn"]["qkv"]["kernel"].addressable_shards
    assert {s.data.shape[0] for s in shards} == {1}


def test_pp_output_sharded_over_data():
    model, params, x = _build(depth=4, batch=8)
    mesh = make_dp_pp_mesh(4, 2)
    got = make_pp_feature_fn(model, mesh)(params, x)
    assert got.sharding == NamedSharding(mesh, P(DATA_AXIS))


@pytest.mark.parametrize("dp,pp,batch,n_micro", [
    (1, 2, 2, 2),    # pipe-only
    (2, 2, 4, 2),    # dp x pp: grads also cross the data axis
])
def test_pp_schedule_differentiable(dp, pp, batch, n_micro):
    """The GPipe scan + ppermute + masked psum carry transposes: the
    pipeline forward's param gradient equals the single-device gradient
    (bubble-tick garbage must contribute exactly zero)."""
    model, params, x = _build(depth=2, batch=batch)
    mesh = make_dp_pp_mesh(dp, pp)

    from timetuning_tpu.parallel.pp import pp_forward_fn

    fwd = pp_forward_fn(model, mesh, n_micro=n_micro)

    def loss_pp(p):
        return jnp.sum(fwd(p, x) ** 2)

    def loss_ref(p):
        return jnp.sum(model.apply({"params": p}, x)["tokens"] ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_ref = jax.grad(loss_ref)(params)
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    flat_ref = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(g_ref)}
    for k, v in flat_pp:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_ref[jax.tree_util.keystr(k)]),
            rtol=1e-3, atol=2e-4, err_msg=jax.tree_util.keystr(k),
        )


def test_export_cli_pipeline_parallel(tmp_path, capsys):
    """--pipeline_parallel: stage-sharded artifact over a (2, 2) dp×pp mesh
    (GPipe schedule baked into the StableHLO) — round-trip checked against
    the live forward, and the features match the plain single-chip export."""
    from timetuning_tpu.cli import export as cli_export

    out = str(tmp_path / "feat_pp.stablehlo")
    rc = cli_export.main([
        "--architecture", "vit-tiny-test",
        "--batch_size", "4",
        "--input_resolution", "32",
        "--compute_dtype", "float32",
        "--pipeline_parallel", "2",
        "--data_parallel", "2",
        "--out", out,
        "--check", "true",
    ])
    stdout = capsys.readouterr().out
    assert rc == 0, stdout
    assert "2x2 pipe mesh" in stdout
    assert "round-trip check" in stdout

    # pp features == the plain export's features through the full AOT path
    blob, live, shape, _ = cli_export.export_features(
        "vit-tiny-test", None, 4, 32, "float32"
    )
    x = np.random.default_rng(0).integers(0, 256, shape, np.uint8)
    want = np.asarray(live(x))
    mesh = make_dp_pp_mesh(2, 2)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = np.asarray(cli_export.load_exported(out)(xs))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_export_cli_pp_exclusive_with_tp_and_sp(tmp_path):
    from timetuning_tpu.cli import export as cli_export

    with pytest.raises(ValueError, match="mutually"):
        cli_export.export_features(
            "vit-tiny-test", None, 4, 32, "float32",
            tensor_parallel=2, pipeline_parallel=2,
        )
    with pytest.raises(ValueError, match="mutually"):
        cli_export.export_features(
            "vit-tiny-test", None, 4, 32, "float32",
            sequence_parallel=2, pipeline_parallel=2,
        )
