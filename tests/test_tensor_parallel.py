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
