"""Sequence-parallel feature forward (parallel/sp.py) on the virtual mesh.

Equivalence target: the single-device VisionTransformer forward
(attn_impl='xla', f32 on CPU). The sp stack composes the same math as the
single-chip long-sequence branch (LN+QKV rows -> flash -> proj+residual ->
MLP), so agreement here proves only the *sharding* — the kernel math is
covered by test_fused_block / test_flash_attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from timetuning_tpu.models.vit import ViTConfig, VisionTransformer
from timetuning_tpu.parallel.sp import (
    DATA_AXIS,
    SEQ_AXIS,
    make_dp_sp_mesh,
    make_sp_feature_fn,
)


def _build(img=32, patch=8, depth=3, heads=2, dim=32):
    cfg = ViTConfig(patch_size=patch, embed_dim=dim, depth=depth,
                    num_heads=heads, img_size=img, attn_impl="xla")
    model = VisionTransformer(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, img, img, 3)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x[:1])["params"]
    return model, params, x


def _reference(model, params, x):
    return model.apply({"params": params}, x)["tokens"]


@pytest.mark.parametrize("dp,sp", [(1, 8), (2, 4), (4, 2)])
def test_sp_forward_matches_single_device(dp, sp):
    model, params, x = _build()
    want = _reference(model, params, x)

    mesh = make_dp_sp_mesh(dp, sp)
    fwd = make_sp_feature_fn(model, mesh)
    got = fwd(params, x)

    assert got.shape == want.shape          # 17 tokens: padding sliced off
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_sp_token_padding_masked():
    """17 tokens over seq=8 pads to 24; the 7 gathered padding keys must
    not leak into the softmax (kv_len masking) — checked implicitly by the
    equivalence above, and explicitly here: the padded forward equals the
    sp=1 (no padding) forward."""
    model, params, x = _build()
    got8 = make_sp_feature_fn(model, make_dp_sp_mesh(1, 8))(params, x)
    got1 = make_sp_feature_fn(model, make_dp_sp_mesh(1, 1))(params, x)
    np.testing.assert_allclose(
        np.asarray(got8), np.asarray(got1), rtol=2e-4, atol=2e-5
    )


def test_sp_output_sharded_over_data():
    model, params, x = _build()
    mesh = make_dp_sp_mesh(4, 2)
    got = make_sp_feature_fn(model, mesh)(params, x)
    assert got.sharding == NamedSharding(mesh, P(DATA_AXIS))
    assert len(got.addressable_shards) == 8
    assert mesh.shape[SEQ_AXIS] == 2


def test_sp_geometry_validation():
    with pytest.raises(ValueError, match="exceeds"):
        make_dp_sp_mesh(4, 4)


def test_sp_flash_kv_len_decoupled_shapes():
    """The generalized flash core: local queries (Sq=5) against gathered
    keys (Sk=24) with kv_len=17 == full-length masked reference."""
    from timetuning_tpu.ops.flash_attention import (
        flash_attention,
        flash_attention_xla,
    )

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 2, 5, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 24, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 2, 24, 16)), jnp.float32)
    got = flash_attention(q, k, v, kv_len=17)
    want = flash_attention_xla(q, k[:, :, :17], v[:, :, :17])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # gradients flow and padding keys get zero grad
    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_len=17) ** 2)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert np.abs(np.asarray(dk)[:, :, 17:]).max() == 0
    assert np.abs(np.asarray(dv)[:, :, 17:]).max() == 0
    assert np.isfinite(np.asarray(dq)).all()


@pytest.mark.parametrize("dp,sp", [(1, 4), (2, 2)])
def test_sp_backward_matches_single_device(dp, sp):
    """Backward through the token-sharded stack: the parameter gradient of
    a loss on the sequence-parallel features equals the single-device
    gradient on every leaf (all_gather transposes to psum_scatter; padding
    keys contribute exactly zero)."""
    from timetuning_tpu.parallel.sp import sp_forward_fn

    model, params, x = _build()
    mesh = make_dp_sp_mesh(dp, sp)
    fwd = sp_forward_fn(model, mesh)

    def loss_sp(p):
        return jnp.sum(fwd(p, x) ** 2)

    def loss_ref(p):
        return jnp.sum(_reference(model, p, x) ** 2)

    g_sp = jax.jit(jax.grad(loss_sp))(params)
    g_ref = jax.grad(loss_ref)(params)
    flat_ref = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(g_ref)}
    for k, v in jax.tree_util.tree_leaves_with_path(g_sp):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_ref[jax.tree_util.keystr(k)]),
            rtol=1e-3, atol=2e-4, err_msg=jax.tree_util.keystr(k),
        )
