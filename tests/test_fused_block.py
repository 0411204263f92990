"""Whole-block fused kernels vs XLA references (interpreter mode), and
tree-compatibility of the fused Block path."""

import jax
import jax.numpy as jnp
import numpy as np

from timetuning_tpu.ops.fused_block import (
    _attn_pallas,
    _mlp_pallas,
    attention_block_xla,
    mlp_block_xla,
)


def _inputs(B=3, S=17, D=32, hidden=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    x = jax.random.normal(ks[0], (B, S, D), jnp.float32)
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
    ln_b = 0.1 * jax.random.normal(ks[2], (D,))
    wq = jax.random.normal(ks[3], (D, 3 * D)) * 0.1
    bq = jax.random.normal(ks[4], (3 * D,)) * 0.1
    wp = jax.random.normal(ks[5], (D, D)) * 0.1
    bp = jax.random.normal(ks[6], (D,)) * 0.1
    w1 = jax.random.normal(ks[7], (D, hidden)) * 0.1
    b1 = jax.random.normal(ks[8], (hidden,)) * 0.1
    w2 = jax.random.normal(ks[9], (hidden, D)) * 0.1
    b2 = jnp.zeros((D,))
    return x, ln_s, ln_b, wq, bq, wp, bp, w1, b1, w2, b2


def test_attention_block_matches_xla():
    x, ln_s, ln_b, wq, bq, wp, bp, *_ = _inputs()
    got = _attn_pallas(x, ln_s, ln_b, wq, bq, wp, bp, num_heads=4,
                       block_b=2, interpret=True)
    want = attention_block_xla(x, ln_s, ln_b, wq, bq, wp, bp, num_heads=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_mlp_block_matches_xla():
    x, ln_s, ln_b, _, _, _, _, w1, b1, w2, b2 = _inputs()
    got = _mlp_pallas(x, ln_s, ln_b, w1, b1, w2, b2, block_b=2, interpret=True)
    want = mlp_block_xla(x, ln_s, ln_b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_mlp_rows_kernel_matches_xla():
    """The row-chunked long-sequence MLP kernel (dispatched above 1024
    tokens) == the XLA reference, including ragged row padding."""
    from timetuning_tpu.ops.fused_block import _mlp_rows_pallas

    x, ln_s, ln_b, _, _, _, _, w1, b1, w2, b2 = _inputs(B=2, S=37)
    got = _mlp_rows_pallas(x, ln_s, ln_b, w1, b1, w2, b2, block_rows=16,
                           interpret=True)
    want = mlp_block_xla(x, ln_s, ln_b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_long_sequence_attention_branch_matches_xla():
    """fused-LN+QKV rows → flash core → fused-proj+residual rows (the
    >1024-token attention block branch) == attention_block_xla. Composed
    from the interpret-mode kernels + the flash XLA fallback on CPU."""
    from timetuning_tpu.ops.fused_block import (
        _dense_residual_pallas,
        _ln_dense_pallas,
        dense_residual_xla,
        ln_dense_xla,
    )
    from timetuning_tpu.ops.flash_attention import flash_attention

    H = 4
    x, ln_s, ln_b, wq, bq, wp, bp, *_ = _inputs(B=2, S=29)
    B, S, D = x.shape
    Dh = D // H

    qkv = _ln_dense_pallas(x, ln_s, ln_b, wq, bq, block_rows=16,
                           interpret=True)
    np.testing.assert_allclose(
        np.asarray(qkv), np.asarray(ln_dense_xla(x, ln_s, ln_b, wq, bq)),
        rtol=1e-4, atol=1e-5,
    )
    qkv = qkv.reshape(B, S, 3, H, Dh)
    q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
    o = flash_attention(q, k, v)
    merged = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, S, D)
    got = _dense_residual_pallas(merged, x, wp, bp, block_rows=16,
                                 interpret=True)
    np.testing.assert_allclose(
        np.asarray(got),
        np.asarray(dense_residual_xla(merged, x, wp, bp)),
        rtol=1e-4, atol=1e-5,
    )
    want = attention_block_xla(x, ln_s, ln_b, wq, bq, wp, bp, num_heads=H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_rows_kernel_vjps_match_xla():
    """The rows kernels' custom VJPs (XLA recompute) give the same gradients
    as direct autodiff through the XLA compositions."""
    from timetuning_tpu.ops.fused_block import (
        _dr_bwd,
        _ld_bwd,
        dense_residual_xla,
        ln_dense_xla,
    )

    x, ln_s, ln_b, wq, bq, wp, bp, *_ = _inputs(B=2, S=13)
    g = jax.random.normal(jax.random.PRNGKey(7), (2, 13, 3 * 32))
    got = _ld_bwd((x, ln_s, ln_b, wq, bq), g)
    _, vjp = jax.vjp(ln_dense_xla, x, ln_s, ln_b, wq, bq)
    for a, b in zip(got, vjp(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    y = jax.random.normal(jax.random.PRNGKey(8), x.shape)
    g2 = jax.random.normal(jax.random.PRNGKey(9), x.shape)
    got2 = _dr_bwd((y, x, wp, bp), g2)
    _, vjp2 = jax.vjp(dense_residual_xla, y, x, wp, bp)
    for a, b in zip(got2, vjp2(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fused_block_param_tree_matches_unfused():
    """Init through the fused path and the XLA path must produce identical
    param trees (checkpoint compatibility)."""
    from timetuning_tpu.models.vit import Block
    import flax.traverse_util as tu

    x = jnp.zeros((1, 17, 32))
    trees = {}
    for impl in ["xla", "fused"]:
        blk = Block(num_heads=4, mlp_ratio=2.0, attn_impl=impl)
        try:
            params = jax.eval_shape(
                lambda: blk.init(jax.random.PRNGKey(0), x)
            )["params"]
        except Exception:
            # fused path needs pallas lowering even under eval_shape on
            # non-TPU backends in some versions — fall back to real init of
            # the xla tree and shape-compare via the xla side only.
            params = blk.init(jax.random.PRNGKey(0), x)["params"]
        trees[impl] = {
            k: v.shape for k, v in tu.flatten_dict(params, sep="/").items()
        }
    assert trees["xla"] == trees["fused"]
