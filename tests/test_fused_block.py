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
