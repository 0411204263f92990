"""Fused attention-branch kernel vs the XLA reference composition
(interpreter mode — the compiled kernel is validated on TPU hardware by the
bench pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np

from timetuning_tpu.ops.fused_attention import (
    _branch_pallas,
    attention_branch_xla,
)


def _inputs(B=3, S=17, D=32, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, S, D), jnp.float32)
    wq = jax.random.normal(ks[1], (D, 3 * D)) * 0.1
    bq = jax.random.normal(ks[2], (3 * D,)) * 0.1
    wp = jax.random.normal(ks[3], (D, D)) * 0.1
    bp = jax.random.normal(ks[4], (D,)) * 0.1
    return x, wq, bq, wp, bp


def test_fused_matches_xla_reference():
    x, wq, bq, wp, bp = _inputs()
    got = _branch_pallas(x, wq, bq, wp, bp, num_heads=4, block_b=2,
                         interpret=True)
    want = attention_branch_xla(x, wq, bq, wp, bp, num_heads=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_ragged_batch():
    # batch not divisible by block_b → padded grid, sliced output
    x, wq, bq, wp, bp = _inputs(B=5)
    got = _branch_pallas(x, wq, bq, wp, bp, num_heads=4, block_b=4,
                         interpret=True)
    want = attention_branch_xla(x, wq, bq, wp, bp, num_heads=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_padding_mask_excludes_ghost_keys():
    """S < padded S: results must be independent of the pad region."""
    x, wq, bq, wp, bp = _inputs(S=9)
    a = _branch_pallas(x, wq, bq, wp, bp, num_heads=4, block_b=1, interpret=True)
    want = attention_branch_xla(x, wq, bq, wp, bp, num_heads=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
