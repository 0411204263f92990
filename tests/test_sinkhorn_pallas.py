"""Fused Sinkhorn kernel vs the XLA path (interpreter mode — the compiled
kernel is validated on TPU by the bench pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.ops.sinkhorn import sinkhorn
from timetuning_tpu.ops.sinkhorn_pallas import sinkhorn_pallas


def _q(K=16, B=550, seed=0):
    scores = jax.random.normal(jax.random.PRNGKey(seed), (B, K)) * 0.1
    return jnp.exp(scores / 0.05).T  # [K, B]


@pytest.mark.parametrize("n_iters", [3, 10])
def test_kernel_matches_xla(n_iters):
    Q = _q()
    got = sinkhorn_pallas(Q, n_iters=n_iters, interpret=True)
    want = sinkhorn(Q, n_iters=n_iters)  # CPU → XLA path
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)


def test_kernel_valid_mask_matches_xla():
    Q = _q(seed=3)
    valid = (jnp.arange(Q.shape[1]) < 413).astype(jnp.float32)
    got = sinkhorn_pallas(Q, n_iters=10, valid=valid, interpret=True)
    want = sinkhorn(Q, n_iters=10, valid=valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)
    # invalid columns get zero assignment
    assert float(np.abs(np.asarray(got)[413:]).max()) == 0.0


def test_kernel_row_normalization():
    Q = _q(K=8, B=130, seed=5)
    out = np.asarray(sinkhorn_pallas(Q, n_iters=10, interpret=True))
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)
