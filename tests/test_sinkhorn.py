import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.ops.sinkhorn import sinkhorn, sinkhorn_assignment
from tests.reference_numpy import sinkhorn_np


def test_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    Q = np.exp(rng.normal(size=(16, 200)) / 0.05 * 0.1)  # [K, B]
    got = np.asarray(sinkhorn(jnp.asarray(Q), n_iters=10))
    want = sinkhorn_np(Q, 10)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_rows_sum_to_one():
    rng = np.random.default_rng(1)
    scores = rng.normal(size=(64, 20)).astype(np.float32)
    q = sinkhorn_assignment(jnp.asarray(scores), epsilon=0.05, n_iters=10)
    np.testing.assert_allclose(np.asarray(q.sum(axis=1)), 1.0, atol=1e-5)


def test_prototype_balance():
    # After enough iterations the per-prototype mass approaches B/K.
    rng = np.random.default_rng(2)
    scores = rng.normal(size=(400, 8)).astype(np.float32)
    q = np.asarray(sinkhorn_assignment(jnp.asarray(scores), n_iters=50))
    mass = q.sum(axis=0)
    np.testing.assert_allclose(mass, 400 / 8, rtol=0.05)


def test_valid_mask_equals_sliced():
    """Masked padding rows must give the same result as physically removing them."""
    rng = np.random.default_rng(3)
    scores = rng.normal(size=(100, 16)).astype(np.float32)
    valid = np.concatenate([np.ones(70), np.zeros(30)]).astype(np.float32)
    q_masked = np.asarray(
        sinkhorn_assignment(jnp.asarray(scores), n_iters=10, valid=jnp.asarray(valid))
    )[:70]
    q_sliced = np.asarray(sinkhorn_assignment(jnp.asarray(scores[:70]), n_iters=10))
    np.testing.assert_allclose(q_masked, q_sliced, rtol=1e-4, atol=1e-6)


def test_global_equals_local_concat():
    """psum'd Sinkhorn over an 8-device mesh == single-device Sinkhorn on the
    concatenated batch (SURVEY.md §4's distributed seam)."""
    n_dev = jax.device_count()
    assert n_dev >= 2, "conftest should provide 8 virtual CPU devices"
    rng = np.random.default_rng(4)
    B_per, K = 48, 12
    scores = rng.normal(size=(n_dev * B_per, K)).astype(np.float32)

    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))

    def shard_fn(s):
        return sinkhorn_assignment(
            s, n_iters=10, axis_name="data", world_size=n_dev
        )

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=jax.sharding.PartitionSpec("data"),
        out_specs=jax.sharding.PartitionSpec("data"),
    )
    got = np.asarray(sharded(jnp.asarray(scores)))
    want = np.asarray(sinkhorn_assignment(jnp.asarray(scores), n_iters=10))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_zero_row_and_column_stay_finite():
    """An all-zero prototype row (ε-underflowed scores) or sample column
    (masked queue slot) must yield a zero row/column, not NaN — the
    diagonal-scaling form would otherwise compound r/ε into inf."""
    rng = np.random.default_rng(5)
    Q = np.exp(rng.normal(size=(8, 16))).astype(np.float32)
    Q[3, :] = 0.0   # dead prototype row
    Q[:, 7] = 0.0   # dead sample column
    out = np.asarray(sinkhorn(jnp.asarray(Q), n_iters=10))
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[7], 0.0)
    np.testing.assert_array_equal(out[:, 3], 0.0)
    # live rows still normalize to 1
    live = np.delete(np.arange(16), 7)
    np.testing.assert_allclose(out[live].sum(axis=1), 1.0, atol=1e-5)
