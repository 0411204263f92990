import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.ops.propagation import (
    neighborhood_mask,
    propagate_labels,
    propagate_labels_batch,
)
from tests.reference_numpy import neighborhood_mask_np, propagate_labels_np


def test_neighborhood_mask_matches_loop_oracle():
    for h, w, r in [(7, 7, 2), (14, 14, 6), (5, 9, 1)]:
        got = np.asarray(neighborhood_mask(h, w, r))
        want = neighborhood_mask_np(h, w, r)
        np.testing.assert_array_equal(got, want)


def test_neighborhood_mask_zero_radius_is_all_ones():
    assert np.asarray(neighborhood_mask(4, 4, 0)).min() == 1.0


def _rand_clip(rng, T=5, h=7, w=7, D=16, K=6):
    feats = rng.normal(size=(T, h * w, D)).astype(np.float32)
    seg = rng.random(size=(K, h * w)).astype(np.float32)
    return feats, seg


def test_propagation_matches_numpy_oracle():
    # Compared in float64: in fp32 the top-k selection can flip on near-ties,
    # which is inherent (the PyTorch reference also upcasts this matmul to
    # double, mask_propagation.py:441). Semantic agreement is checked exactly
    # here; fp32 behavior is covered by the sanity tests below.
    rng = np.random.default_rng(0)
    T, h, w = 5, 7, 7
    feats, seg = _rand_clip(rng, T=T, h=h, w=w)
    nbhd = neighborhood_mask_np(h, w, 2)
    with jax.enable_x64():
        for n_last in [1, 2, 7]:
            got = np.asarray(
                propagate_labels(
                    jnp.asarray(feats.astype(np.float64)),
                    jnp.asarray(seg.astype(np.float64)),
                    n_last=n_last,
                    radius=2,
                    topk=5,
                )
            )
            want = propagate_labels_np(feats, seg, n_last, nbhd, topk=5)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_propagation_preserves_onehot_mass():
    """Columns of aff are normalized, so total mass per query patch is ~1 when
    segs are a partition of unity."""
    rng = np.random.default_rng(1)
    T, h, w, K = 4, 7, 7, 5
    feats = rng.normal(size=(T, h * w, 12)).astype(np.float32)
    labels = rng.integers(0, K, size=h * w)
    onehot = np.eye(K, dtype=np.float32)[labels].T  # [K, N]
    out = np.asarray(
        propagate_labels(jnp.asarray(feats), jnp.asarray(onehot), n_last=3, radius=2)
    )
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-4)


def test_batched_matches_single():
    rng = np.random.default_rng(2)
    B, T, h, w, D, K = 3, 4, 7, 7, 8, 4
    feats = rng.normal(size=(B, T, h * w, D)).astype(np.float32)
    segs = rng.random(size=(B, K, h * w)).astype(np.float32)
    batched = np.asarray(
        propagate_labels_batch(jnp.asarray(feats), jnp.asarray(segs), n_last=2, radius=2)
    )
    for b in range(B):
        single = np.asarray(
            propagate_labels(jnp.asarray(feats[b]), jnp.asarray(segs[b]), n_last=2, radius=2)
        )
        np.testing.assert_allclose(batched[b], single, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("B", [3, 18])
def test_batched_long_clip_paths_match_single(B):
    """T > 8 routes to the unrolled loop (B <= 16) or lax.map (B > 16)
    instead of vmap (pathological compile at eval clip lengths) — both must
    reproduce the per-clip scan."""
    rng = np.random.default_rng(4)
    T, h, w, D, K = 10, 5, 5, 8, 4
    feats = rng.normal(size=(B, T, h * w, D)).astype(np.float32)
    segs = rng.random(size=(B, K, h * w)).astype(np.float32)
    batched = np.asarray(
        propagate_labels_batch(jnp.asarray(feats), jnp.asarray(segs),
                               n_last=3, radius=2)
    )
    for b in (0, B - 1):
        single = np.asarray(
            propagate_labels(jnp.asarray(feats[b]), jnp.asarray(segs[b]),
                             n_last=3, radius=2)
        )
        np.testing.assert_allclose(batched[b], single, rtol=1e-5, atol=1e-6)


def test_propagation_is_jittable():
    rng = np.random.default_rng(3)
    feats, seg = _rand_clip(rng)
    fn = jax.jit(
        lambda f, s: propagate_labels(f, s, n_last=2, radius=2, topk=5)
    )
    out = fn(jnp.asarray(feats), jnp.asarray(seg))
    assert out.shape == (4, 6, 49)
    assert np.isfinite(np.asarray(out)).all()


def test_kth_largest_matches_topk():
    from timetuning_tpu.ops.propagation import kth_largest_value

    rng = np.random.default_rng(0)
    # random values + heavy duplicates (zeros from masked affinities)
    x = rng.random((50, 60)).astype(np.float32)
    x[x < 0.5] = 0.0
    for k in [1, 3, 5, 10]:
        want = np.asarray(jax.lax.top_k(jnp.asarray(x), k)[0][:, -1])
        got = np.asarray(kth_largest_value(jnp.asarray(x), k))
        np.testing.assert_array_equal(got, want)
    # all-identical rows
    y = jnp.ones((4, 8))
    np.testing.assert_array_equal(
        np.asarray(kth_largest_value(y, 3)), np.ones(4)
    )


def test_batched_unrolled_form_matches_single():
    """`_propagate_labels_batched_unrolled` is kept in-tree for a future
    toolchain (its T=25 XLA compile is pathological on the current one —
    KNOWN_GAPS.md) but must stay semantically exact vs the per-clip scan,
    including FIFO wraparound (T > n_slots+1)."""
    from timetuning_tpu.ops.propagation import _propagate_labels_batched_unrolled

    rng = np.random.default_rng(7)
    B, T, h, w, D, K = 4, 9, 5, 5, 8, 3
    feats = rng.normal(size=(B, T, h * w, D)).astype(np.float32)
    segs = rng.random(size=(B, K, h * w)).astype(np.float32)
    got = np.asarray(_propagate_labels_batched_unrolled(
        jnp.asarray(feats), jnp.asarray(segs), 3, 2, 4, 0.1, None))
    for b in range(B):
        single = np.asarray(
            propagate_labels(jnp.asarray(feats[b]), jnp.asarray(segs[b]),
                             n_last=3, radius=2, topk=4)
        )
        np.testing.assert_allclose(got[b], single, rtol=1e-5, atol=1e-6)
