"""Fused propagation kernel vs the XLA scan path (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.ops.propagation import propagate_labels_batch
from timetuning_tpu.ops.propagation_pallas import propagate_labels_batch_pallas


def _inputs(B=2, T=4, N=16, D=24, K=6, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    feats = jax.random.normal(ks[0], (B, T, N, D), jnp.float32)
    seg = jax.nn.softmax(jax.random.normal(ks[1], (B, K, N)), axis=1)
    return feats, seg


@pytest.mark.parametrize("n_last,radius,topk", [(7, 1, 5), (1, 2, 3), (2, 0, 5)])
def test_fused_matches_scan(n_last, radius, topk):
    feats, seg = _inputs()
    want = propagate_labels_batch(feats, seg, n_last=n_last, radius=radius,
                                  topk=topk)
    got = propagate_labels_batch_pallas(feats, seg, n_last=n_last,
                                        radius=radius, topk=topk,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_longer_clip_rolls_context():
    """T > n_slots+1 exercises the FIFO wraparound and the second clip in
    the batch exercises the cross-clip scratch reset."""
    feats, seg = _inputs(B=3, T=7, N=16, D=16, K=4, seed=2)
    want = propagate_labels_batch(feats, seg, n_last=2, radius=1, topk=4)
    got = propagate_labels_batch_pallas(feats, seg, n_last=2, radius=1,
                                        topk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_nonsquare_padding():
    """N=49 (7x7) pads to 128 lanes: padded sources must not leak into the
    propagated maps."""
    feats, seg = _inputs(B=1, T=3, N=49, D=16, K=5, seed=3)
    want = propagate_labels_batch(feats, seg, n_last=3, radius=2, topk=5)
    got = propagate_labels_batch_pallas(feats, seg, n_last=3, radius=2,
                                        topk=5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_eval_length_clip():
    """T=25 (the davis_val eval length): the per-frame grid kernel must
    stay exact at eval-length context rolling (n_last=4 — many FIFO
    wraparounds) before the dispatch gate can admit eval clips."""
    feats, seg = _inputs(B=2, T=25, N=16, D=16, K=3, seed=4)
    want = propagate_labels_batch(feats, seg, n_last=4, radius=2, topk=5)
    got = propagate_labels_batch_pallas(feats, seg, n_last=4, radius=2,
                                        topk=5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
