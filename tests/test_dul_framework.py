"""DUL Framework objective vs an independent numpy oracle
(reference dul_model.py:244-574 algorithm, fixed anchor indices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from timetuning_tpu.models.dul import (
    _sample_grid_indices,
    dul_framework_loss,
)


def _logsumexp(x, axis):
    m = x.max(axis=axis, keepdims=True)
    return (m + np.log(np.exp(x - m).sum(axis=axis, keepdims=True))).squeeze(axis)


def _oracle(key1, key2, idx, idx_ref, temp, ce_ref):
    """Straight numpy rendition of the Framework loss path."""
    key2 = np.concatenate([key1[:, -1:], key2], axis=1)
    key1 = key1[:, :-1]
    B, T, K, h, w = key1.shape
    nn_ = idx.shape[1] * idx.shape[2]

    def frame0_pixels(x):
        # [B, K, h, w] → [B, hw, K]
        return np.transpose(x.reshape(B, K, h * w), (0, 2, 1))

    f0 = frame0_pixels(key1[:, 0])
    anchors = np.stack(
        [f0[b][idx[b].reshape(-1)] for b in range(B)]
    ).reshape(-1, K)

    def flat(x):
        return np.transpose(
            x.reshape(B * T, K, h * w), (0, 2, 1)
        ).reshape(-1, K)

    v1 = flat(key1) @ anchors.T / temp
    v2 = flat(key2) @ anchors.T / temp

    # softmax over all anchors, then zero out other clips' anchors
    p2 = np.exp(v2 - _logsumexp(v2, 1)[:, None])
    eye = np.zeros((B * T * h * w, B * nn_))
    for b in range(B):
        eye[b * T * h * w:(b + 1) * T * h * w,
            b * nn_:(b + 1) * nn_] = 1.0
    pseudo = np.argmax(p2 * eye, axis=1)

    ce = _logsumexp(v1, 1) - v1[np.arange(v1.shape[0]), pseudo]
    loss_temp = ce.reshape(B, T, h, w)[:, 1:].mean()

    f0_2 = frame0_pixels(key2[:, 0])
    m = idx_ref.shape[1] * idx_ref.shape[2]
    x1 = np.stack([f0[b][idx_ref[b].reshape(-1)] for b in range(B)]).reshape(-1, K)
    y1 = np.stack([f0_2[b][idx_ref[b].reshape(-1)] for b in range(B)]).reshape(-1, K)
    logits = x1 @ y1.T / temp
    labels = np.arange(B * m)
    cross = (_logsumexp(logits, 1) - logits[labels, labels]).mean()
    return ce_ref * cross + loss_temp, loss_temp, cross


def test_framework_matches_oracle():
    rng = np.random.default_rng(0)
    B, T, K, h, w = 2, 3, 6, 8, 8
    key1 = rng.normal(size=(B, T + 1, K, h, w)).astype(np.float32)
    key2 = rng.normal(size=(B, T - 1, K, h, w)).astype(np.float32)
    idx = rng.integers(0, h * w, size=(B, 4, 4))
    idx_ref = rng.integers(0, h * w, size=(B, 3, 3))

    got = dul_framework_loss(
        jnp.asarray(key1), jnp.asarray(key2), jax.random.PRNGKey(0),
        temperature=0.07, ce_ref=0.5,
        sample_idx=jnp.asarray(idx), sample_idx_ref=jnp.asarray(idx_ref),
    )
    want_main, want_temp, want_cross = _oracle(
        key1, key2, idx, idx_ref, temp=0.07, ce_ref=0.5
    )
    assert float(got["temp"]) == pytest.approx(want_temp, rel=1e-5)
    assert float(got["cross_key"]) == pytest.approx(want_cross, rel=1e-5)
    assert float(got["main"]) == pytest.approx(want_main, rel=1e-5)


def test_grid_sampling_geometry():
    """Sampled indices form an n×n uniform grid with per-batch offsets
    inside one cell (reference _sample_index semantics)."""
    B, h, w, n = 3, 16, 16, 4
    idx = np.asarray(_sample_grid_indices(jax.random.PRNGKey(2), B, h, w, n))
    assert idx.shape == (B, n, n)
    xs, ys = w // n, h // n
    for b in range(B):
        x = idx[b] % w
        y = idx[b] // w
        # columns share x, rows share y; grid pitch = cell size
        assert (np.diff(x, axis=1) == xs).all()
        assert (np.diff(y, axis=0) == ys).all()
        assert 0 <= x[0, 0] < xs and 0 <= y[0, 0] < ys


def test_framework_is_jittable_and_finite():
    rng = np.random.default_rng(1)
    key1 = jnp.asarray(rng.normal(size=(2, 4, 6, 8, 8)), jnp.float32)
    key2 = jnp.asarray(rng.normal(size=(2, 2, 6, 8, 8)), jnp.float32)
    fn = jax.jit(lambda a, b, r: dul_framework_loss(a, b, r)["main"])
    v = float(fn(key1, key2, jax.random.PRNGKey(3)))
    assert np.isfinite(v)
