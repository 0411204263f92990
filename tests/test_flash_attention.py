"""Tiled-online-softmax flash attention vs the XLA reference (interpreter
mode for the kernel; compiled validation happens on TPU via the bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.ops.attention import attention_xla
from timetuning_tpu.ops.flash_attention import (
    _chunked_bwd,
    flash_attention,
    flash_attention_fwd_pallas,
)


def _qkv(B=1, H=2, S=1300, Dh=32, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, H, S, Dh)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.mark.parametrize("S", [197, 1300])
def test_flash_kernel_matches_xla(S):
    q, k, v = _qkv(S=S)
    got = flash_attention_fwd_pallas(q, k, v, block_q=256, block_k=512,
                                     interpret=True)
    want, _ = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_flash_kernel_ragged_tiles():
    """S not a multiple of either tile: padded queries sliced, padded keys
    masked out of the online softmax."""
    q, k, v = _qkv(S=1201)
    got = flash_attention_fwd_pallas(q, k, v, block_q=256, block_k=512,
                                     interpret=True)
    want, _ = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_flash_kernel_small_tiles_many_steps():
    """Force many online-softmax rescale steps (block_k ≪ S)."""
    q, k, v = _qkv(S=640, Dh=16, seed=3)
    got = flash_attention_fwd_pallas(q, k, v, block_q=128, block_k=128,
                                     interpret=True)
    want, _ = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_flash_gradients_match_xla():
    """Chunked analytic backward == autodiff through the XLA reference."""
    q, k, v = _qkv(S=523, Dh=16, seed=1)
    g = jax.random.normal(jax.random.PRNGKey(9), q.shape, q.dtype)

    def loss_flash(q, k, v):
        return jnp.vdot(flash_attention(q, k, v), g)

    def loss_xla(q, k, v):
        return jnp.vdot(attention_xla(q, k, v)[0], g)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_chunked_bwd_direct():
    q, k, v = _qkv(S=300, Dh=16, seed=2)
    g = jax.random.normal(jax.random.PRNGKey(4), q.shape, q.dtype)
    got = _chunked_bwd(q, k, v, g, block_q=128)
    _, vjp = jax.vjp(lambda *a: attention_xla(*a)[0], q, k, v)
    want = vjp(g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dispatcher_routes_long_sequences():
    """attention(impl='pallas') must not build an [S, S] VMEM tile above
    1024 tokens — on CPU the flash path falls back to XLA, so the check is
    just that the route executes and matches."""
    from timetuning_tpu.ops.attention import attention

    q, k, v = _qkv(S=1100, Dh=16, seed=5)
    out, probs = attention(q, k, v, impl="pallas")
    assert probs is None
    want, _ = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_flash_kernel_default_single_pass():
    """The production default (block_k=None → whole-K single softmax pass
    for Skp ≤ 4096, n_kt == 1) — exercised with ragged S so the padded-key
    masking of the one-shot pass is covered too."""
    q, k, v = _qkv(S=1201, Dh=16, seed=5)
    got = flash_attention_fwd_pallas(q, k, v, block_q=256, interpret=True)
    want, _ = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("S,block_k", [(1300, 512), (1201, 256), (640, 128)])
def test_flash_streamed_matches_xla(S, block_k):
    """The K/V-streamed variant (key axis as a grid dimension, carry in
    scratch — VERDICT r4 #7) is exact: matches XLA softmax attention
    including ragged tails masked out of the online recurrence."""
    from timetuning_tpu.ops.flash_attention import (
        flash_attention_fwd_pallas_streamed,
    )

    q, k, v = _qkv(S=S)
    got = flash_attention_fwd_pallas_streamed(
        q, k, v, block_q=256, block_k=block_k, interpret=True)
    want, _ = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_flash_streamed_kv_len_mask():
    from timetuning_tpu.ops.flash_attention import (
        flash_attention_fwd_pallas_streamed,
        flash_attention_xla,
    )

    q, k, v = _qkv(S=512, seed=5)
    got = flash_attention_fwd_pallas_streamed(
        q, k, v, kv_len=300, block_q=128, block_k=128, interpret=True)
    want = flash_attention_xla(q, k, v, kv_len=300)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_flash_dispatch_routes_oversized_kv_to_streamed(monkeypatch):
    """Above the measured resident-K/V VMEM bound the forward must route to
    the streamed kernel (S=32768 fails scoped-vmem compile resident on
    v5e; the streamed path runs it)."""
    import timetuning_tpu.ops.flash_attention as fa

    called = {}

    def fake_streamed(q, k, v, **kw):
        called["yes"] = True
        return q

    monkeypatch.setattr(fa, "flash_attention_fwd_pallas_streamed",
                        fake_streamed)
    q, k, v = _qkv(S=4, seed=7)
    big_k = jnp.zeros((1, 2, 32768, 32), jnp.float32)
    fa.flash_attention_fwd_pallas(q[:, :, :4], big_k, big_k, interpret=True)
    assert called.get("yes")
