"""Fused eval-preprocess kernel vs the XLA resize path (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    REFERENCE_STD,
    eval_preprocess_batch,
)
from timetuning_tpu.ops.preprocess_pallas import (
    _resize_weights,
    eval_preprocess_pallas,
)


@pytest.mark.parametrize("n_in,n_out", [(480, 224), (854, 224), (96, 96),
                                        (33, 17), (480, 448)])
def test_resize_weights_match_jax_image(n_in, n_out):
    """The numpy weight construction must equal jax.image.resize's linear
    map exactly (extracted by resizing an identity matrix). Downscale/equal
    only — the kernel's availability gate excludes upscale (jax.image's
    non-antialiased edge handling differs there)."""
    eye = jnp.eye(n_in, dtype=jnp.float32)
    want = np.asarray(jax.image.resize(eye, (n_out, n_in), method="bilinear"))
    got = _resize_weights(n_in, n_out)
    # jax.image computes the triangle kernel in f32, ours in f64 — the
    # largest observed drift (mild downscales, e.g. 480->448) is ~2e-5,
    # 1000x below the bf16 rounding the kernel's contract allows
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("h,w,s,std", [
    (60, 107, 28, REFERENCE_STD),      # DAVIS-like downscale geometry
    (64, 64, 48, IMAGENET_STD),        # square
    (40, 72, 40, REFERENCE_STD),       # one axis at native size
])
def test_kernel_matches_xla_path(h, w, s, std):
    frames = jax.random.randint(
        jax.random.PRNGKey(0), (3, h, w, 3), 0, 256, jnp.uint8)
    want = eval_preprocess_batch(frames, out_size=s, std=std,
                                 compute_dtype=jnp.float32)
    got = eval_preprocess_pallas(frames, s, IMAGENET_MEAN, std,
                                 interpret=True)
    # bf16 operands/f32 accumulation vs the f32 XLA path: bf16 rounding of
    # values in roughly [-2.2, 2.7] after normalization
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.05)


def test_kernel_batch_leading_dims():
    """[B, T, H, W, 3] collapses and restores leading dims."""
    frames = jax.random.randint(
        jax.random.PRNGKey(1), (2, 3, 30, 50, 3), 0, 256, jnp.uint8)
    got = eval_preprocess_pallas(frames, 24, IMAGENET_MEAN, REFERENCE_STD,
                                 interpret=True)
    assert got.shape == (2, 3, 24, 24, 3)
    per = eval_preprocess_pallas(frames[1], 24, IMAGENET_MEAN, REFERENCE_STD,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got[1], np.float32),
                               np.asarray(per, np.float32), atol=1e-3)


def test_xor_bitcast_is_v_minus_128():
    """The kernel's int8 view of the raw bytes — bitcast(v XOR 0x80) —
    must equal v−128 for every byte value (how uint8 pixels reach the
    int8 MXU without a conversion pass)."""
    v = jnp.arange(256, dtype=jnp.uint8).reshape(16, 16)
    got = jax.lax.bitcast_convert_type(v ^ jnp.uint8(0x80), jnp.int8)
    want = np.arange(256, dtype=np.int32).reshape(16, 16) - 128
    np.testing.assert_array_equal(np.asarray(got, np.int32), want)


def test_flat_entry_matches_batch_on_cpu():
    """On CPU the gate must route eval_preprocess_flat to the XLA path and
    match eval_preprocess_batch bit-for-bit."""
    from timetuning_tpu.data.transforms import eval_preprocess_flat
    from timetuning_tpu.ops.preprocess_pallas import preprocess_pallas_available
    assert not preprocess_pallas_available(32, 32, 16, jnp.uint8,
                                           jnp.bfloat16)
    frames = jax.random.randint(
        jax.random.PRNGKey(3), (2, 4, 32, 48, 3), 0, 256, jnp.uint8)
    flat = frames.reshape(2, 4, 32, 48 * 3)
    for dt in (None, jnp.bfloat16):
        want = eval_preprocess_batch(frames, out_size=16, compute_dtype=dt)
        got = eval_preprocess_flat(flat, (32, 48), out_size=16,
                                   compute_dtype=dt)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
