"""Batched image/feature resizing helpers (XLA ``jax.image.resize``)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(n_in: int, n_out: int):
    """[n_out, n_in] interpolation weights identical to jax.image.resize's
    bilinear kernel for upsampling (half-pixel centers, edge rows
    renormalized). Verified against resize to float32 rounding in tests."""
    i = np.arange(n_out)
    src = (i + 0.5) * n_in / n_out - 0.5
    lo = np.floor(src).astype(int)
    w_hi = (src - lo).astype(np.float32)
    W = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        lo_c = min(max(lo[o], 0), n_in - 1)
        hi_c = min(max(lo[o] + 1, 0), n_in - 1)
        W[o, lo_c] += 1.0 - w_hi[o]
        W[o, hi_c] += w_hi[o]
    return W


@functools.lru_cache(maxsize=64)
def _cubic_matrix(n_in: int, n_out: int, inv_scale: float | None = None):
    """[n_out, n_in] interpolation weights reproducing torch's
    ``F.interpolate(mode='bicubic', align_corners=False)`` EXACTLY: cubic
    convolution with A=-0.75 (torch/PIL), half-pixel centers, out-of-range
    taps clamped to the border. NOTE ``jax.image.resize(method='cubic')``
    uses the Keys kernel with A=-0.5 — a different kernel; positional
    embeddings resampled with it drift from a PyTorch-imported checkpoint
    at every non-native resolution.

    ``inv_scale`` overrides the source-coordinate step (default
    n_in/n_out): torch maps ``src = (i + 0.5) * inv_scale - 0.5`` using the
    CALLER'S scale factor when one is passed (recompute_scale_factor=None),
    which DINO exploits with its ``(n_out + 0.1) / n_in`` fudge
    (dino_vision_transformer.py:226-231) — matching that path requires the
    fudged step, not the size-derived one."""
    A = -0.75

    def k(s):
        s = abs(s)
        if s <= 1.0:
            return (A + 2.0) * s**3 - (A + 3.0) * s**2 + 1.0
        if s < 2.0:
            return A * (s**3 - 5.0 * s**2 + 8.0 * s - 4.0)
        return 0.0

    W = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out if inv_scale is None else inv_scale
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        b = int(np.floor(src))
        t = src - b
        for tap, w in zip(
            (b - 1, b, b + 1, b + 2),
            (k(1.0 + t), k(t), k(1.0 - t), k(2.0 - t)),
        ):
            W[i, min(max(tap, 0), n_in - 1)] += w
    return W.astype(np.float32)


def resize_bicubic_torch(
    x: jax.Array,
    size: tuple[int, int],
    scales: tuple[float, float] | None = None,
) -> jax.Array:
    """[..., H, W, C] → [..., h, w, C], bit-matching torch bicubic
    (align_corners=False, no antialias) to f32 rounding. ``scales`` are
    explicit forward scale factors for the coordinate mapping (the
    ``F.interpolate(scale_factor=...)`` form — see ``_cubic_matrix``)."""
    *lead, H, W, C = x.shape
    oh, ow = size
    inv_h = None if scales is None else 1.0 / scales[0]
    inv_w = None if scales is None else 1.0 / scales[1]
    Wh = jnp.asarray(_cubic_matrix(H, oh, inv_h))
    Ww = jnp.asarray(_cubic_matrix(W, ow, inv_w))
    out = jnp.einsum(
        "...hwc,Hh,Ww->...HWc", x, Wh, Ww,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(x.dtype)


def resize_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Bilinear resize of [..., H, W] to [..., h, w] (align_corners=False
    semantics, matching torch ``interpolate(mode='bilinear')`` defaults used
    throughout the reference eval paths, e.g. clustering.py:40-44).

    Upscaling routes through two interpolation matmuls (same 2-tap weights
    as ``jax.image.resize`` — `_bilinear_matrix`, values equal to f32
    rounding): resize's gather lowering is the slowest stage of the
    propagation-eval postprocess at [B·T, K, 28, 28] → [.., 224, 224],
    while the matmul form rides the MXU. Downscaling keeps resize (its
    antialias kernel is not a 2-tap matrix)."""
    H, W = x.shape[-2:]
    oh, ow = size
    if oh >= H and ow >= W and (oh, ow) != (H, W):
        Wh = jnp.asarray(_bilinear_matrix(H, oh))
        Ww = jnp.asarray(_bilinear_matrix(W, ow))
        out = jnp.einsum(
            "...hw,Hh,Ww->...HW", x.astype(jnp.float32), Wh, Ww,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.astype(x.dtype)
    out_shape = x.shape[:-2] + size
    return jax.image.resize(x, out_shape, method="bilinear")


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize of [..., H, W] (annotation co-transform,
    reference evaluation.py:428-430)."""
    out_shape = x.shape[:-2] + size
    return jax.image.resize(x, out_shape, method="nearest")


def patch_grid_to_image(feats: jax.Array, grid: tuple[int, int], size: tuple[int, int]) -> jax.Array:
    """[..., N, D] patch features → [..., h, w, D] bilinearly upsampled maps.

    Upsampling runs as two small HIGHEST-precision interpolation matmuls
    instead of ``jax.image.resize`` — same values (the weight matrices
    reproduce resize's kernel exactly), ~8× faster on TPU for the
    feature-map shapes of the eval pipeline (resize's gather lowering is
    slow at [BF, 14, 14, 50] → [BF, 112, 112, 50]). Downscaling falls back
    to resize (its antialias kernel is not a 2-tap matrix)."""
    *lead, N, D = feats.shape
    gh, gw = grid
    assert gh * gw == N
    x = feats.reshape(*lead, gh, gw, D)
    oh, ow = size
    if oh < gh or ow < gw:
        out_shape = tuple(lead) + size + (D,)
        return jax.image.resize(x, out_shape, method="bilinear")
    Wh = jnp.asarray(_bilinear_matrix(gh, oh))
    Ww = jnp.asarray(_bilinear_matrix(gw, ow))
    out = jnp.einsum(
        "...hwc,Hh,Ww->...HWc", x, Wh, Ww,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(feats.dtype)
