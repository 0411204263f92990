"""Batched image/feature resizing helpers (XLA ``jax.image.resize``)."""

from __future__ import annotations

import jax



def resize_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Bilinear resize of [..., H, W] to [..., h, w] (align_corners=False
    semantics, matching torch ``interpolate(mode='bilinear')`` defaults used
    throughout the reference eval paths, e.g. clustering.py:40-44)."""
    out_shape = x.shape[:-2] + size
    return jax.image.resize(x, out_shape, method="bilinear")


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize of [..., H, W] (annotation co-transform,
    reference evaluation.py:428-430)."""
    out_shape = x.shape[:-2] + size
    return jax.image.resize(x, out_shape, method="nearest")


def patch_grid_to_image(feats: jax.Array, grid: tuple[int, int], size: tuple[int, int]) -> jax.Array:
    """[..., N, D] patch features → [..., h, w, D] bilinearly upsampled maps."""
    *lead, N, D = feats.shape
    gh, gw = grid
    assert gh * gw == N
    x = feats.reshape(*lead, gh, gw, D)
    out_shape = tuple(lead) + size + (D,)
    return jax.image.resize(x, out_shape, method="bilinear")
