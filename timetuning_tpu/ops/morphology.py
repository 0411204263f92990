"""On-device image morphology: Gaussian blur, connected components, dilation.

The reference leaned on scikit-image/torchvision for these (Gaussian blur +
``skimage.measure.label`` in ``process_attentions``, models.py:93-131; disk
dilation for boundary metrics, mask_propagation.py:547-549). On TPU they are
expressed as convolutions and iterative max-pooling label floods — all static
shapes, all fused by XLA, vmappable over the batch.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """Matches torchvision GaussianBlur's kernel construction."""
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float = 0.6) -> jax.Array:
    """Separable Gaussian blur with reflect padding on [..., H, W].

    torchvision's GaussianBlur (used at models.py:114) reflect-pads; we do the
    same so the attention-mask numerics line up at the borders.
    """
    k = jnp.asarray(gaussian_kernel1d(ksize, sigma))
    pad = ksize // 2
    lead = img.shape[:-2]
    H, W = img.shape[-2:]
    x = img.reshape((-1, 1, H, W))
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    kh = k.reshape(1, 1, ksize, 1)
    kw = k.reshape(1, 1, 1, ksize)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn)
    return x.reshape(lead + (H, W))


def _maxpool3x3(x: jax.Array) -> jax.Array:
    """3x3 max-pool, stride 1, same padding — the 8-connected neighborhood
    flood step (skimage's default label connectivity for 2D is 8-connected,
    matching the reference's component removal at models.py:126)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )


def connected_components(mask: jax.Array, n_iters: int | None = None) -> jax.Array:
    """Label 8-connected components of a binary [H, W] mask on device.

    Iterative label flood: seed every foreground pixel with its linear index,
    then repeatedly take the neighborhood max restricted to the mask. After
    enough iterations every component carries its max seed as the label.
    Background is labeled -1. Returns int32 [H, W].
    """
    H, W = mask.shape
    if n_iters is None:
        n_iters = H * W  # true worst case: a serpentine component's graph
        # diameter can approach H·W, far beyond H+W
    # labels are discrete — sever the grad path so the convergence
    # while_loop (not reverse-differentiable) never sits under autodiff;
    # the reference detaches attentions before masking too (models.py:987)
    m = jax.lax.stop_gradient(mask).astype(bool)
    seeds = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    labels = jnp.where(m, seeds, -jnp.inf)

    def cond(carry):
        i, lab, changed = carry
        return changed & (i < n_iters)

    def body(carry):
        i, lab, _ = carry
        flooded = jnp.where(m, jnp.maximum(lab, _maxpool3x3(lab)), -jnp.inf)
        return i + 1, flooded, jnp.any(flooded != lab)

    # while_loop: exits at convergence (≈ the true diameter, typically ≪ H·W)
    # with the worst-case bound only as a backstop
    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels, jnp.array(True))
    )
    return jnp.where(m, labels, -1.0).astype(jnp.int32)


def remove_small_components(mask: jax.Array, min_size: int = 3) -> jax.Array:
    """Zero out connected components smaller than ``min_size`` pixels.

    Matches the ≤2-pixel removal in reference ``process_attentions``
    (models.py:126-130). [H, W] binary in/out.
    """
    H, W = mask.shape
    labels = connected_components(mask)
    # Component sizes via one scatter-add bincount over the label ids —
    # O(N), vs the previous dense [N, N] same-label comparison whose
    # footprint blew up 16x on the s8@448 geometry (N = 3136)
    flat = labels.reshape(-1)
    fg = flat >= 0
    idx = jnp.where(fg, flat, 0)
    counts = jnp.zeros(flat.shape[0], jnp.int32).at[idx].add(
        fg.astype(jnp.int32)
    )
    keep = fg & (counts[idx] >= min_size)
    return keep.reshape(H, W).astype(mask.dtype)


def dilate(mask: jax.Array, radius: int) -> jax.Array:
    """Binary dilation with a disk structuring element (boundary metrics;
    reference used skimage ``binary_dilation(disk(r))``, mask_propagation.py:547-549)."""
    if radius <= 0:
        return mask
    yy, xx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    disk = ((yy ** 2 + xx ** 2) <= radius ** 2).astype(np.float32)
    x = mask.astype(jnp.float32)[None, None]  # NCHW
    k = jnp.asarray(disk)[None, None]         # OIHW
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(radius, radius), (radius, radius)], dimension_numbers=dn
    )[0, 0]
    return (out > 0).astype(mask.dtype)
