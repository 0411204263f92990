"""FeatureExtractor: backbone → dense patch features (+ optional head, + last
self-attention), and the attention-derived foreground masking.

TPU-native re-design of reference models.py:903-1078 (FeatureExtractor) and
models.py:93-144 (process_attentions / apply_attention_mask):

  * no forward hooks — backbones return dicts functionally;
  * "freezing" is not a module property: parameter trainability is an
    optimizer mask built from the same ``unfreeze_layers`` name patterns
    (see core/optimizer.py), since jax grads are computed for the whole tree;
  * the attention mask's Gaussian blur / mass-threshold / component removal
    run on device (ops/morphology.py) instead of skimage round-trips.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from timetuning_tpu.models.heads import ProjectionHead
from timetuning_tpu.ops.morphology import gaussian_blur, remove_small_components


class FeatureExtractor(nn.Module):
    """Wraps a backbone module; returns (patch_features [B, N, D], attention).

    ``backbone`` must return a dict with ``tokens`` [B, 1+N, D] (CLS first)
    and optionally ``attention`` [B, heads, 1+N, 1+N] — the VisionTransformer
    contract. ``head_dims`` adds the SwAV-style projection MLP.
    """

    backbone: nn.Module
    head_dims: Sequence[int] = ()
    drop_cls: bool = True

    @nn.compact
    def __call__(self, x, use_head: bool = True, want_attention: bool = False):
        out = self.backbone(x, want_attention=want_attention)
        feats = out["tokens"]
        if self.drop_cls:
            feats = feats[:, 1:]
        if self.head_dims and use_head:
            feats = ProjectionHead(tuple(self.head_dims), name="head")(feats)
        return feats, out.get("attention")


class FeatureExtractorV2(nn.Module):
    """Dual-head extractor: separate projection MLPs for the segmentation
    (Sinkhorn/prototype) space and the propagation (affinity) space.

    Reference: models.py:1083-1216 — same backbone, ``segmentation_head``
    and ``propagation_head`` Sequential MLPs selected per forward. Returns
    ((seg_features, prop_features), attention); either head may be disabled
    (empty dims → raw backbone features pass through).
    """

    backbone: nn.Module
    segmentation_head_dims: Sequence[int] = ()
    propagation_head_dims: Sequence[int] = ()
    drop_cls: bool = True

    @nn.compact
    def __call__(
        self,
        x,
        use_segmentation_head: bool = True,
        use_propagation_head: bool = True,
        want_attention: bool = False,
    ):
        out = self.backbone(x, want_attention=want_attention)
        feats = out["tokens"]
        if self.drop_cls:
            feats = feats[:, 1:]
        seg = feats
        prop = feats
        if self.segmentation_head_dims and use_segmentation_head:
            seg = ProjectionHead(
                tuple(self.segmentation_head_dims), name="segmentation_head"
            )(feats)
        if self.propagation_head_dims and use_propagation_head:
            prop = ProjectionHead(
                tuple(self.propagation_head_dims), name="propagation_head"
            )(feats)
        return (seg, prop), out.get("attention")


def process_attentions(
    attentions: jax.Array,
    spatial_res: int,
    threshold: float = 0.65,
    blur_sigma: float = 0.6,
) -> jax.Array:
    """CLS-attention → binary foreground mask, fully on device.

    Pipeline (semantics of reference models.py:93-131): take CLS→patch
    attention, average heads, Gaussian-blur (7×7, σ=0.6), keep the top
    ``threshold`` fraction of attention mass, drop 8-connected components of
    ≤2 pixels. Input [B, H, 1+N, 1+N]; output [B, 1, res, res] float.
    """
    att = attentions[:, :, 0, 1:]                       # [B, heads, N]
    B, nh, N = att.shape
    att = att.reshape(B, nh, spatial_res, spatial_res).mean(axis=1)
    att = gaussian_blur(att, ksize=7, sigma=blur_sigma)  # [B, res, res]
    flat = att.reshape(B, -1)

    # Keep top `threshold` of mass: sort ascending, mark entries past the
    # (1-threshold) cumulative point, un-sort.
    order = jnp.argsort(flat, axis=-1)
    val = jnp.take_along_axis(flat, order, axis=-1)
    val = val / jnp.sum(val, axis=-1, keepdims=True)
    cum = jnp.cumsum(val, axis=-1)
    keep_sorted = cum > (1 - threshold)
    inv = jnp.argsort(order, axis=-1)
    keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    mask = keep.reshape(B, spatial_res, spatial_res).astype(jnp.float32)

    mask = jax.vmap(lambda m: remove_small_components(m, min_size=3))(mask)
    return mask[:, None]                                 # [B, 1, res, res]


def apply_attention_mask(
    features: jax.Array,     # [B, F, N, D]
    attentions: jax.Array,   # [B*F, heads, 1+N, 1+N]
    spatial_res: int,
) -> tuple[jax.Array, jax.Array]:
    """Zero out background patch features using the FG mask
    (reference models.py:133-144). Returns (masked features, masks [B, F, N])."""
    B, F, N, D = features.shape
    masks = process_attentions(attentions, spatial_res)   # [B*F, 1, r, r]
    masks = masks.reshape(B, F, N, 1)
    return features * masks, masks[..., 0]
