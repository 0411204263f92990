"""Projection / probe heads."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ProjectionHead(nn.Module):
    """MLP projection head: Dense→GELU between layers, linear last layer.

    Matches the reference FeatureExtractor head (models.py:914-926) with the
    default layer list [1024, 1024, 512, 256] (time_tuning.py:575).
    """

    layer_dims: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = len(self.layer_dims)
        for i, d in enumerate(self.layer_dims):
            x = nn.Dense(d, dtype=self.dtype, name=f"lin{i}")(x)
            if i != n - 1:
                x = nn.gelu(x, approximate=False)
        return x


class LinearProbeHead(nn.Module):
    """1×1 conv over the patch grid → class logits (reference
    linear_finetune.py:21-31: Conv2d(feature_dim, num_classes, 1))."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, D] patch-feature grid (NHWC)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="conv")(x)
