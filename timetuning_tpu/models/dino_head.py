"""DINO projection head + multi-crop wrapper.

Reference: dino_vision_transformer.py:297-370 (``DINOHead`` with
weight-normalized last layer, ``MultiCropWrapper`` grouping crops of equal
resolution into one forward).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class WeightNormDense(nn.Module):
    """Dense layer with weight-normalized kernel (g fixable to 1 like DINO's
    ``norm_last_layer=True``)."""

    features: int
    trainable_g: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        v = self.param("v", nn.initializers.lecun_normal(), (in_dim, self.features))
        g = self.param("g", nn.initializers.ones, (self.features,))
        if not self.trainable_g:
            g = jax.lax.stop_gradient(g)
        kernel = g * v / (jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-12)
        return jnp.dot(x, kernel.astype(self.dtype))


class DINOHead(nn.Module):
    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    n_layers: int = 3
    use_bn: bool = False
    norm_last_layer: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_layers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"mlp{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                                 name=f"bn{i}")(x)
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.bottleneck_dim, dtype=self.dtype,
                     name=f"mlp{self.n_layers - 1}")(x)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        return WeightNormDense(
            self.out_dim, trainable_g=not self.norm_last_layer,
            dtype=self.dtype, name="last_layer",
        )(x)


class MultiCropWrapper(nn.Module):
    """Run a backbone over a list of crops, batching crops that share a
    resolution, then one head pass over the concatenated CLS tokens."""

    backbone: nn.Module
    head: nn.Module

    @nn.compact
    def __call__(self, crops: Sequence[jax.Array]):
        outputs = []
        i = 0
        while i < len(crops):
            j = i
            while j < len(crops) and crops[j].shape[1:] == crops[i].shape[1:]:
                j += 1
            batch = jnp.concatenate(crops[i:j], axis=0)
            out = self.backbone(batch)
            outputs.append(out["tokens"][:, 0])    # CLS
            i = j
        return self.head(jnp.concatenate(outputs, axis=0))
