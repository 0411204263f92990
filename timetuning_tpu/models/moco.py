"""MoCo-v3 components: ConvStem ViT backbone + contrastive trainer.

Reference: models.py:1604-1707 (``VisionTransformerMoCo`` + ``ConvStem``),
models.py:1710-1822 (``concat_all_gather``, ``MoCo``/``MoCo_ViT``).

TPU-native: the NCCL ``concat_all_gather`` becomes ``jax.lax.all_gather``
over the data mesh axis; the contrastive loss is a pure function suitable
for pjit. The released mocov3 ViT-S/B checkpoints use a standard patch-embed
ViT (imported via models/import_torch); ConvStem is provided for the
convstem variants.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from timetuning_tpu.models.vit import ViTConfig, VisionTransformer


class ConvStem(nn.Module):
    """4× (conv-BN-relu) stem producing patch tokens
    (reference ``ConvStem``, models.py:1664-1707)."""

    embed_dim: int = 384
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = [self.embed_dim // 8, self.embed_dim // 4, self.embed_dim // 2,
                self.embed_dim]
        for i, d in enumerate(dims):
            x = nn.Conv(d, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, name=f"conv{i}")(x)
            # train=True: batch-stats BN with mutable batch_stats, like the
            # reference's train mode (torch momentum 0.1 == flax 0.9)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="proj")(x)
        return x


def moco_vit_small(**kw) -> ViTConfig:
    """MoCo-v3 ViT-S/16 (12 heads in the official release, unlike DINO's 6)."""
    return ViTConfig(patch_size=16, embed_dim=384, depth=12, num_heads=12, **kw)


def moco_vit_base(**kw) -> ViTConfig:
    return ViTConfig(patch_size=16, embed_dim=768, depth=12, num_heads=12, **kw)


class MoCoPredictor(nn.Module):
    """2-layer BN-MLP prediction head (reference models.py:1736-1760).

    Mirrors ``_build_mlp(2, in, hidden, out, last_bn=True)``: the final Dense
    is followed by an **affine-free** BatchNorm (SimCLR-style, no gamma/beta),
    so q entering the contrastive loss is per-feature standardized.
    """

    hidden_dim: int = 4096
    out_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # train=True runs batch-statistics BN (mutable batch_stats), like
        # the reference's train-mode predictor; the default is the
        # checkpoint-import inference path (momentum 0.9 == torch 0.1)
        x = nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype, name="fc2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         use_bias=False, use_scale=False,
                         dtype=self.dtype, name="bn2")(x)
        return x


def import_moco_predictor(state_dict: dict, prefix: str = "predictor.") -> dict:
    """Map the official MoCo-v3 predictor ``nn.Sequential`` state dict into
    ``MoCoPredictor`` variables.

    Torch layout (reference models.py:1749-1763): ``0``=Linear(no bias),
    ``1``=BatchNorm1d, ``2``=ReLU, ``3``=Linear(no bias),
    ``4``=BatchNorm1d(affine=False).
    """
    import numpy as np

    def arr(key):
        v = state_dict[prefix + key]
        return jnp.asarray(np.asarray(v, dtype=np.float32))

    params = {
        "fc1": {"kernel": arr("0.weight").T},
        "bn1": {"scale": arr("1.weight"), "bias": arr("1.bias")},
        "fc2": {"kernel": arr("3.weight").T},
    }
    batch_stats = {
        "bn1": {"mean": arr("1.running_mean"), "var": arr("1.running_var")},
        "bn2": {"mean": arr("4.running_mean"), "var": arr("4.running_var")},
    }
    return {"params": params, "batch_stats": batch_stats}


def contrastive_loss(
    q: jax.Array, k: jax.Array, temperature: float = 0.2, axis_name: str | None = None
) -> jax.Array:
    """InfoNCE over globally gathered keys.

    Reference ``MoCo.contrastive_loss`` (models.py:1775-1790): normalize,
    gather keys from all devices (``concat_all_gather`` → lax.all_gather),
    logits = q·kᵀ/T, positives on the (rank-offset) diagonal.
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
    n = q.shape[0]
    if axis_name is not None:
        k_all = jax.lax.all_gather(k, axis_name)          # [W, n, D]
        k_all = k_all.reshape(-1, k.shape[-1])
        rank = jax.lax.axis_index(axis_name)
        offset = rank * n
    else:
        k_all, offset = k, 0
    logits = jnp.einsum("nd,md->nm", q, k_all, preferred_element_type=jnp.float32)
    logits = logits / temperature
    labels = jnp.arange(n) + offset
    import optax

    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean() * (
        2 * temperature
    )
