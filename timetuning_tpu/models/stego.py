"""STEGO featurizer backbone — DINO ViT-S/8 + the cluster-projection head.

The reference wraps the third-party STEGO release via
``LitUnsupervisedSegmenter.load_from_checkpoint`` (reference
models.py:872-875 — note the import is commented out at models.py:65, so
the reference's stego path is broken without that external repo) and
consumes it as ``features = backbone(input)`` → [B, dim, h, w] → flattened
patch tokens (models.py:1045-1053), spatial resolution 28 @224
(models.py:76, i.e. patch 8).

This module reproduces STEGO's ``DinoFeaturizer`` (Hamilton et al., ICLR
2022, public release layout) natively:

  * frozen DINO ViT-S/8 patch tokens (``feat_type="feat"``),
  * nonlinear projection: ``code = cluster1(f) + cluster2(f)`` where
    cluster1 is a 1×1 conv D→dim and cluster2 is 1×1 conv D→D → ReLU →
    1×1 conv D→dim — 1×1 convs on a patch grid are exactly Dense layers on
    the token axis, which is how they run here (one MXU matmul each).

Checkpoint import: the released ``.ckpt`` is a pytorch-lightning state
dict with keys ``net.model.<timm vit key>`` (backbone), ``net.cluster1.*``
and ``net.cluster2.{0,2}.*`` (projection); the cluster/linear probes are
evaluation artifacts and are ignored.
"""

from __future__ import annotations

from typing import Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from timetuning_tpu.models.vit import VisionTransformer


class StegoFeaturizer(nn.Module):
    """Returns {"tokens": [B, N, dim]} — projected per-patch codes (no CLS,
    matching the reference's ``features.flatten(2).permute(0,2,1)``
    consumption at models.py:1045-1049)."""

    backbone: VisionTransformer
    dim: int = 70

    @nn.compact
    def __call__(self, x, want_attention: bool = False):
        out = self.backbone(x, want_attention=want_attention)
        feats = out["tokens"][:, 1:]                    # [B, N, D]
        c1 = nn.Dense(self.dim, name="cluster1")(feats)
        h = nn.Dense(feats.shape[-1], name="cluster2_fc1")(feats)
        h = nn.relu(h)
        c2 = nn.Dense(self.dim, name="cluster2_fc2")(h)
        return {
            "tokens": c1 + c2,
            "attention": out.get("attention"),
            "grid": out.get("grid"),
        }


def _conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    """torch Conv2d 1×1 weight [O, I, 1, 1] → Dense kernel [I, O]."""
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def stego_params_from_torch(sd: Mapping[str, np.ndarray]) -> dict:
    """Map a STEGO ``.ckpt`` state dict onto the StegoFeaturizer pytree."""
    from timetuning_tpu.models.import_torch import vit_params_from_torch

    backbone_sd = {
        k[len("net.model."):]: v
        for k, v in sd.items()
        if k.startswith("net.model.")
    }
    if not backbone_sd:  # tolerate already-stripped dicts
        backbone_sd = {
            k[len("model."):]: v for k, v in sd.items()
            if k.startswith("model.")
        }
    params: dict = {"backbone": vit_params_from_torch(backbone_sd)}

    def pick(*names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n])
        raise KeyError(f"none of {names} in the checkpoint")

    params["cluster1"] = {
        "kernel": jnp.asarray(_conv1x1_to_dense(pick("net.cluster1.weight", "cluster1.weight"))),
        "bias": jnp.asarray(pick("net.cluster1.bias", "cluster1.bias")),
    }
    params["cluster2_fc1"] = {
        "kernel": jnp.asarray(_conv1x1_to_dense(pick("net.cluster2.0.weight", "cluster2.0.weight"))),
        "bias": jnp.asarray(pick("net.cluster2.0.bias", "cluster2.0.bias")),
    }
    params["cluster2_fc2"] = {
        "kernel": jnp.asarray(_conv1x1_to_dense(pick("net.cluster2.2.weight", "cluster2.2.weight"))),
        "bias": jnp.asarray(pick("net.cluster2.2.bias", "cluster2.2.bias")),
    }
    return params
