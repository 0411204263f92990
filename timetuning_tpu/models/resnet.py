"""ResNet-18/50 dense-feature backbones (torchvision-compatible layout).

Reference: models.py:146-408 (vendored torchvision ResNet) used through
forward hooks on ``layer4[-1].conv2`` (resnet18) / ``layer4[-1].conv3``
(resnet50/swav) that capture the *pre-BN* activation of the last block's
last conv (models.py:939-957). Here that tap is part of the functional
forward — no hooks — and BN runs with imported running statistics
(inference semantics; these backbones are frozen feature extractors in every
reference code path).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32):
    pad = kernel // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], use_bias=False, dtype=dtype, name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, tap: bool = False):
        identity = x
        out = _conv(self.planes, 3, self.stride, "conv1", self.dtype)(x)
        out = _BN(self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, "conv2", self.dtype)(out)
        pre_bn = out                      # the reference's hook point
        out = _BN(self.dtype, name="bn2")(out)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, "ds_conv", self.dtype)(x)
            identity = _BN(self.dtype, name="ds_bn")(identity)
        out = nn.relu(out + identity)
        return (out, pre_bn) if tap else (out, None)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, tap: bool = False):
        identity = x
        out = _conv(self.planes, 1, 1, "conv1", self.dtype)(x)
        out = nn.relu(_BN(self.dtype, name="bn1")(out))
        out = _conv(self.planes, 3, self.stride, "conv2", self.dtype)(out)
        out = nn.relu(_BN(self.dtype, name="bn2")(out))
        out = _conv(self.planes * self.expansion, 1, 1, "conv3", self.dtype)(out)
        pre_bn = out
        out = _BN(self.dtype, name="bn3")(out)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride, "ds_conv", self.dtype)(x)
            identity = _BN(self.dtype, name="ds_bn")(identity)
        out = nn.relu(out + identity)
        return (out, pre_bn) if tap else (out, None)


class ResNet(nn.Module):
    """Returns the VisionTransformer-style dict: ``tokens`` are the flattened
    pre-BN activations of the final block's last conv (the reference's hooked
    features), ``attention`` is None."""

    block: type
    layers: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, want_attention: bool = False):
        del want_attention
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_BN(self.dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        planes = [64, 128, 256, 512]
        tap_feat = None
        for li, (p, n) in enumerate(zip(planes, self.layers)):
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                needs_ds = bi == 0 and (
                    stride != 1 or li > 0 or self.block is Bottleneck
                )
                is_tap = li == 3 and bi == n - 1
                x, pre = self.block(
                    p, stride, needs_ds, self.dtype, name=f"layer{li + 1}_{bi}"
                )(x, tap=is_tap)
                if pre is not None:
                    tap_feat = pre
        B, H, W, D = tap_feat.shape
        tokens = tap_feat.reshape(B, H * W, D)
        return {"tokens": tokens, "attention": None, "intermediates": [tokens],
                "grid": (H, W)}


def resnet18(dtype=jnp.float32) -> ResNet:
    return ResNet(BasicBlock, (2, 2, 2, 2), dtype)


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 6, 3), dtype)


# ---------------------------------------------------------------- #
# torchvision checkpoint import

def resnet_params_from_torch(sd) -> dict:
    """Map a torchvision resnet state_dict onto the Flax tree above."""
    import numpy as np
    from timetuning_tpu.models.import_torch import strip_prefixes

    sd = strip_prefixes(dict(sd))
    out: dict = {}

    def conv(src):
        return {"kernel": np.transpose(sd[src + ".weight"], (2, 3, 1, 0))}

    def bn(dst_parent, src):
        dst_parent["bn"] = {
            "scale": sd[src + ".weight"],
            "bias": sd[src + ".bias"],
        }
        return {
            "bn": {
                "mean": sd[src + ".running_mean"],
                "var": sd[src + ".running_var"],
            }
        }

    batch_stats: dict = {}
    out["conv1"] = conv("conv1")
    out["bn1"] = {}
    batch_stats["bn1"] = bn(out["bn1"], "bn1")
    li = 1
    while f"layer{li}.0.conv1.weight" in sd:
        bi = 0
        while f"layer{li}.{bi}.conv1.weight" in sd:
            name = f"layer{li}_{bi}"
            blk: dict = {}
            bs_blk: dict = {}
            ci = 1
            while f"layer{li}.{bi}.conv{ci}.weight" in sd:
                blk[f"conv{ci}"] = conv(f"layer{li}.{bi}.conv{ci}")
                blk[f"bn{ci}"] = {}
                bs_blk[f"bn{ci}"] = bn(blk[f"bn{ci}"], f"layer{li}.{bi}.bn{ci}")
                ci += 1
            if f"layer{li}.{bi}.downsample.0.weight" in sd:
                blk["ds_conv"] = conv(f"layer{li}.{bi}.downsample.0")
                blk["ds_bn"] = {}
                bs_blk["ds_bn"] = bn(blk["ds_bn"], f"layer{li}.{bi}.downsample.1")
            out[name] = blk
            batch_stats[name] = bs_blk
            bi += 1
        li += 1
    return {"params": out, "batch_stats": batch_stats}
