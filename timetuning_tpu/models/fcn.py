"""FCN segmentation decode head (Leopart-style).

Reference: leopart.py:13-147 (``BaseDecodeHead``/``FCNHead`` built on mmcv
ConvModule) — conv-BN-relu stacks over backbone feature maps with an
optional input concat and a 1×1 classifier.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class FCNHead(nn.Module):
    num_classes: int
    channels: int = 256
    num_convs: int = 2
    concat_input: bool = True
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, C] feature map → [B, H, W, num_classes] logits."""
        inp = x
        for i in range(self.num_convs):
            x = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            # momentum 0.9 == torch/mmcv BN momentum 0.1 (flax's default
            # 0.99 would update running stats 10x slower than the reference)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        if self.concat_input:
            x = jnp.concatenate([inp, x], axis=-1)
            x = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name="conv_cat")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name="bn_cat")(x)
            x = nn.relu(x)
        if self.dropout > 0 and train:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="cls")(x)
