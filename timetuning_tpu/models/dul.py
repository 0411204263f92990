"""DUL / videowalk baseline: stride-1 ResNet18 + space-time clustering loss.

Reference: dul_model.py — a torchvision ResNet18 with layer3/layer4 strides
set to 1 (output stride 8) returning (x4, x3) feature maps (:14-66), wrapped
in lr/bn-freeze machinery (:75-196) and a ``Framework`` implementing a
space-time clustering objective: sample key/value grids, cluster keys,
propagate cluster assignments through affinities, cross-entropy on pseudo
masks (:244-574). Consumed by the zoo only as ``get_backbone("dul")`` →
``fast_net.backbone`` features interpolated to 28² (models.py:1063-1068).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from timetuning_tpu.models.resnet import BasicBlock, _BN
from timetuning_tpu.ops.kmeans import kmeans


class DulResNet18(nn.Module):
    """ResNet18 with stride-1 layer3/4 (output stride 8). Returns the
    backbone-zoo dict; ``tokens`` = final layer4 activations."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, want_attention: bool = False):
        del want_attention
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_BN(self.dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        plan = [(64, 1), (128, 2), (256, 1), (512, 1)]  # stride-1 layer3/4
        x3 = None
        for li, (p, stride) in enumerate(plan):
            for bi in range(2):
                s = stride if bi == 0 else 1
                needs_ds = bi == 0 and li > 0
                x, _ = BasicBlock(p, s, needs_ds, self.dtype,
                                  name=f"layer{li + 1}_{bi}")(x)
            if li == 2:
                x3 = x
        B, H, W, D = x.shape
        return {
            "tokens": x.reshape(B, H * W, D),
            "attention": None,
            "intermediates": [x3.reshape(B, -1, x3.shape[-1])],
            "grid": (H, W),
        }


def space_time_cluster_loss(
    features: jax.Array,        # [B, T, N, D] dense features of a clip
    key_frame: int = 0,
    n_clusters: int = 8,
    temperature: float = 0.07,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Compact functional form of the DUL ``Framework`` objective
    (dul_model.py:244-574): cluster the key frame's features into pseudo
    labels, propagate them to the other frames through feature affinity, and
    supervise each frame's affinity-softmax with the propagated labels."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    B, T, N, D = features.shape
    f = features / (jnp.linalg.norm(features, axis=-1, keepdims=True) + 1e-12)

    def per_clip(fc, key):
        labels = kmeans(fc[key_frame], n_clusters, key, n_iter=10, n_redo=1).assignments
        centroids = jax.ops.segment_sum(
            fc[key_frame], labels, num_segments=n_clusters
        )
        centroids = centroids / (
            jnp.linalg.norm(centroids, axis=-1, keepdims=True) + 1e-12
        )
        logits = jnp.einsum("tnd,kd->tnk", fc, centroids) / temperature
        import optax

        lab = jnp.broadcast_to(labels[None], (T, N))
        return optax.softmax_cross_entropy_with_integer_labels(logits, lab).mean()

    keys = jax.random.split(rng, B)
    losses = jax.vmap(per_clip)(f, keys)
    return losses.mean()
