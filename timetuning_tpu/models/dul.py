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


def dul_params_from_torch(sd) -> dict:
    """Map a DUL checkpoint onto :class:`DulBackbone` variables.

    Reference loading (models.py:885-894): ``torch.load(path)["model"]``,
    ``module.`` prefixes stripped, loaded into ``Framework`` with
    strict=False; the zoo consumes only ``fast_net.backbone`` features
    (models.py:1063-1068) — exactly the torchvision-layout ResNet18 subtree
    this maps through ``resnet_params_from_torch``."""
    from timetuning_tpu.models.resnet import resnet_params_from_torch

    flat = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in dict(sd).items()
    }
    prefix = "fast_net.backbone."
    bb = {k[len(prefix):]: v for k, v in flat.items() if k.startswith(prefix)}
    if not bb:
        raise ValueError(
            "no fast_net.backbone.* keys found — not a DUL Framework "
            "checkpoint (expected torch.load(path)['model'] layout)"
        )
    v = resnet_params_from_torch(bb)
    return {"params": {"net": v["params"]},
            "batch_stats": {"net": v["batch_stats"]}}


def _sample_grid_indices(rng, B: int, h: int, w: int, n: int) -> jax.Array:
    """Reference ``_sample_index`` (dul_model.py:276-304): an n×n uniform
    grid of pixel indices with one random (x, y) offset per batch element.
    Returns [B, n, n] flat hw indices."""
    xs, ys = w // n, h // n
    if xs < 1 or ys < 1:
        raise ValueError(
            f"sampling grid {n}x{n} larger than the {h}x{w} feature grid — "
            "lower grid_size/grid_size_ref (jax.random.randint would fail "
            "with maxval=0 deep in the loss otherwise)"
        )
    kx, ky = jax.random.split(rng)
    x_off = jax.random.randint(kx, (B, 1, 1), 0, xs)
    y_off = jax.random.randint(ky, (B, 1, 1), 0, ys)
    x_s = jnp.arange(0, w, xs)[: n][None, None, :] + x_off      # [B, 1, n]
    y_s = jnp.arange(0, h, ys)[: n][None, :, None] + y_off      # [B, n, 1]
    return x_s + y_s * w                                        # [B, n, n]


def _sample_from_frame0(x, index):
    """Reference ``_sample_from`` (dul_model.py:306-330): gather anchors by
    flat hw index — indices < H·W always land in frame 0 of each clip.
    x: [B, T, K, h, w]; index: [B, n, n] → [B·n², K]."""
    B, T, K, h, w = x.shape
    f0 = jnp.transpose(x[:, 0].reshape(B, K, h * w), (0, 2, 1))  # [B, hw, K]
    idx = index.reshape(B, -1)
    anchors = jnp.take_along_axis(f0, idx[:, :, None], axis=1)   # [B, n², K]
    return anchors.reshape(-1, K)


def dul_framework_loss(
    key1: jax.Array,            # [B, T+1, K, h, w] — view-1 embeddings
    key2: jax.Array,            # [B, T-1, K, h, w] — view-2 embeddings
    rng: jax.Array,
    grid_size: int = 4,         # cfg.MODEL.GRID_SIZE
    grid_size_ref: int = 4,     # cfg.MODEL.GRID_SIZE_REF
    temperature: float = 0.07,  # cfg.TEST.TEMP
    ce_ref: float = 1.0,        # cfg.MODEL.CE_REF
    sample_idx: jax.Array | None = None,       # test hook: fixed anchors
    sample_idx_ref: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """The reference DUL ``Framework`` objective, faithfully
    (dul_model.py:244-574, loss path of ``forward``):

      1. ``fetch_first``: view-1's last frame becomes view-2's first
         (dul_model.py:507-517), giving two aligned [B, T, K, h, w] streams;
      2. ``_cluster_grid``: sample a grid_size² anchor grid with random
         offsets from view-1's first frame; per-pixel logits of every
         feature of both streams against *all* B·n² anchors
         (``_key_val`` = q·anchorsᵀ/temp, dul_model.py:268-274);
      3. ``_pseudo_mask``: softmax over anchors, block-diagonally masked so
         a pixel can only be assigned to anchors of its own clip
         (dul_model.py:447-464); pseudo labels = argmax over view-2 logits;
      4. ``_ce_loss``: pixelwise CE of view-1 logits vs the pseudo labels,
         averaged over frames 1..T-1 (the "temp" loss, dul_model.py:477-484);
      5. ``_ref_loss``: InfoNCE between grid-sampled first-frame anchors of
         the two views (dul_model.py:466-475);
      6. ``main = CE_REF · cross_key + temp`` (dul_model.py:551).

    The reference additionally re-aligns both streams with the
    augmentation's affine grids (``_align``); this functional form takes
    pre-aligned features (affine=None semantics), which is exact for the
    shared-crop pipeline used here.

    Returns {"main", "temp", "cross_key"}.
    """
    import optax

    # fetch_first
    key2 = jnp.concatenate([key1[:, -1:], key2], axis=1)        # [B, T, ...]
    key1 = key1[:, :-1]
    B, T, K, h, w = key1.shape
    n = grid_size
    k_grid, k_ref = jax.random.split(rng)

    if sample_idx is None:
        sample_idx = _sample_grid_indices(k_grid, B, h, w, n)
    anchors = _sample_from_frame0(key1, sample_idx)              # [B·n², K]

    def flat(x):  # [B, T, K, h, w] → [B·T·h·w, K]
        return jnp.transpose(
            x.reshape(B * T, K, h * w), (0, 2, 1)
        ).reshape(-1, K)

    inv_t = 1.0 / temperature
    vals_soft = (flat(key1) @ anchors.T) * inv_t                 # [BThw, Bn²]
    vals_pseudo = (flat(key2) @ anchors.T) * inv_t

    # block-diagonal eye: pixel of clip b ↔ anchors of clip b only
    row_clip = jnp.repeat(jnp.arange(B), T * h * w)              # [BThw]
    col_clip = jnp.repeat(jnp.arange(B), n * n)                  # [Bn²]
    eye = (row_clip[:, None] == col_clip[None, :])

    probs_pseudo = jax.nn.softmax(vals_pseudo, axis=1) * eye
    pseudo = jnp.argmax(probs_pseudo, axis=1)                    # [BThw]

    ce = optax.softmax_cross_entropy_with_integer_labels(vals_soft, pseudo)
    ce = ce.reshape(B, T, h, w)
    loss_temp = ce[:, 1:].mean()

    # _ref_loss on the two first frames
    if sample_idx_ref is None:
        sample_idx_ref = _sample_grid_indices(k_ref, B, h, w, grid_size_ref)
    x1 = _sample_from_frame0(key1[:, :1], sample_idx_ref)        # [B·m², K]
    y1 = _sample_from_frame0(key2[:, :1], sample_idx_ref)
    logits = (x1 @ y1.T) * inv_t
    labels = jnp.arange(logits.shape[1])
    cross_key = optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()

    main = ce_ref * cross_key + loss_temp
    return {"main": main, "temp": loss_temp, "cross_key": cross_key}


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


class DulBackbone(nn.Module):
    """Backbone-zoo adapter (reference models.py:1063-1068): the stride-8
    DUL ResNet18 features bilinearly interpolated to the reference's fixed
    28×28 grid and flattened to tokens."""

    dtype: Any = jnp.float32
    grid: int = 28

    @nn.compact
    def __call__(self, x, want_attention: bool = False):
        del want_attention
        out = DulResNet18(self.dtype, name="net")(x)
        H, W = out["grid"]
        B, _, D = out["tokens"].shape
        h = out["tokens"].reshape(B, H, W, D)
        h = jax.image.resize(h, (B, self.grid, self.grid, D), method="bilinear")
        return {
            "tokens": h.reshape(B, self.grid * self.grid, D),
            "attention": None,
            "grid": (self.grid, self.grid),
        }
