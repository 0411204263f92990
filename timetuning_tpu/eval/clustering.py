"""Feature clustering for unsupervised segmentation.

Reference: clustering.py:20-117 — PCA-50 + faiss k-means over bilinearly
upsampled per-patch features (three granularities), or prototype-argmax maps.
Here the full pipeline (standardize → PCA → upsample → k-means → assign) runs
on device (ops/kmeans.py); only the protocol control flow is host-side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from timetuning_tpu.ops.kmeans import kmeans, normalize_and_reduce
from timetuning_tpu.ops.resize import patch_grid_to_image

_EPS = 1e-12


def _num_classes_from_annotations(annotations) -> int:
    return int(len(np.unique(np.asarray(annotations))))


def cluster_features(
    features: jax.Array,          # [B, F, N, D]
    k: int,
    eval_resolution: int,
    protocol: str = "dataset-wise",
    key: jax.Array | None = None,
    annotations=None,
    pca_dim: int = 50,
    n_iter: int = 50,
    n_redo: int = 5,
) -> jax.Array:
    """→ [B, F, eval_res, eval_res] int32 cluster maps.

    Matches reference ``cluster_features`` (clustering.py:20-80): PCA to
    ``pca_dim``, bilinear upsample of the reduced feature grid to
    ``eval_resolution``, then k-means fit+assign per frame / per clip /
    globally. If ``annotations`` are given, k = #unique labels
    (clustering.py:31-32).
    """
    if key is None:
        key = jax.random.PRNGKey(1)  # reference pins seed=1 (clustering.py:38)
    if annotations is not None:
        k = _num_classes_from_annotations(annotations)

    B, F, N, D = features.shape
    res = int(round(N ** 0.5))
    pca_dim = min(pca_dim, D)
    flat = features.reshape(B * F * N, D)
    reduced = normalize_and_reduce(flat, pca_dim)                  # [BFN, pca]
    maps = patch_grid_to_image(
        reduced.reshape(B * F, N, pca_dim), (res, res),
        (eval_resolution, eval_resolution),
    )                                                              # [BF, r, r, pca]
    r = eval_resolution
    pts_per_frame = r * r

    def fit_assign(x, key):
        return kmeans(x, k, key, n_iter=n_iter, n_redo=n_redo).assignments

    if protocol == "frame-wise":
        keys = jax.random.split(key, B * F)
        out = jnp.stack(
            [fit_assign(maps[i].reshape(pts_per_frame, -1), keys[i]) for i in range(B * F)]
        )
    elif protocol == "sample-wise":
        keys = jax.random.split(key, B)
        maps_c = maps.reshape(B, F * pts_per_frame, -1)
        out = jnp.stack([fit_assign(maps_c[i], keys[i]) for i in range(B)])
    elif protocol == "dataset-wise":
        out = fit_assign(maps.reshape(B * F * pts_per_frame, -1), key)
    else:
        raise ValueError(f"unknown protocol {protocol}")
    return out.reshape(B, F, r, r)


def proto_clustering(
    features: jax.Array,          # [B, F, N, D] (projection-head space)
    prototypes: jax.Array,        # [K, D]
    eval_resolution: int,
    num_classes: int | None = None,
    key: jax.Array | None = None,
) -> jax.Array:
    """Prototype-argmax cluster maps (reference clustering.py:85-117):
    cosine scores vs prototypes, bilinear upsample of score maps, argmax.
    If ``num_classes`` < K, the prototypes themselves are k-means-merged
    into ``num_classes`` groups first (clustering.py:106-116)."""
    B, F, N, D = features.shape
    res = int(round(N ** 0.5))
    fn = features / (jnp.linalg.norm(features, axis=-1, keepdims=True) + _EPS)
    pn = prototypes / (jnp.linalg.norm(prototypes, axis=-1, keepdims=True) + _EPS)
    scores = jnp.einsum("bfnd,kd->bfnk", fn, pn, preferred_element_type=jnp.float32)
    maps = patch_grid_to_image(
        scores.reshape(B * F, N, -1), (res, res),
        (eval_resolution, eval_resolution),
    )                                                              # [BF, r, r, K]
    assign = jnp.argmax(maps, axis=-1)                             # [BF, r, r]
    if num_classes is not None and num_classes < prototypes.shape[0]:
        if key is None:
            key = jax.random.PRNGKey(1)
        merge = kmeans(pn, num_classes, key, n_iter=50, n_redo=5).assignments
        assign = merge[assign]
    return assign.reshape(B, F, eval_resolution, eval_resolution).astype(jnp.int32)
