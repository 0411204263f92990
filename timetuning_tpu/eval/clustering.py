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

from timetuning_tpu.ops.kmeans import kmeans, kmeans_assign, normalize_and_reduce
from timetuning_tpu.ops.resize import patch_grid_to_image

_EPS = 1e-12

# Above this many upsampled pixels the dataset-wise path stops materializing
# the full [B·F·r·r, pca] tensor (Pascal val at eval_res 112 is 18.2M pixels
# → ~3.6 GB, and the padded copies inside a single monolithic kmeans push
# the compiled program past a v5e's 16 GB HBM) and switches to the bounded
# two-pass variant below. 4M pixels ≈ 800 MB materialized — comfortably
# compilable — so smaller sets keep the single-program path.
_DATASET_WISE_PIXEL_LIMIT = 4_000_000
_CHUNK_PIXELS = 2_000_000


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
    grids = reduced.reshape(B * F, N, pca_dim)
    r = eval_resolution
    pts_per_frame = r * r
    n_total = B * F * pts_per_frame
    cap = 256 * k  # faiss max_points_per_centroid fit-set size (ops/kmeans)

    def fit_assign(x, key):
        return kmeans(x, k, key, n_iter=n_iter, n_redo=n_redo).assignments

    if (
        protocol == "dataset-wise"
        and n_total > _DATASET_WISE_PIXEL_LIMIT
        and n_total > cap
    ):
        out = _dataset_wise_bounded(
            grids, key, k, (res, res), r, n_iter, n_redo, pca_dim
        )
        return out.reshape(B, F, r, r)

    maps = patch_grid_to_image(
        grids, (res, res), (eval_resolution, eval_resolution)
    )                                                              # [BF, r, r, pca]
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


def _dataset_wise_bounded(grids, key, k, grid_hw, r, n_iter, n_redo, pca_dim):
    """Dataset-wise k-means without materializing the full pixel set.

    Bit-identical to the single-program path: the fit subset is the same
    ``randint`` draw over the same virtual [B·F·r·r] pixel array that
    ``kmeans``'s faiss-style subsampling would take (the key splits mirror
    ops/kmeans.py exactly), gathered from chunk-upsampled frames; the
    restart scan then runs on those very values, and assignment reuses the
    same chunked distance kernel per frame chunk. Peak device memory is one
    ~2M-pixel chunk (~400 MB) instead of the whole set (Pascal val:
    18.2M pixels ≈ 3.6 GB + padded copies → OOM on a 16 GB v5e).
    """
    BF = grids.shape[0]
    n_total = BF * r * r
    cap = 256 * k
    # mirror kmeans' internal subsample stream (ops/kmeans.py): one split,
    # then randint over the full pixel range
    key2, k_sub = jax.random.split(key)
    idx = jax.random.randint(k_sub, (cap,), 0, n_total)

    cf = max(1, min(BF, _CHUNK_PIXELS // (r * r)))
    n_chunks = -(-BF // cf)
    gp = jnp.pad(grids, ((0, n_chunks * cf - BF), (0, 0), (0, 0)))
    chunks = gp.reshape(n_chunks, cf, *grids.shape[1:])
    ppc = cf * r * r  # pixels per chunk

    # Everything runs as three jitted dispatches (lax.map over chunks):
    # per-op eager chunk loops pay ~100 ms tunnel dispatch latency each,
    # which dominated an earlier version of this path (~7 s of overhead for
    # ~0.3 s of device compute at Pascal-val scale).
    @jax.jit
    def gather_fit(chunks, idx):
        # each sampled global pixel lives in exactly one chunk: gather the
        # clamped local index everywhere, zero out-of-chunk rows, sum
        def one(args):
            c, ch = args
            px = patch_grid_to_image(ch, grid_hw, (r, r)).reshape(ppc, pca_dim)
            local = idx - c * ppc
            inb = (local >= 0) & (local < ppc)
            vals = px[jnp.clip(local, 0, ppc - 1)]
            return vals * inb[:, None].astype(px.dtype)
        vals = jax.lax.map(one, (jnp.arange(n_chunks), chunks))
        return jnp.sum(vals, axis=0)                          # [cap, pca]

    fit_x = gather_fit(chunks, idx)
    result = kmeans(
        fit_x, k, key2, n_iter=n_iter, n_redo=n_redo,
        max_points_per_centroid=None,  # already subsampled above
    )

    @jax.jit
    def assign_all(chunks, centroids):
        def one(ch):
            px = patch_grid_to_image(ch, grid_hw, (r, r)).reshape(ppc, pca_dim)
            return kmeans_assign(px, centroids)
        return jax.lax.map(one, chunks)

    out = assign_all(chunks, result.centroids)
    return out.reshape(n_chunks * ppc)[:n_total]


def prototype_merge_table(
    prototypes: jax.Array, num_classes: int, key: jax.Array | None = None
) -> jax.Array:
    """[K] int32 table mapping each prototype to its merged class — the
    k-means-over-prototypes of reference clustering.py:106-116. The merge
    depends only on the bank, so batch-streaming callers hoist this out of
    their loop and index cluster maps through it."""
    if key is None:
        key = jax.random.PRNGKey(1)
    pn = prototypes / (jnp.linalg.norm(prototypes, axis=-1, keepdims=True) + _EPS)
    return kmeans(pn, num_classes, key, n_iter=50, n_redo=5).assignments


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
        assign = prototype_merge_table(prototypes, num_classes, key)[assign]
    return assign.reshape(B, F, eval_resolution, eval_resolution).astype(jnp.int32)
