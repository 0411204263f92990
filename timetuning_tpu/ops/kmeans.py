"""On-device k-means and PCA — the faiss replacement.

The reference clusters dense features with faiss-cpu ``Kmeans(d, k, niter=50,
nredo=5, seed=1)`` and reduces with ``PCAMatrix`` after a chunked
StandardScaler pass (reference clustering.py:38-73, my_utils.py:19-37,
cluster_based_foreground_extraction.py:268-279). Here both run on the TPU:

  * k-means is a ``lax.scan`` over Lloyd iterations; the assignment step is
    one [N, k] distance matmul on the MXU, tiled over point chunks so the
    distance matrix never materializes for dataset-scale N;
  * ``n_redo`` restarts run sequentially with different sampled seeds and the
    best-objective restart wins (faiss semantics);
  * empty clusters keep their previous centroid (faiss instead splits large
    clusters — a rare-path difference documented here);
  * PCA is exact: covariance eigendecomposition on the feature dim
    (D ≤ 768), whitening optional, preceded by mean/std standardization.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from timetuning_tpu.ops.util import pad_to_multiple

_EPS = 1e-12


class KMeansResult(NamedTuple):
    centroids: jax.Array    # [k, D]
    assignments: jax.Array  # [N] int32
    objective: jax.Array    # scalar — sum of squared distances


def _assign_chunked(x, centroids, chunk: int):
    """argmin distances + objective, tiled over points. x: [N, D], c: [k, D].

    Ragged N is padded UP to a chunk multiple (padded rows sliced off) —
    falling back to a single chunk would materialize the full [N, k]
    distance matrix at exactly the dataset scale the tiling exists for
    (18.2M × 200 f32 ≈ 14.6 GB)."""
    N = x.shape[0]
    c_sq = jnp.sum(centroids ** 2, axis=1)  # [k]

    def one_chunk(xc):
        d = (
            jnp.sum(xc ** 2, axis=1, keepdims=True)
            - 2.0 * jnp.dot(xc, centroids.T, preferred_element_type=jnp.float32)
            + c_sq[None, :]
        )
        a = jnp.argmin(d, axis=1)
        return a.astype(jnp.int32), jnp.min(d, axis=1)

    if N <= chunk:
        return one_chunk(x)
    Np = pad_to_multiple(N, chunk)
    xp = jnp.pad(x, ((0, Np - N), (0, 0)))
    xs = xp.reshape(Np // chunk, chunk, -1)
    a, dmin = jax.lax.map(one_chunk, xs)
    return a.reshape(Np)[:N], dmin.reshape(Np)[:N]


def _lloyd(x, init_centroids, n_iter: int, chunk: int):
    k = init_centroids.shape[0]

    def body(centroids, _):
        a, _ = _assign_chunked(x, centroids, chunk)
        # segment_sum instead of a dense one-hot matmul: the [N, k] one-hot
        # would cost N·k floats PER ITERATION (14.6 GB at Pascal-val scale
        # with max_points_per_centroid=None), defeating the chunked
        # assignment's memory bound
        sums = jax.ops.segment_sum(x, a, num_segments=k)         # [k, D]
        counts = jax.ops.segment_sum(
            jnp.ones((x.shape[0],), jnp.float32), a, num_segments=k
        )[:, None]
        new_c = sums / jnp.maximum(counts, 1.0)
        # empty cluster → keep previous centroid
        new_c = jnp.where(counts > 0, new_c, centroids)
        return new_c.astype(x.dtype), None

    centroids, _ = jax.lax.scan(body, init_centroids, None, length=n_iter)
    a, dmin = _assign_chunked(x, centroids, chunk)
    return centroids, a, jnp.sum(dmin)


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_iter", "n_redo", "chunk", "max_points_per_centroid"),
)
def kmeans(
    x: jax.Array,
    k: int,
    key: jax.Array,
    n_iter: int = 50,
    n_redo: int = 5,
    chunk: int = 8192,
    max_points_per_centroid: int | None = 256,
) -> KMeansResult:
    """Lloyd k-means with restarts, fully on device. x: [N, D] float.

    ``max_points_per_centroid`` reproduces faiss's default training-set
    subsampling (faiss Clustering: when N > 256·k, train on a random
    256·k-point subset, then assign everything) — the reference's
    ``faiss.Kmeans(d, k, niter=50, nredo=5)`` runs with exactly this
    behavior, so fitting on *all* points would be both slower and
    unfaithful at dataset-wise scale (Pascal val = 18.2M pixels, fit set =
    5,376). ``None`` disables subsampling.
    """
    x = x.astype(jnp.float32)
    N = x.shape[0]
    cap = N if max_points_per_centroid is None else k * max_points_per_centroid
    if N > cap:
        key, k_sub = jax.random.split(key)
        # with-replacement draw: collision probability ~cap²/2N is negligible
        # at the scales where subsampling triggers, and it avoids the
        # full-pool sort a without-replacement choice would lower to
        # (seconds for 18M keys on TPU)
        fit_x = x[jax.random.randint(k_sub, (cap,), 0, N)]
    else:
        fit_x = x
    Nf = fit_x.shape[0]

    def one_restart(carry, key_r):
        best_c, best_obj = carry
        idx = jax.random.choice(key_r, Nf, (k,), replace=False)
        c0 = fit_x[idx]
        c, _, obj = _lloyd(fit_x, c0, n_iter, chunk)
        better = obj < best_obj
        return (jnp.where(better, c, best_c), jnp.minimum(obj, best_obj)), None

    init = (jnp.zeros((k, x.shape[1]), jnp.float32), jnp.asarray(jnp.inf))
    (c, obj), _ = jax.lax.scan(one_restart, init, jax.random.split(key, n_redo))
    a, dmin = _assign_chunked(x, c, chunk)
    return KMeansResult(c, a, jnp.sum(dmin))


def kmeans_assign(x: jax.Array, centroids: jax.Array, chunk: int = 8192) -> jax.Array:
    """Nearest-centroid assignment for points that were not part of the fit
    (the faiss ``index.search`` step after ``Kmeans.train``). x: [N, D]."""
    x = x.astype(jnp.float32)
    a, _ = _assign_chunked(x, centroids.astype(jnp.float32), chunk)
    return a


class PCAState(NamedTuple):
    mean: jax.Array     # [D]
    std: jax.Array      # [D]
    components: jax.Array  # [D, d_out]


class PCAMoments(NamedTuple):
    """Streaming sufficient statistics for standardize+PCA: count, Σx, Σxxᵀ.

    Lets the dataset-wise Evaluator fit the exact same PCA as ``fit_pca``
    without ever materializing the full feature set (the reference's chunked
    ``StandardScaler.partial_fit`` pass, my_utils.py:19-37, made bounded-
    memory end to end). Accumulated on host in float64 so millions of rows
    don't lose the tail digits of the second moment.
    """

    count: float
    s1: "jax.Array"   # [D] float64 (host numpy)
    s2: "jax.Array"   # [D, D] float64 (host numpy)


def init_moments(d: int) -> PCAMoments:
    import numpy as np

    return PCAMoments(0.0, np.zeros(d, np.float64), np.zeros((d, d), np.float64))


@jax.jit
def _batch_moments(x):
    x = x.astype(jnp.float32)
    return (
        jnp.sum(x, axis=0),
        jnp.dot(x.T, x, preferred_element_type=jnp.float32),
    )


def update_moments(m: PCAMoments, x: jax.Array) -> PCAMoments:
    """Fold a [N, D] batch into the running statistics (device matmul for the
    second moment, host float64 accumulation)."""
    import numpy as np

    s1, s2 = _batch_moments(x)
    return PCAMoments(
        m.count + float(x.shape[0]),
        m.s1 + np.asarray(s1, np.float64),
        m.s2 + np.asarray(s2, np.float64),
    )


def pca_from_moments(m: PCAMoments, d_out: int, standardize: bool = True) -> PCAState:
    """Fit the same standardize+PCA as ``fit_pca`` from streaming moments:
    cov(x̂) = (E[xxᵀ] − μμᵀ) / (σ+ε)(σ+ε)ᵀ."""
    import numpy as np

    mean = m.s1 / m.count
    cov_raw = m.s2 / m.count - np.outer(mean, mean)
    if standardize:
        std = np.sqrt(np.maximum(np.diag(cov_raw), 0.0))
    else:
        std = np.ones_like(mean)
    denom = np.outer(std + _EPS, std + _EPS)
    cov = (cov_raw / denom).astype(np.float32)
    evals, evecs = jnp.linalg.eigh(jnp.asarray(cov))
    comps = evecs[:, ::-1][:, :d_out]
    return PCAState(
        jnp.asarray(mean, jnp.float32), jnp.asarray(std, jnp.float32), comps
    )


def fit_pca(x: jax.Array, d_out: int, standardize: bool = True) -> PCAState:
    """Standardize + exact PCA via eigh of the covariance (reference:
    StandardScaler.partial_fit + faiss PCAMatrix, my_utils.py:19-37)."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=0)
    std = jnp.std(x, axis=0) if standardize else jnp.ones_like(mean)
    xs = (x - mean) / (std + _EPS)
    cov = jnp.dot(xs.T, xs, preferred_element_type=jnp.float32) / x.shape[0]
    evals, evecs = jnp.linalg.eigh(cov)           # ascending
    comps = evecs[:, ::-1][:, :d_out]             # top-d_out
    return PCAState(mean, std, comps)


def apply_pca(state: PCAState, x: jax.Array) -> jax.Array:
    xs = (x.astype(jnp.float32) - state.mean) / (state.std + _EPS)
    return jnp.dot(xs, state.components, preferred_element_type=jnp.float32)


def normalize_and_reduce(x: jax.Array, d_out: int = 50) -> jax.Array:
    """``normalize_and_transform`` equivalent (my_utils.py:19-37):
    standardize then PCA-reduce feature dim. x: [N, D] → [N, d_out]."""
    state = fit_pca(x, d_out)
    return apply_pca(state, x)
