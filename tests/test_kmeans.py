import jax
import jax.numpy as jnp
import numpy as np

from timetuning_tpu.ops.kmeans import (
    apply_pca,
    fit_pca,
    kmeans,
    normalize_and_reduce,
)


def _blobs(rng, n_per=200, k=4, d=8, spread=0.05):
    centers = rng.normal(size=(k, d)) * 3
    pts = np.concatenate(
        [centers[i] + spread * rng.normal(size=(n_per, d)) for i in range(k)]
    )
    labels = np.repeat(np.arange(k), n_per)
    return pts.astype(np.float32), labels


def test_recovers_separated_clusters():
    rng = np.random.default_rng(0)
    x, labels = _blobs(rng)
    res = kmeans(jnp.asarray(x), 4, jax.random.PRNGKey(0), n_iter=25, n_redo=3)
    a = np.asarray(res.assignments)
    # each true cluster maps to exactly one predicted cluster
    for i in range(4):
        assert len(np.unique(a[labels == i])) == 1
    assert len(np.unique(a)) == 4
    assert float(res.objective) < 1.0 * x.shape[0] * 0.05


def test_chunked_equals_unchunked():
    rng = np.random.default_rng(1)
    x, _ = _blobs(rng, n_per=256, k=2)
    r1 = kmeans(jnp.asarray(x), 3, jax.random.PRNGKey(1), n_iter=10, n_redo=2, chunk=128)
    r2 = kmeans(jnp.asarray(x), 3, jax.random.PRNGKey(1), n_iter=10, n_redo=2, chunk=512)
    np.testing.assert_array_equal(np.asarray(r1.assignments), np.asarray(r2.assignments))


def test_more_redos_never_worse():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(500, 6)).astype(np.float32)
    o1 = float(kmeans(jnp.asarray(x), 8, jax.random.PRNGKey(3), n_iter=10, n_redo=1).objective)
    o5 = float(kmeans(jnp.asarray(x), 8, jax.random.PRNGKey(3), n_iter=10, n_redo=5).objective)
    assert o5 <= o1 + 1e-3


def test_pca_matches_sklearn():
    from sklearn.decomposition import PCA
    from sklearn.preprocessing import StandardScaler

    rng = np.random.default_rng(3)
    x = rng.normal(size=(300, 16)).astype(np.float32) @ rng.normal(size=(16, 16)).astype(np.float32)
    xs = StandardScaler().fit_transform(x)
    want = PCA(n_components=4, svd_solver="full").fit_transform(xs)
    got = np.asarray(normalize_and_reduce(jnp.asarray(x), 4))
    # eigenvector signs are arbitrary; compare per-component up to sign
    for j in range(4):
        err_pos = np.abs(got[:, j] - want[:, j]).max()
        err_neg = np.abs(got[:, j] + want[:, j]).max()
        assert min(err_pos, err_neg) < 5e-3


def test_pca_fit_apply_consistency():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(100, 8)).astype(np.float32)
    st = fit_pca(jnp.asarray(x), 3)
    y = np.asarray(apply_pca(st, jnp.asarray(x)))
    assert y.shape == (100, 3)
    # components are orthonormal
    c = np.asarray(st.components)
    np.testing.assert_allclose(c.T @ c, np.eye(3), atol=1e-4)


def test_dataset_wise_bounded_equals_materialized(monkeypatch):
    """The bounded-memory dataset-wise clustering path (chunk-upsampled fit
    gather + chunked assignment) must be BIT-identical to the single-program
    path: same key stream, same fit values, same centroids, same maps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from timetuning_tpu.eval import clustering as C

    B, F, N, D, r, k = 2, 2, 16, 12, 16, 2  # n_total=2048 > cap=512
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, F, N, D))
    key = jax.random.PRNGKey(7)

    want = C.cluster_features(feats, k=k, eval_resolution=r,
                              protocol="dataset-wise", key=key)

    monkeypatch.setattr(C, "_DATASET_WISE_PIXEL_LIMIT", 1000)
    monkeypatch.setattr(C, "_CHUNK_PIXELS", 300)  # force per-frame chunks
    got = C.cluster_features(feats, k=k, eval_resolution=r,
                             protocol="dataset-wise", key=key)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_patch_grid_to_image_matches_jax_image_resize():
    """The matmul-based bilinear upsample must reproduce jax.image.resize's
    kernel (half-pixel centers) to float32 rounding on upsampling, and fall
    back to resize exactly on downsampling."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from timetuning_tpu.ops.resize import patch_grid_to_image

    x = jax.random.normal(jax.random.PRNGKey(3), (5, 14 * 14, 7), jnp.float32)
    for size in [(112, 112), (100, 100), (14, 14), (17, 23)]:
        got = patch_grid_to_image(x, (14, 14), size)
        want = jax.image.resize(
            x.reshape(5, 14, 14, 7), (5, *size, 7), method="bilinear"
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=1e-5
        )
    # downsample path (delegates to jax.image.resize, bit-identical)
    down = patch_grid_to_image(x, (14, 14), (7, 7))
    want = jax.image.resize(x.reshape(5, 14, 14, 7), (5, 7, 7, 7), method="bilinear")
    np.testing.assert_array_equal(np.asarray(down), np.asarray(want))
