"""Native C++ kernel tests (faiss-replacement library)."""

import numpy as np
import pytest

from psvi_tpu import native

needs_native = pytest.mark.skipif(
    not native.native_available(), reason="g++ build unavailable"
)


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(0)
    X = np.concatenate([
        rng.normal(0, 1, (300, 8)),
        rng.normal(5, 1, (300, 8)),
        rng.normal(-5, 1, (300, 8)),
    ]).astype(np.float32)
    return X


@needs_native
def test_kmeans_recovers_blobs(blobs):
    C, labels, inertia = native.kmeans_fit(blobs, 3, iters=30, seed=1)
    sizes = np.bincount(labels, minlength=3)
    assert (sizes == 300).all()
    # centroids near the true means (up to permutation)
    means = sorted(float(c[0]) for c in C)
    np.testing.assert_allclose(means, [-5, 0, 5], atol=0.5)


@needs_native
def test_kmeans_matches_jax_inertia(blobs):
    import jax
    import jax.numpy as jnp

    from psvi_tpu.ops.kmeans import kmeans_fit as jax_fit, pairwise_sq_dists

    _, _, inertia_native = native.kmeans_fit(blobs, 3, iters=30, seed=1)
    cj, _ = jax_fit(jax.random.PRNGKey(1), jnp.asarray(blobs), 3, 30)
    inertia_jax = float(
        jnp.sum(jnp.min(pairwise_sq_dists(jnp.asarray(blobs), cj), axis=1))
    )
    assert abs(inertia_native - inertia_jax) / inertia_jax < 0.05


@needs_native
def test_nearest_index(blobs):
    C = blobs[[5, 400, 800]] + 0.01
    idx = native.nearest_index(blobs, C)
    assert list(idx) == [5, 400, 800]


@needs_native
def test_pairwise_matches_numpy(blobs):
    D = native.pairwise_sq_dists(blobs[:10], blobs[:7])
    expect = ((blobs[:10, None] - blobs[None, :7]) ** 2).sum(-1)
    np.testing.assert_allclose(D, expect, rtol=1e-4)


@needs_native
def test_kmeans_cluster_native_backend(blobs):
    from psvi_tpu.ops.kmeans import KmeansCluster

    y = np.repeat([0, 1, 2], 300)
    km = KmeansCluster(blobs, y, num_classes=3, seed=0, backend="native")
    km.set_num_clusters(6)
    km.run_kmeans()
    pts = km.get_arbitrary_pts(6)
    assert len(pts) == 6
