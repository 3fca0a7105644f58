"""Clustering tests with sklearn as oracle — the reference's own comparison
strategy (`compare_cluster.py:20-193` pits its algorithms against sklearn)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from sklearn import datasets as skdata
from sklearn.metrics import adjusted_rand_score

from pctpu import cluster


def three_blobs(n=300, std=0.6, seed=0):
    X, y = skdata.make_blobs(n_samples=n, centers=3, cluster_std=std,
                             random_state=seed)
    return X.astype(np.float32), y


def test_kmeans_blobs():
    X, y = three_blobs()
    km = cluster.K_Means(n_clusters=3).fit(X)
    assert adjusted_rand_score(y, km.labels_) > 0.95
    # predict consistent with labels_
    np.testing.assert_array_equal(km.predict(X), km.labels_)


def test_kmeans_jit_api():
    X, y = three_blobs(seed=3)
    centers, labels, n_iter = cluster.kmeans(jnp.asarray(X), 3)
    assert adjusted_rand_score(y, np.asarray(labels)) > 0.95
    assert int(n_iter) < 100


def test_gmm_blobs():
    X, y = three_blobs(n=600, std=0.8, seed=1)
    g = cluster.GMM(n_clusters=3).fit(X)
    pred = g.predict(X)
    assert adjusted_rand_score(y, pred) > 0.9
    # weights sum to 1, covariances symmetric PSD-ish
    w = np.asarray(g.state.weights)
    assert w.sum() == pytest.approx(1.0, abs=1e-4)
    covs = np.asarray(g.state.covs)
    np.testing.assert_allclose(covs, np.swapaxes(covs, 1, 2), atol=1e-5)


def test_gmm_anisotropic():
    # reference demo data (GMM.py:102-104): 3 anisotropic gaussians
    rng = np.random.default_rng(0)
    mus = [[0.5, 0.5], [5.5, 2.5], [1, 7]]
    vars_ = [[1, 3], [2, 2], [6, 2]]
    ns = [400, 600, 1000]
    X = np.vstack([rng.multivariate_normal(m, np.diag(v), n)
                   for m, v, n in zip(mus, vars_, ns)]).astype(np.float32)
    y = np.concatenate([np.full(n, i) for i, n in enumerate(ns)])
    g = cluster.GMM(n_clusters=3, seed=1).fit(X)
    assert adjusted_rand_score(y, g.predict(X)) > 0.75


def test_dbscan_moons_matches_sklearn():
    from sklearn.cluster import DBSCAN as SKDBSCAN
    X, _ = skdata.make_moons(n_samples=400, noise=0.05, random_state=0)
    X = X.astype(np.float32)
    ours = cluster.DBSCAN(radius=0.2, Min_Pts=5).fit(X).labels_
    ref = SKDBSCAN(eps=0.2, min_samples=5).fit(X).labels_
    # identical partitions up to relabeling; noise agrees exactly
    assert adjusted_rand_score(ref, ours) > 0.99
    np.testing.assert_array_equal(ours == -1, ref == -1)


def test_dbscan_noise():
    X, y = three_blobs(n=200, std=0.4, seed=2)
    X = np.vstack([X, np.array([[50.0, 50.0]], np.float32)])  # an outlier
    labels = cluster.DBSCAN(radius=1.0, Min_Pts=5).fit(X).labels_
    assert labels[-1] == -1
    assert adjusted_rand_score(y, labels[:-1]) > 0.9


def test_spectral_circles():
    X, y = skdata.make_circles(n_samples=300, factor=0.4, noise=0.04,
                               random_state=0)
    X = X.astype(np.float32)
    sc = cluster.spetral_clustering(n_clusters=2, nnk=10).fit(X)
    assert adjusted_rand_score(y, sc.labels_) > 0.95


def test_plane_ransac(rng):
    n_in, n_out = 800, 200
    pts = np.zeros((n_in + n_out, 3), np.float32)
    pts[:n_in, :2] = rng.uniform(-10, 10, (n_in, 2))
    pts[:n_in, 2] = 1.5 + rng.normal(scale=0.05, size=n_in)  # plane z=1.5
    pts[n_in:] = rng.uniform(-10, 10, (n_out, 3))
    res = cluster.plane_ransac(jnp.asarray(pts), dist_thresh=0.2,
                               key=jax.random.PRNGKey(0))
    nrm = np.asarray(res.normal)
    assert abs(nrm[2]) > 0.999
    got = np.asarray(res.inlier_mask)
    assert got[:n_in].mean() > 0.98
    assert got[n_in:].mean() < 0.1


def test_segment_ground_with_normals(rng):
    n = 1000
    pts = np.zeros((n, 3), np.float32)
    pts[:, :2] = rng.uniform(-20, 20, (n, 2))
    pts[:700, 2] = rng.normal(scale=0.05, size=700)         # ground
    pts[700:, 2] = rng.uniform(0.5, 3.0, size=300)          # objects
    normals = np.zeros((n, 3), np.float32)
    normals[:700, 2] = 1.0
    normals[700:] = rng.normal(size=(300, 3)).astype(np.float32)
    normals[700:] /= np.linalg.norm(normals[700:], axis=1, keepdims=True)
    ground, res = cluster.segment_ground(
        jnp.asarray(pts), normals=jnp.asarray(normals), dist_thresh=0.3,
        key=jax.random.PRNGKey(1))
    g = np.asarray(ground)
    assert g[:700].mean() > 0.95
    assert g[700:].mean() < 0.2


def test_dbscan_exact_adversarial_dense_bridge():
    """Two hyper-dense poles (>> k_cap points each) inside ONE eps-ball:
    the k_cap-nearest propagation graph disconnects them, the escalating
    exact path must not (VERDICT r1 weak #7)."""
    import numpy as np
    import jax.numpy as jnp
    from pctpu.cluster.dbscan import dbscan_exact

    rng = np.random.default_rng(0)
    k_cap = 16
    pole_a = rng.normal(scale=0.01, size=(80, 2)).astype(np.float32)
    pole_b = (rng.normal(scale=0.01, size=(80, 2))
              + np.array([0.5, 0.0])).astype(np.float32)
    pts = jnp.asarray(np.concatenate([pole_a, pole_b]))
    # eps=0.6 spans both poles -> every point's eps-ball holds all 160
    # points, far beyond k_cap=16
    labels = np.asarray(dbscan_exact(pts, eps=0.6, min_pts=5, k_cap=k_cap))
    assert (labels >= 0).all()
    assert len(np.unique(labels)) == 1, (
        f"dense bridge split into {len(np.unique(labels))} clusters")


def test_dbscan_exact_no_escalation_needed_matches_dbscan():
    import numpy as np
    import jax.numpy as jnp
    from pctpu.cluster.dbscan import dbscan, dbscan_exact

    rng = np.random.default_rng(1)
    a = rng.normal(size=(60, 2)).astype(np.float32) * 0.1
    b = rng.normal(size=(60, 2)).astype(np.float32) * 0.1 + 5.0
    pts = jnp.asarray(np.concatenate([a, b]))
    l1 = np.asarray(dbscan(pts, eps=0.5, min_pts=5, k_cap=64))
    l2 = np.asarray(dbscan_exact(pts, eps=0.5, min_pts=5, k_cap=64))
    np.testing.assert_array_equal(l1, l2)
