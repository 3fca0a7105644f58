"""Native C++ KD-tree / octree vs the brute-force oracle.

Mirrors the reference's own cross-checks (`kdtree.py:212-246` and
`octree.py:330-374` validate kNN/radius against NumPy argsort on random
data; `benchmark.py` against scipy on the real KITTI scan — SURVEY.md §4).
"""
import numpy as np
import pytest

from pctpu.native import spatial


@pytest.fixture(scope="module")
def db(rng_mod=np.random.default_rng(7)):
    return rng_mod.uniform(-10, 10, (5000, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def queries():
    return np.random.default_rng(8).uniform(-10, 10, (200, 3)).astype(
        np.float32)


@pytest.fixture(scope="module")
def brute(db, queries):
    d2 = ((queries[:, None, :] - db[None]) ** 2).sum(-1)
    return d2, np.argsort(d2, axis=1)


@pytest.fixture(scope="module", params=["kdtree", "octree"])
def tree(request, db):
    if request.param == "kdtree":
        return spatial.KDTree(db, leaf_size=16)
    return spatial.Octree(db, leaf_size=16)


def test_knn_matches_brute(tree, queries, brute):
    d2, order = brute
    k = 8
    idx, dd2, cmp = tree.knn(queries, k)
    ref_d2 = np.take_along_axis(d2, order[:, :k], 1)
    np.testing.assert_allclose(np.sort(dd2, 1), np.sort(ref_d2, 1),
                               rtol=1e-4, atol=1e-5)
    assert (np.sort(idx, 1) == np.sort(order[:, :k], 1)).all()


def test_knn_counters_prune(tree, db, queries):
    # the point of a tree: far fewer distance comparisons than brute force
    _, _, cmp = tree.knn(queries, 8)
    if tree.native:
        assert (cmp > 0).all()
        assert cmp.mean() < db.shape[0] / 4
    else:
        assert (cmp == -1).all()  # scipy fallback has no counters


def test_radius_matches_brute(tree, queries, brute):
    d2, _ = brute
    r = 1.5
    idx, dd2, cnt, _ = tree.radius(queries, r, cap=256)
    np.testing.assert_array_equal(cnt, (d2 <= r * r).sum(1))
    for i in range(0, queries.shape[0], 23):
        got = np.sort(idx[i][: min(int(cnt[i]), 256)])
        ref = np.sort(np.flatnonzero(d2[i] <= r * r))
        np.testing.assert_array_equal(got, ref)


def test_radius_overflow_count(tree, db):
    # cap smaller than the true neighborhood: count still reports the truth
    q = db[:4]
    idx, _, cnt, _ = tree.radius(q, 5.0, cap=4)
    d2 = ((q[:, None, :] - db[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(cnt, (d2 <= 25.0).sum(1))
    assert (idx >= 0).all()


def test_octree_fast_path(db, queries):
    oc = spatial.Octree(db, leaf_size=16)
    if not oc.native:
        pytest.skip("native lib unavailable")
    r = 4.0
    i1, _, c1, m1 = oc.radius(queries, r, cap=512, fast=True)
    i2, _, c2, m2 = oc.radius(queries, r, cap=512, fast=False)
    np.testing.assert_array_equal(c1, c2)
    s1 = np.sort(np.where(i1 < 0, 1 << 30, i1), 1)
    s2 = np.sort(np.where(i2 < 0, 1 << 30, i2), 1)
    np.testing.assert_array_equal(s1, s2)
    # contains() fires at interior levels -> strictly fewer comparisons
    assert m1.sum() < m2.sum()


def test_kdtree_k_larger_than_n():
    db = np.random.default_rng(1).normal(size=(5, 3)).astype(np.float32)
    kd = spatial.KDTree(db, leaf_size=2)
    idx, d2, _ = kd.knn(db[:2], k=8)
    assert (idx[:, :5] >= 0).all()
    assert (idx[:, 5:] == -1).all()
    assert np.isinf(d2[:, 5:]).all()


def test_kitti_scan_parity(kitti_scan):
    """Real-scan spot check against scipy (the reference benchmark's oracle,
    benchmark.py:85-97) — also covers the threaded query path."""
    from scipy.spatial import cKDTree

    pts = kitti_scan[:40000]
    q = pts[:1000]
    sk = cKDTree(pts)
    ref_d, ref_i = sk.query(q, k=4)
    for tree in (spatial.KDTree(pts), spatial.Octree(pts)):
        idx, d2, _ = tree.knn(q, 4, n_threads=8)
        np.testing.assert_allclose(np.sort(d2, 1),
                                   np.sort(ref_d.astype(np.float64) ** 2, 1),
                                   rtol=1e-3, atol=1e-4)


def test_radius_dist2_padding_is_inf(rng):
    """ADVICE r1: padded dist2 slots must be inf on both backends."""
    pts = rng.uniform(0, 10, size=(500, 3)).astype(np.float32)
    q = pts[:5]
    for cls in (spatial.KDTree, spatial.Octree):
        tree = cls(pts, leaf_size=8)
        idx, d2, cnt, _ = tree.radius(q, r=0.5, cap=32)
        pad = idx < 0
        assert np.isinf(d2[pad]).all()
        assert np.isfinite(d2[~pad]).all()


def test_knn_rejects_k_zero(rng):
    pts = rng.uniform(0, 10, size=(100, 3)).astype(np.float32)
    import pytest
    for cls in (spatial.KDTree, spatial.Octree):
        tree = cls(pts)
        with pytest.raises(ValueError):
            tree.knn(pts[:3], k=0)
