import numpy as np
import jax.numpy as jnp

from pctpu.ops import grid_hash as G


def brute_knn(query, db, k):
    d2 = ((query[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def test_grid_radius_exact(rng):
    pts = rng.uniform(0, 10, size=(3000, 3)).astype(np.float32)
    q = pts[rng.choice(3000, 200, replace=False)]
    grid = G.build_grid(jnp.asarray(pts), cell_size=0.7)
    res = G.grid_radius(grid, jnp.asarray(q), radius=0.7, k_cap=64,
                        cap_per_cell=64, query_chunk=64)
    d2 = ((q[:, None, :] - pts[None]) ** 2).sum(-1)
    ref_counts = (d2 <= 0.7 ** 2 + 1e-7).sum(1)
    np.testing.assert_allclose(np.asarray(res.count), ref_counts, atol=1)
    valid = np.asarray(res.valid)
    dd = np.asarray(res.dist2)
    assert np.all(dd[valid] <= 0.49 + 1e-4)


def test_grid_knn_matches_brute_when_close(rng):
    # dense cloud: the k-th neighbor is well within one cell
    pts = rng.uniform(0, 4, size=(5000, 3)).astype(np.float32)
    q = pts[:300]
    grid = G.build_grid(jnp.asarray(pts), cell_size=1.0)
    res = G.grid_knn(grid, jnp.asarray(q), k=5, cap_per_cell=128,
                     query_chunk=128)
    ref_d, _ = brute_knn(q, pts, 5)
    assert np.all(ref_d[:, 4] < 1.0)  # assumption holds
    np.testing.assert_allclose(np.sort(np.asarray(res.dist2), 1), ref_d,
                               atol=1e-3)


def test_grid_nearest_matches_brute(rng):
    pts = rng.uniform(0, 8, size=(4000, 3)).astype(np.float32)
    q = (pts[:500] + rng.normal(scale=0.05, size=(500, 3))).astype(np.float32)
    grid = G.build_grid(jnp.asarray(pts), cell_size=1.0)
    d2, idx, found = G.grid_nearest(grid, jnp.asarray(q), cap_per_cell=128,
                                    query_chunk=128)
    ref_d, ref_i = brute_knn(q, pts, 1)
    assert np.all(np.asarray(found))
    np.testing.assert_allclose(np.asarray(d2), ref_d[:, 0], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), ref_i[:, 0])


def test_grid_nearest_not_found_far_query(rng):
    pts = rng.uniform(0, 2, size=(500, 3)).astype(np.float32)
    far = np.array([[100.0, 100.0, 100.0]], np.float32)
    grid = G.build_grid(jnp.asarray(pts), cell_size=0.5)
    _, _, found = G.grid_nearest(grid, jnp.asarray(far), query_chunk=64)
    assert not bool(found[0])


def test_grid_respects_mask(rng):
    pts = rng.uniform(0, 4, size=(1000, 3)).astype(np.float32)
    mask = np.zeros(1000, bool)
    mask[:600] = True
    q = pts[:100]
    grid = G.build_grid(jnp.asarray(pts), jnp.asarray(mask), cell_size=1.0)
    res = G.grid_knn(grid, jnp.asarray(q), k=4, cap_per_cell=128,
                     query_chunk=64)
    idx = np.asarray(res.idx)
    assert np.all(idx[np.asarray(res.valid)] < 600)
