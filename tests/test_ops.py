"""Ops-layer tests against NumPy brute-force oracles — the reference's own
oracle style (`kdtree.py:234-238` cross-checks vs argsort brute force)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pctpu import ops


def brute_knn(query, db, k):
    d2 = ((query[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def test_pairwise_sqdist(rng):
    a = rng.normal(size=(50, 3)).astype(np.float32)
    b = rng.normal(size=(70, 3)).astype(np.float32)
    d2 = np.asarray(ops.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, ref, atol=1e-4)


@pytest.mark.parametrize("db_chunk", [None, 64])
def test_knn_matches_brute(rng, db_chunk):
    q = rng.normal(size=(200, 3)).astype(np.float32)
    db = rng.normal(size=(500, 3)).astype(np.float32)
    res = ops.knn(jnp.asarray(q), jnp.asarray(db), 8,
                  query_chunk=128, db_chunk=db_chunk)
    ref_d, _ = brute_knn(q, db, 8)
    np.testing.assert_allclose(np.sort(np.asarray(res.dist2), axis=1),
                               ref_d, atol=1e-3)
    # indices must point at points with matching distances
    gathered = db[np.asarray(res.idx)]
    d_from_idx = ((q[:, None, :] - gathered) ** 2).sum(-1)
    np.testing.assert_allclose(d_from_idx, np.asarray(res.dist2), atol=1e-3)
    assert np.all(np.asarray(res.valid))


def test_knn_with_mask(rng):
    db = rng.normal(size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, bool)
    mask[:60] = True
    q = rng.normal(size=(30, 3)).astype(np.float32)
    res = ops.knn(jnp.asarray(q), jnp.asarray(db), 5,
                  db_mask=jnp.asarray(mask), query_chunk=32)
    assert np.all(np.asarray(res.idx) < 60)
    ref_d, _ = brute_knn(q, db[:60], 5)
    np.testing.assert_allclose(np.sort(np.asarray(res.dist2), 1), ref_d, atol=1e-3)


def test_radius_search(rng):
    db = rng.uniform(-1, 1, size=(400, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    r = 0.5
    res = ops.radius_search(jnp.asarray(q), jnp.asarray(db), r, k_cap=64,
                            query_chunk=32)
    d2 = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    ref_counts = (d2 <= r * r + 1e-7).sum(1)
    got_counts = np.asarray(res.count)
    np.testing.assert_allclose(got_counts, ref_counts, atol=1)
    # every reported neighbor is genuinely within radius
    valid = np.asarray(res.valid)
    dd = np.asarray(res.dist2)
    assert np.all(dd[valid] <= r * r + 1e-5)


def test_nearest(rng):
    q = rng.normal(size=(300, 3)).astype(np.float32)
    db = rng.normal(size=(800, 3)).astype(np.float32)
    d2, idx = ops.nearest(jnp.asarray(q), jnp.asarray(db), query_chunk=128)
    ref_d, ref_i = brute_knn(q, db, 1)
    np.testing.assert_allclose(np.asarray(d2), ref_d[:, 0], atol=1e-3)
    np.testing.assert_array_equal(np.asarray(idx), ref_i[:, 0])


def brute_fps(points, m, skip_near_origin=False):
    """Faithful NumPy port of the reference greedy semantics
    (sampling_gpu.cu:86-172) as oracle."""
    n = points.shape[0]
    idxs = [0]
    temp = np.full(n, 1e10, np.float32)
    old = 0
    for _ in range(1, m):
        d = ((points - points[old]) ** 2).sum(-1)
        temp = np.minimum(temp, d)
        score = temp.copy()
        if skip_near_origin:
            score[(points ** 2).sum(-1) <= 1e-3] = -np.inf
        old = int(np.argmax(score))
        idxs.append(old)
    return np.array(idxs)


def test_fps_matches_reference_greedy(rng):
    pts = rng.normal(size=(256, 3)).astype(np.float32)
    got = np.asarray(ops.fps(jnp.asarray(pts), 32))
    ref = brute_fps(pts, 32)
    np.testing.assert_array_equal(got, ref)


def test_fps_skip_near_origin(rng):
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    pts[50:60] = 0.0  # near-origin points must never be selected
    got = np.asarray(ops.fps(jnp.asarray(pts), 40, skip_near_origin=True))
    assert not np.any((got >= 50) & (got < 60))
    ref = brute_fps(pts, 40, skip_near_origin=True)
    np.testing.assert_array_equal(got, ref)


def test_fps_respects_mask(rng):
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    mask = np.ones(128, bool)
    mask[100:] = False
    got = np.asarray(ops.fps(jnp.asarray(pts), 30, mask=jnp.asarray(mask)))
    assert np.all(got[1:] < 100)


def test_fps_batched(rng):
    pts = rng.normal(size=(4, 128, 3)).astype(np.float32)
    got = np.asarray(ops.fps_batched(jnp.asarray(pts), 16))
    for b in range(4):
        np.testing.assert_array_equal(got[b], brute_fps(pts[b], 16))


def brute_ball_query(centers, points, radius, nsample):
    """NumPy port of ball_query_gpu.cu:23-42 semantics as oracle."""
    m = centers.shape[0]
    idx = np.zeros((m, nsample), np.int32)
    for j in range(m):
        cnt = 0
        for k2 in range(points.shape[0]):
            d2 = ((centers[j] - points[k2]) ** 2).sum()
            if d2 < radius * radius:
                if cnt == 0:
                    idx[j, :] = k2
                idx[j, cnt] = k2
                cnt += 1
                if cnt >= nsample:
                    break
    return idx


def test_ball_query_reference_semantics(rng):
    pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    centers = pts[rng.choice(300, 40, replace=False)]
    idx, valid = ops.ball_query(jnp.asarray(centers), jnp.asarray(pts),
                                radius=0.4, nsample=16, query_chunk=16)
    ref = brute_ball_query(centers, pts, 0.4, 16)
    np.testing.assert_array_equal(np.asarray(idx), ref)
    # each center is its own point -> at least one valid hit
    assert np.all(np.asarray(valid)[:, 0])


def test_gather_group(rng):
    pts = rng.normal(size=(2, 100, 4)).astype(np.float32)
    idx = rng.integers(0, 100, size=(2, 10)).astype(np.int32)
    out = np.asarray(ops.gather_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(out[b], pts[b, idx[b]])
    gidx = rng.integers(0, 100, size=(2, 10, 5)).astype(np.int32)
    gout = np.asarray(ops.group_points(jnp.asarray(pts), jnp.asarray(gidx)))
    for b in range(2):
        np.testing.assert_array_equal(gout[b], pts[b][gidx[b]])


def test_group_points_grad_is_scatter_add(rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    idx = np.array([[0, 0, 1], [2, 2, 2]], np.int32)

    def f(p):
        return jnp.sum(ops.group_points(p, jnp.asarray(idx)))

    g = np.asarray(jax.grad(f)(jnp.asarray(pts)))
    expect = np.zeros_like(pts)
    for row in idx:
        for i in row:
            expect[i] += 1.0
    np.testing.assert_allclose(g, expect)


def test_three_nn_interpolate(rng):
    q = rng.normal(size=(50, 3)).astype(np.float32)
    db = rng.normal(size=(200, 3)).astype(np.float32)
    feats = rng.normal(size=(200, 8)).astype(np.float32)
    d2, idx = ops.three_nn(jnp.asarray(q), jnp.asarray(db), query_chunk=32)
    ref_d, ref_i = brute_knn(q, db, 3)
    np.testing.assert_allclose(np.asarray(d2), ref_d, atol=1e-3)
    w = ops.interpolation_weights(d2)
    out = ops.three_interpolate(jnp.asarray(feats), idx, w)
    # reference formula (pointnet2_modules.py:185-189, sqrt'd dists)
    recip = 1.0 / (np.sqrt(ref_d) + 1e-8)
    wn = recip / recip.sum(1, keepdims=True)
    ref_out = (feats[ref_i] * wn[..., None]).sum(1)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-3)


def test_voxel_downsample_centroid(rng):
    pts = rng.uniform(0, 4, size=(500, 3)).astype(np.float32)
    mask = np.ones(500, bool)
    out = ops.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), leaf=1.0)
    got = out.to_numpy()
    # oracle: dict of voxel -> centroid
    cells = np.floor((pts - pts.min(0)) / 1.0).astype(int)
    voxels = {}
    for p, c in zip(pts, cells):
        voxels.setdefault(tuple(c), []).append(p)
    ref = np.array([np.mean(v, axis=0) for v in voxels.values()])
    assert got.shape == ref.shape
    # compare as sorted sets
    got_s = got[np.lexsort(got.T)]
    ref_s = ref[np.lexsort(ref.T)]
    np.testing.assert_allclose(got_s, ref_s, atol=1e-4)


def test_voxel_downsample_random(rng):
    pts = rng.uniform(0, 4, size=(300, 3)).astype(np.float32)
    mask = np.ones(300, bool)
    out = ops.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), leaf=1.0,
                               method="random", key=jax.random.PRNGKey(1))
    got = out.to_numpy()
    cells = np.floor((pts - pts.min(0)) / 1.0).astype(int)
    n_vox = len({tuple(c) for c in cells})
    assert got.shape[0] == n_vox
    # every representative is an actual input point
    d2 = ((got[:, None, :] - pts[None, :, :]) ** 2).sum(-1).min(1)
    assert np.all(d2 < 1e-9)


def test_voxel_downsample_masked(rng):
    pts = rng.uniform(0, 4, size=(200, 3)).astype(np.float32)
    mask = np.zeros(200, bool)
    mask[:120] = True
    out = ops.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), leaf=0.5)
    got = out.to_numpy()
    cells = np.floor((pts[:120] - pts[:120].min(0)) / 0.5).astype(int)
    n_vox = len({tuple(c) for c in cells})
    assert got.shape[0] == n_vox


def test_eigh3_matches_lapack(rng):
    A = rng.normal(size=(500, 3, 3)).astype(np.float32)
    A = A + np.swapaxes(A, 1, 2)
    w, V = ops.eigh3(jnp.asarray(A))
    w_ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=2e-4 * np.abs(w_ref).max())
    # A V = V diag(w)
    av = np.einsum("nij,njk->nik", A, np.asarray(V))
    vw = np.asarray(V) * np.asarray(w)[:, None, :]
    np.testing.assert_allclose(av, vw, atol=5e-3)
    # orthonormal columns
    vtv = np.einsum("nji,njk->nik", np.asarray(V), np.asarray(V))
    np.testing.assert_allclose(vtv, np.tile(np.eye(3), (500, 1, 1)), atol=1e-4)


def test_eigh3_degenerate():
    A = np.stack([np.eye(3, dtype=np.float32) * 2.0,
                  np.zeros((3, 3), np.float32),
                  np.diag([1.0, 1.0, 5.0]).astype(np.float32)])
    w, V = ops.eigh3(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(w)[0], [2, 2, 2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(w)[1], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(w)[2], [1, 1, 5], atol=1e-3)
    for i in range(3):
        vtv = np.asarray(V)[i].T @ np.asarray(V)[i]
        np.testing.assert_allclose(vtv, np.eye(3), atol=1e-4)


def test_pca_matches_numpy(rng):
    data = rng.normal(size=(400, 3)).astype(np.float32) * np.array([3.0, 1.0, 0.2])
    vals, vecs = ops.pca(jnp.asarray(data))
    cov = np.cov(data.T, bias=True)
    ref_vals, ref_vecs = np.linalg.eigh(cov)
    np.testing.assert_allclose(np.asarray(vals), ref_vals[::-1], rtol=1e-3)
    for i in range(3):
        dot = abs(np.dot(np.asarray(vecs)[:, i], ref_vecs[:, 2 - i]))
        assert dot > 0.999


def test_estimate_normals_plane(rng):
    # points on z=0 plane + tiny noise: normals must be ±z
    pts = np.zeros((256, 3), np.float32)
    pts[:, :2] = rng.uniform(-1, 1, size=(256, 2))
    pts[:, 2] = rng.normal(scale=1e-4, size=256)
    normals = np.asarray(ops.estimate_normals(
        jnp.asarray(pts), k=8, viewpoint=jnp.array([0.0, 0.0, 10.0])))
    np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0, atol=1e-3)
    assert np.all(normals[:, 2] > 0)  # oriented to viewpoint


def test_pca_project(rng):
    data = rng.normal(size=(300, 3)).astype(np.float32) * np.array(
        [5.0, 1.0, 0.1])
    proj = np.asarray(ops.pca_project(jnp.asarray(data), 2))
    assert proj.shape == (300, 2)
    # first projected axis carries the largest variance
    assert proj[:, 0].var() > proj[:, 1].var() > data[:, 2].var()


def test_group_points_batched_matches_vmap(rng):
    """Explicit batch dims (flat-offset gather) == vmap of the single op."""
    from pctpu.ops.gather import gather_points, group_points
    b, n, m, k, c = 4, 64, 32, 8, 5
    pts = jnp.asarray(rng.uniform(size=(b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(b, m, k)).astype(np.int32))
    out = np.asarray(group_points(pts, idx))
    ref = np.asarray(jax.vmap(lambda p, i: group_points(p, i))(pts, idx))
    np.testing.assert_array_equal(out, ref)
    i1 = idx[:, :, 0]
    out1 = np.asarray(gather_points(pts, i1))
    ref1 = np.asarray(jax.vmap(lambda p, i: gather_points(p, i))(pts, i1))
    np.testing.assert_array_equal(out1, ref1)


def test_voxel_downsample_batch_matches_single(rng):
    """voxel_downsample_batch row b == voxel_downsample on cloud b."""
    from pctpu.ops.voxel import voxel_downsample, voxel_downsample_batch
    b, n = 3, 512
    pts = jnp.asarray(rng.uniform(-10, 10, (b, n, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(b, n)) < 0.9)
    out = voxel_downsample_batch(pts, mask, 1.5)
    for i in range(b):
        ref = voxel_downsample(pts[i], mask[i], 1.5)
        np.testing.assert_array_equal(np.asarray(out.mask[i]),
                                      np.asarray(ref.mask))
        mv = np.asarray(ref.mask)
        # cumsum-difference centroids carry ~leaf*N*eps round-off
        np.testing.assert_allclose(np.asarray(out.points[i])[mv],
                                   np.asarray(ref.points)[mv], atol=5e-3)


def test_voxel_downsample_capped_uniform_stride(rng):
    """When the cap binds, kept voxels span the whole scene (uniform
    stride over lexsorted voxel ids), and the pre-cap count is reported."""
    from pctpu.ops.voxel import voxel_downsample_batch, voxel_downsample_capped
    pts = jnp.asarray(rng.uniform(-20, 20, (2, 4096, 3)).astype(np.float32))
    mask = jnp.ones((2, 4096), bool)
    full = voxel_downsample_batch(pts, mask, 1.0)
    nv_true = int(jnp.sum(full.mask[0]))
    cap = nv_true // 3
    capped, nv = voxel_downsample_capped(pts, mask, 1.0, cap)
    assert int(nv[0]) == nv_true
    assert bool(jnp.all(capped.mask))
    kept = np.asarray(capped.points[0])
    allv = np.asarray(full.points[0])[np.asarray(full.mask[0])]
    span_kept = kept[:, 0].max() - kept[:, 0].min()
    span_full = allv[:, 0].max() - allv[:, 0].min()
    assert span_kept > 0.9 * span_full
