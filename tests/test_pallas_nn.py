"""Pallas 1-NN kernel logic, validated on CPU via interpret mode
(SURVEY.md §4: CPU-runnable kernel tests the reference lacks)."""
import jax
import numpy as np
import jax.numpy as jnp

from pctpu.ops.pallas_nn import nearest_pallas


def test_nearest_pallas_interpret_matches_brute(rng):
    q = rng.uniform(-40, 40, size=(700, 3)).astype(np.float32)
    db = rng.uniform(-40, 40, size=(3000, 3)).astype(np.float32)
    d2, idx = nearest_pallas(jnp.asarray(q), jnp.asarray(db),
                             query_tile=256, db_tile=1024, interpret=True)
    ref = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
    np.testing.assert_allclose(np.asarray(d2), ref.min(1), rtol=1e-6)


def test_nearest_pallas_interpret_mask(rng):
    q = rng.normal(size=(100, 3)).astype(np.float32)
    db = rng.normal(size=(500, 3)).astype(np.float32)
    mask = np.zeros(500, bool)
    mask[:321] = True
    d2, idx = nearest_pallas(jnp.asarray(q), jnp.asarray(db),
                             jnp.asarray(mask),
                             query_tile=128, db_tile=256, interpret=True)
    ref = ((q[:, None, :] - db[None, :321, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))


def test_nearest_banded_interpret(rng):
    from pctpu.ops.pallas_banded import build_banded, nearest_banded
    db = rng.uniform(0, 10, size=(2048, 3)).astype(np.float32)
    db[:, 0] *= 10  # make axis 0 the widest
    q = (db[:512] + rng.normal(scale=0.05, size=(512, 3))).astype(np.float32)
    q = q[np.argsort(q[:, 0])]  # tile coherence
    bdb = build_banded(jnp.asarray(db), block=256)
    d2, idx = nearest_banded(bdb, jnp.asarray(q), block=256,
                             window_blocks=4, query_tile=128,
                             interpret=True)
    ref = ((q[:, None, :] - db[None]) ** 2).sum(-1)
    ri = ref.argmin(1)
    # near-exact: queries are jittered db points, window is generous
    match = (np.asarray(idx) == ri).mean()
    assert match > 0.95
    np.testing.assert_allclose(np.asarray(d2)[np.asarray(idx) == ri],
                               ref.min(1)[np.asarray(idx) == ri], rtol=1e-5)


def test_nearest_banded_respects_mask(rng):
    from pctpu.ops.pallas_banded import build_banded, nearest_banded
    db = rng.uniform(0, 10, size=(1024, 3)).astype(np.float32)
    mask = np.zeros(1024, bool)
    mask[:700] = True
    q = db[:128]
    bdb = build_banded(jnp.asarray(db), jnp.asarray(mask), block=256)
    d2, idx = nearest_banded(bdb, jnp.asarray(q), block=256,
                             window_blocks=4, query_tile=128,
                             interpret=True)
    assert np.all(np.asarray(idx) < 700)


def test_icp_moments_banded_matches_unfused(rng):
    """Fused kernel's moment matrix reproduces the explicit association +
    weighted_procrustes pipeline (same window, same threshold)."""
    from pctpu.ops.pallas_banded import (build_banded, icp_moments_banded,
                                         nearest_banded)
    from pctpu.register.procrustes import (procrustes_from_moments,
                                           weighted_procrustes)

    db = rng.uniform(-20, 20, size=(2000, 3)).astype(np.float32)
    q = (db[:1500] + rng.normal(scale=0.05, size=(1500, 3))).astype(np.float32)
    # sort queries by the band axis the way the fused ICP driver does
    bdb = build_banded(jnp.asarray(db), block=256)
    axis = int(np.asarray(bdb.axis))
    q = q[np.argsort(q[:, axis])]
    mask = jnp.ones((1500,), bool)

    m44 = icp_moments_banded(bdb, jnp.asarray(q), mask, dist_thresh=5.0,
                             block=256, window_blocks=4, query_tile=256,
                             interpret=True)
    R_f, t_f = procrustes_from_moments(m44)

    d2, idx = nearest_banded(bdb, jnp.asarray(q), block=256,
                             window_blocks=4, query_tile=256, interpret=True)
    w = (np.asarray(d2) < 25.0).astype(np.float32)
    R_u, t_u = weighted_procrustes(jnp.asarray(q),
                                   jnp.asarray(db)[idx], jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R_f), np.asarray(R_u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_u), atol=1e-3)


def test_icp_moments_banded_respects_masks(rng):
    """Masked queries and masked db points contribute zero weight."""
    from pctpu.ops.pallas_banded import build_banded, icp_moments_banded

    db = rng.uniform(-5, 5, size=(600, 3)).astype(np.float32)
    db_mask = np.ones(600, bool)
    db_mask[500:] = False
    q = db[:400].copy()
    q_mask = np.ones(400, bool)
    q_mask[300:] = False
    bdb = build_banded(jnp.asarray(db), jnp.asarray(db_mask), block=128)
    m44 = icp_moments_banded(bdb, jnp.asarray(q), jnp.asarray(q_mask),
                             dist_thresh=5.0, block=128, window_blocks=8,
                             query_tile=128, interpret=True)
    m44 = np.asarray(m44)
    # every VALID query self-matches (q is a subset of db, full window)
    assert m44[3, 3] == 300.0
    # moment centroids equal the valid-query centroid on both sides
    np.testing.assert_allclose(m44[:3, 3] / m44[3, 3], q[:300].mean(0),
                               atol=1e-4)
    np.testing.assert_allclose(m44[3, :3] / m44[3, 3], q[:300].mean(0),
                               atol=1e-4)


def test_icp_fixed_iters_banded_fused_converges(rng):
    """End-to-end fused ICP recovers a small rigid transform."""
    from scipy.spatial.transform import Rotation
    from pctpu.register.icp import icp_fixed_iters_banded_fused

    src = rng.uniform(-20, 20, size=(2000, 3)).astype(np.float32)
    R = Rotation.from_rotvec([0.01, 0.02, 0.05]).as_matrix().astype(np.float32)
    t = np.array([0.5, -0.3, 0.1], np.float32)
    dst = (src @ R.T + t).astype(np.float32)
    m = jnp.ones((2000,), bool)
    T = icp_fixed_iters_banded_fused(jnp.asarray(src), m, jnp.asarray(dst), m,
                                     iters=25, dist_thresh=5.0, block=512,
                                     window_blocks=2, query_tile=256,
                                     interpret=True)
    Tg = np.eye(4, dtype=np.float32)
    Tg[:3, :3] = R
    Tg[:3, 3] = t
    assert np.abs(np.asarray(T) - Tg).max() < 0.05


def test_group_points_pallas_fwd_bwd_matches_xla(rng):
    """Differentiable Pallas grouping (gather fwd + in-kernel scatter-add
    bwd) reproduces the XLA gather path and its gradient."""
    from pctpu.ops.pallas_gather import group_points_pallas
    from pctpu.ops.gather import group_points

    pts = jnp.asarray(rng.normal(size=(2, 300, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 300, (2, 40, 8)).astype(np.int32))
    a = group_points_pallas(pts, idx, 64, True)
    b = group_points(pts, idx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    import jax
    g1 = jax.grad(lambda p: (group_points_pallas(p, idx, 64, True) ** 2
                             ).sum())(pts)
    g2 = jax.grad(lambda p: (group_points(p, idx) ** 2).sum())(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_icp_banded_fused_vmaps(rng):
    """The fused kernel composes with vmap (pair-sweep batching)."""
    from functools import partial
    from scipy.spatial.transform import Rotation
    from pctpu.register.icp import icp_fixed_iters_banded_fused

    B, N = 2, 800
    srcs = rng.uniform(-20, 20, (B, N, 3)).astype(np.float32)
    gts, dsts = [], []
    for i in range(B):
        R = Rotation.from_rotvec(
            rng.uniform(-0.05, 0.05, 3)).as_matrix().astype(np.float32)
        t = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
        dsts.append(srcs[i] @ R.T + t)
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = R
        M[:3, 3] = t
        gts.append(M)
    m = jnp.ones((B, N), bool)
    f = partial(icp_fixed_iters_banded_fused, iters=20, dist_thresh=5.0,
                block=256, window_blocks=2, query_tile=256, interpret=True)
    out = np.asarray(jax.vmap(lambda s, sm, d, dm: f(s, sm, d, dm))(
        jnp.asarray(srcs), m, jnp.asarray(np.stack(dsts)), m))
    for i in range(B):
        assert np.abs(out[i] - gts[i]).max() < 0.05


def test_fps_pallas_matches_xla(rng):
    """In-kernel greedy FPS == the XLA-loop fps, bit-for-bit (tie-breaking,
    mask, near-origin skip)."""
    from pctpu.ops.fps import fps
    from pctpu.ops.pallas_fps import fps_pallas

    for n, m in ((512, 64), (1024, 256)):
        pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
        mask = jnp.asarray(rng.random(n) > 0.15)
        a = np.asarray(fps(pts, m, mask=mask))
        b = np.asarray(fps_pallas(pts, m, mask=mask, interpret=True))
        np.testing.assert_array_equal(a, b)
        a = np.asarray(fps(pts, m, skip_near_origin=True))
        b = np.asarray(fps_pallas(pts, m, skip_near_origin=True,
                                  interpret=True))
        np.testing.assert_array_equal(a, b)


def test_fps_pallas_batched_vmaps(rng):
    from pctpu.ops.pallas_fps import fps_pallas_batched
    from pctpu.ops.fps import fps_batched

    pts = jnp.asarray(rng.uniform(-1, 1, (3, 256, 3)).astype(np.float32))
    a = np.asarray(fps_batched(pts, 32))
    b = np.asarray(fps_pallas_batched(pts, 32, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_icp_banded_fused_v2_matches_v1(rng):
    """The in-kernel-transform variant must agree with the reference fused
    path (same association + moment semantics, pose via SMEM scalars)."""
    from pctpu.register.icp import (icp_fixed_iters_banded_fused,
                                    icp_fixed_iters_banded_fused_v2)
    n = 2048
    src = rng.uniform(-15, 15, (n, 3)).astype(np.float32)
    ang = 0.06
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    dst = (src @ R.T + np.array([0.3, -0.2, 0.1], np.float32))
    m = jnp.ones((n,), bool)
    kw = dict(iters=12, block=512, window_blocks=2, query_tile=256,
              interpret=True)
    T1 = np.asarray(icp_fixed_iters_banded_fused(
        jnp.asarray(src), m, jnp.asarray(dst), m, **kw))
    T2 = np.asarray(icp_fixed_iters_banded_fused_v2(
        jnp.asarray(src), m, jnp.asarray(dst), m, **kw))
    np.testing.assert_allclose(T2, T1, atol=1e-4)


def test_ball_group_pallas_matches_composition(rng):
    """Fused ball-query+group == ball_query + group_points + rel-xyz,
    forward AND gradients (selection constant, like the reference
    autograd layer)."""
    from pctpu.ops.ball_query import ball_query
    from pctpu.ops.pallas_ballgroup import ball_group_pallas

    n, m, K, C = 512, 64, 16, 5
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, C)).astype(np.float32)
    packed = jnp.asarray(np.hstack([pts, feats]).astype(np.float32))
    centers = jnp.asarray(pts[rng.choice(n, m, replace=False)])
    r = 0.4
    idx, _ = ball_query(centers, jnp.asarray(pts), r, K)

    ours = np.asarray(ball_group_pallas(centers, packed, r, K, 32, True,
                                        True))
    ref = np.asarray(packed)[np.asarray(idx)]
    ref[..., :3] -= np.asarray(centers)[:, None, :]
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    def ref_fn(c, p):
        g = jnp.take(p, idx, axis=0)
        g = g.at[..., :3].add(-c[:, None, :])
        return jnp.sum(jnp.sin(g))

    def our_fn(c, p):
        return jnp.sum(jnp.sin(
            ball_group_pallas(c, p, r, K, 32, True, True)))

    gc1, gp1 = jax.grad(ref_fn, argnums=(0, 1))(centers, packed)
    gc2, gp2 = jax.grad(our_fn, argnums=(0, 1))(centers, packed)
    np.testing.assert_allclose(np.asarray(gc2), np.asarray(gc1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp2), np.asarray(gp1), atol=1e-5)


def test_ball_group_pallas_vmaps(rng):
    from pctpu.ops.ball_query import ball_query
    from pctpu.ops.pallas_ballgroup import ball_group_pallas_batched
    from pctpu.ops.gather import group_points

    B, n, m, K = 2, 256, 32, 8
    pts = rng.uniform(-1, 1, (B, n, 3)).astype(np.float32)
    centers = pts[:, :m]
    r = 0.5
    ours = np.asarray(ball_group_pallas_batched(
        jnp.asarray(centers), jnp.asarray(pts), r, K, tile=32,
        interpret=True))
    idx = jax.vmap(lambda c, p: ball_query(c, p, r, K)[0])(
        jnp.asarray(centers), jnp.asarray(pts))
    ref = np.asarray(group_points(jnp.asarray(pts), idx)).copy()
    ref -= centers[:, :, None, :]
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_icp_mega_scalar_procrustes_matches_svd(rng):
    """The mega kernel's scalar-register Procrustes epilogue
    (`pallas_icp_mega._s_procrustes_from_moments`) == the array-path
    `procrustes_from_moments` == an f64 SVD oracle, on random weighted
    correspondence moment matrices (incl. reflection-prone near-planar
    sets). The scalar functions are plain jnp-scalar tuples, so they run
    outside Pallas unchanged."""
    from scipy.spatial.transform import Rotation
    from pctpu.ops.pallas_icp_mega import _s_procrustes_from_moments
    from pctpu.register.procrustes import procrustes_from_moments

    for i in range(20):
        n = 64
        p = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
        if i % 4 == 0:
            p[:, 2] *= 1e-3  # near-planar: reflection-prone H
        Rg = Rotation.random(random_state=i).as_matrix().astype(np.float32)
        q = p @ Rg.T + rng.uniform(-1, 1, 3).astype(np.float32)
        w = (rng.random(n) > 0.2).astype(np.float32)
        hp = np.concatenate([p, np.ones((n, 1), np.float32)], 1) * w[:, None]
        hq = np.concatenate([q, np.ones((n, 1), np.float32)], 1)
        M = (hp.T @ hq).astype(np.float32)

        m = tuple(tuple(jnp.float32(M[a, b]) for b in range(4))
                  for a in range(4))
        Rs, ts = _s_procrustes_from_moments(m)
        R1 = np.array([[float(Rs[a][b]) for b in range(3)]
                       for a in range(3)])
        t1 = np.array([float(ts[a]) for a in range(3)])

        R2, t2 = procrustes_from_moments(jnp.asarray(M), solver="polar")
        np.testing.assert_allclose(R1, np.asarray(R2), atol=1e-5)
        np.testing.assert_allclose(t1, np.asarray(t2), atol=1e-4)
        # oracle: weighted Kabsch via f64 SVD
        sw = w.sum()
        pc = (p * w[:, None]).sum(0) / sw
        qc = (q * w[:, None]).sum(0) / sw
        H = ((q - qc) * w[:, None]).T @ (p - pc)
        U, _, Vt = np.linalg.svd(H.astype(np.float64))
        d = np.linalg.det(U @ Vt)
        Ro = U @ np.diag([1.0, 1.0, d]) @ Vt
        assert np.abs(R1 - Ro).max() < 1e-3, (i, np.abs(R1 - Ro).max())


def test_icp_mega_recovers_transform(rng):
    """Whole-loop mega kernel (interpret mode): recovers a known rigid
    transform on a banded window schedule + exact polish, matching the
    hybrid the bench runs (`register.icp.icp_fixed_iters_banded_mega`)."""
    from pctpu.register.icp import icp_fixed_iters_banded_mega

    n = 2048
    src = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    ang = 0.05
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = np.array([0.4, -0.2, 0.1], np.float32)
    dst = src @ R.T + t
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    m = jnp.ones((n,), bool)
    T = np.asarray(icp_fixed_iters_banded_mega(
        jnp.asarray(src), m, jnp.asarray(dst), m, coarse_iters=10,
        polish_iters=3, dist_thresh=5.0, block=256, window_blocks=2,
        query_tile=256, interpret=True))
    assert np.abs(T - T_gt).max() < 1e-3


def test_icp_mega_exact_window_matches_plain_icp(rng):
    """Mega kernel with the window spanning the whole db (exact brute
    association) == the XLA `icp_fixed_iters` on the same schedule —
    same associations, solves agree to f32 tolerance."""
    from pctpu.register.icp import icp_fixed_iters, icp_fixed_iters_banded_mega

    n = 1024
    src = rng.uniform(-15, 15, (n, 3)).astype(np.float32)
    ang = 0.04
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    dst = src @ R.T + np.array([0.2, 0.1, -0.3], np.float32)
    m = jnp.ones((n,), bool)
    T1 = np.asarray(icp_fixed_iters(
        jnp.asarray(src), m, jnp.asarray(dst), m, iters=8,
        dist_thresh=5.0, query_chunk=512))
    T2 = np.asarray(icp_fixed_iters_banded_mega(
        jnp.asarray(src), m, jnp.asarray(dst), m, coarse_iters=0,
        polish_iters=8, dist_thresh=5.0, block=256, window_blocks=4,
        query_tile=256, interpret=True))
    np.testing.assert_allclose(T2, T1, atol=5e-4)


def test_icp_mega_masked_pad(rng):
    """Padded/masked source and db points never contaminate the solve."""
    from pctpu.register.icp import icp_fixed_iters_banded_mega

    n = 768
    src = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    ang = 0.03
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t = np.array([0.1, 0.3, -0.2], np.float32)
    dst = src @ R.T + t
    # poison the masked-out tail with garbage
    src_m = np.concatenate([src, np.full((256, 3), 1e3, np.float32)])
    dst_m = np.concatenate([dst, np.full((256, 3), -1e3, np.float32)])
    mask = jnp.asarray(np.arange(n + 256) < n)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    T = np.asarray(icp_fixed_iters_banded_mega(
        jnp.asarray(src_m), mask, jnp.asarray(dst_m), mask,
        coarse_iters=8, polish_iters=2, dist_thresh=5.0, block=256,
        window_blocks=2, query_tile=256, interpret=True))
    assert np.abs(T - T_gt).max() < 1e-3


def test_icp_mega_rotated_init(rng):
    """Regression: with a large-rotation init (the RANSAC global-pose
    use in `register.pipeline`), source tiles must be ordered by the
    INIT-TRANSFORMED band-axis coordinate — the pre-transform ordering
    left tiles non-contiguous along the db axis and the banded window
    diverged (observed RTE 6.4 m from a 0.7 m-accurate init)."""
    from scipy.spatial.transform import Rotation
    from pctpu.register.icp import icp_fixed_iters_banded_mega

    n = 2048
    src = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    R = Rotation.from_euler("xyz", [5, -3, 35], degrees=True
                            ).as_matrix().astype(np.float32)
    t = np.array([3.0, -2.0, 0.5], np.float32)
    dst = src @ R.T + t
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    # imperfect init: the true pose composed with a small extra wiggle
    dR = Rotation.from_rotvec([0.02, -0.015, 0.03]).as_matrix().astype(
        np.float32)
    init = np.eye(4, dtype=np.float32)
    init[:3, :3] = dR @ R
    init[:3, 3] = t + np.array([0.4, -0.3, 0.2], np.float32)
    m = jnp.ones((n,), bool)
    T = np.asarray(icp_fixed_iters_banded_mega(
        jnp.asarray(src), m, jnp.asarray(dst), m,
        init_T=jnp.asarray(init), coarse_iters=12, polish_iters=3,
        dist_thresh=5.0, block=256, window_blocks=1, query_tile=256,
        interpret=True))
    assert np.abs(T - T_gt).max() < 1e-3
