import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pctpu.core import se3
from pctpu.core.cloud import PointCloud
from pctpu import register


def make_pair(rng, n=1000, angle_deg=10.0, trans=1.0, noise=0.0):
    src = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    R = Rotation.from_rotvec(
        np.radians(angle_deg) * axis).as_matrix().astype(np.float32)
    t = (rng.normal(size=3) * trans).astype(np.float32)
    dst = src @ R.T + t
    if noise:
        dst = dst + rng.normal(scale=noise, size=dst.shape).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return src, dst, T


def test_weighted_procrustes_exact(rng):
    src, dst, T = make_pair(rng, n=200)
    R, t = register.weighted_procrustes(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=1e-4)


def test_weighted_procrustes_weights_ignore_outliers(rng):
    src, dst, T = make_pair(rng, n=200)
    dst_bad = dst.copy()
    dst_bad[:50] += 100.0  # gross outliers
    w = np.ones(200, np.float32)
    w[:50] = 0.0
    R, t = register.weighted_procrustes(
        jnp.asarray(src), jnp.asarray(dst_bad), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=1e-3)


def test_procrustes_no_reflection(rng):
    # degenerate: planar points with mirrored target tempts reflection
    src = rng.normal(size=(100, 3)).astype(np.float32)
    src[:, 2] = 0
    dst = src.copy()
    dst[:, 0] = -dst[:, 0]
    R, t = register.weighted_procrustes(jnp.asarray(src), jnp.asarray(dst))
    assert np.linalg.det(np.asarray(R)) > 0.99


def _cloud(x):
    return PointCloud.from_numpy(x)


def test_icp_point_to_point_converges(rng):
    src, dst, T_gt = make_pair(rng, n=2000, angle_deg=8, trans=0.5)
    ps, pd = _cloud(src), _cloud(dst)
    res = register.icp_point_to_point(
        ps.points, ps.mask, pd.points, pd.mask,
        cfg=register.ICPConfig(max_iters=50, dist_thresh=5.0,
                               query_chunk=512))
    rte, rre = se3.pose_diff_rte_rre(res.T, jnp.asarray(T_gt))
    assert float(rte) < 0.05
    assert float(rre) < 0.5
    assert bool(res.converged)
    assert int(res.iters) < 50


def test_icp_point_to_plane_converges(rng):
    # smooth surface: z = 0.05 x + 0.1 y plane-ish, well-conditioned for p2l
    n = 2000
    src = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    src[:, 2] = 0.05 * src[:, 0] + 0.1 * src[:, 1] + rng.normal(scale=0.3, size=n)
    R = Rotation.from_rotvec([0.02, 0.03, 0.05]).as_matrix().astype(np.float32)
    t = np.array([0.2, -0.1, 0.15], np.float32)
    dst = src @ R.T + t
    normals = np.asarray(jax.jit(
        lambda p: __import__("pctpu").ops.estimate_normals(p, k=8))(
            jnp.asarray(dst)))
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    ps, pd = _cloud(src), _cloud(dst)
    res = register.icp_point_to_plane(
        ps.points, ps.mask, pd.points, jnp.asarray(
            np.pad(normals, ((0, pd.capacity - n), (0, 0)), mode="edge")),
        pd.mask,
        cfg=register.ICPConfig(max_iters=50, dist_thresh=5.0, query_chunk=512))
    rte, rre = se3.pose_diff_rte_rre(res.T, jnp.asarray(T_gt))
    assert float(rte) < 0.05
    assert float(rre) < 1.0


def test_icp_respects_masks(rng):
    src, dst, T_gt = make_pair(rng, n=900, angle_deg=5, trans=0.3)
    # pad dst with garbage beyond the mask — must not affect the solution
    pd = PointCloud.from_numpy(dst)
    garbage = np.asarray(pd.points).copy()
    garbage[900:] = 1e3
    pd = PointCloud(jnp.asarray(garbage), pd.mask)
    ps = _cloud(src)
    res = register.icp_point_to_point(
        ps.points, ps.mask, pd.points, pd.mask,
        cfg=register.ICPConfig(max_iters=50, query_chunk=512))
    rte, rre = se3.pose_diff_rte_rre(res.T, jnp.asarray(T_gt))
    assert float(rte) < 0.05 and float(rre) < 0.5


def test_icp_fixed_iters(rng):
    src, dst, T_gt = make_pair(rng, n=1000, angle_deg=6, trans=0.4)
    ps, pd = _cloud(src), _cloud(dst)
    T = register.icp_fixed_iters(ps.points, ps.mask, pd.points, pd.mask,
                                 iters=25, query_chunk=512)
    rte, rre = se3.pose_diff_rte_rre(T, jnp.asarray(T_gt))
    assert float(rte) < 0.05 and float(rre) < 0.5


def test_ransac_registration(rng):
    src, dst, T_gt = make_pair(rng, n=300, angle_deg=40, trans=5.0)
    # corrupt 60% of correspondences (feature mismatches)
    dst_corr = dst.copy()
    bad = rng.choice(300, 180, replace=False)
    dst_corr[bad] = rng.uniform(-20, 20, size=(180, 3))
    res = register.ransac_registration(
        jnp.asarray(src), jnp.asarray(dst_corr),
        key=jax.random.PRNGKey(0), dist_thresh=0.5, num_hypotheses=2048)
    rte, rre = se3.pose_diff_rte_rre(res.T, jnp.asarray(T_gt))
    assert float(rte) < 0.1
    assert float(rre) < 1.0
    assert int(res.inliers) >= 110


def test_ransac_adaptive_confidence_exit(rng):
    """Open3D (max_iteration, confidence) criterion parity
    (`Registration/main.py:83`): with a healthy inlier ratio the adaptive
    loop stops after ONE hypothesis batch; with the ratio forced to ~0 it
    runs to max_iterations. Result quality matches the fixed-batch path."""
    src, dst, T_gt = make_pair(rng, n=300, angle_deg=40, trans=5.0)
    dst_corr = dst.copy()
    bad = rng.choice(300, 180, replace=False)
    dst_corr[bad] = rng.uniform(-20, 20, size=(180, 3))
    res = register.ransac_registration_adaptive(
        jnp.asarray(src), jnp.asarray(dst_corr),
        key=jax.random.PRNGKey(0), dist_thresh=0.5,
        batch_hypotheses=2048, max_iterations=100000, confidence=0.999)
    rte, rre = se3.pose_diff_rte_rre(res.T, jnp.asarray(T_gt))
    assert float(rte) < 0.1 and float(rre) < 1.0
    # 40% inliers -> needed ~ log(.001)/log(1-.4^3) ~ 104 << 2048
    assert res.hypotheses_consumed == 2048

    # all-outlier correspondences: never reaches confidence, consumes the
    # full budget
    dst_junk = rng.uniform(-20, 20, size=dst.shape).astype(np.float32)
    res2 = register.ransac_registration_adaptive(
        jnp.asarray(src), jnp.asarray(dst_junk),
        key=jax.random.PRNGKey(1), dist_thresh=1e-6,
        batch_hypotheses=2048, max_iterations=8192, confidence=0.999)
    assert res2.hypotheses_consumed >= 8192


def test_evaluate_rt_files(tmp_path, rng):
    from pctpu.core import io as pio
    # build gt + pred files: 3 rows, one pred slightly off (success), one
    # grossly off (failure)
    rows_gt, rows_pred = [], []
    for i in range(3):
        _, _, T = make_pair(rng, n=10, angle_deg=20, trans=3.0)
        t = np.asarray(T[:3, 3])
        q = np.asarray(se3.rotmat_to_quat(jnp.asarray(T[:3, :3])))
        rows_gt.append((i, i + 1, t, q))
        if i == 2:
            rows_pred.append((i, i + 1, t + 10.0, q))  # failure
        else:
            rows_pred.append((i, i + 1, t + 0.01, q))  # success
    gt_p, pred_p = tmp_path / "gt.txt", tmp_path / "pred.txt"
    pio.write_reg_results(str(gt_p), rows_gt)
    pio.write_reg_results(str(pred_p), rows_pred)
    out = register.evaluate.evaluate_rt(str(gt_p), str(pred_p))
    assert out["n_success"] == 2
    assert out["success_rate"] == 2 / 4  # reference divides incl. header
    assert out["avg_rte"] < 0.1


def test_icp_fixed_iters_grid(rng):
    src, dst, T_gt = make_pair(rng, n=3000, angle_deg=6, trans=0.4)
    ps, pd = _cloud(src), _cloud(dst)
    T = register.icp_fixed_iters_grid(
        ps.points, ps.mask, pd.points, pd.mask, iters=25,
        dist_thresh=5.0, cell_size=2.0, cap_per_cell=64, query_chunk=512)
    rte, rre = se3.pose_diff_rte_rre(T, jnp.asarray(T_gt))
    assert float(rte) < 0.05 and float(rre) < 0.5



def test_rotation_polar3_matches_svd(rng):
    """Closed-form polar rotation factor == SVD-with-sign-correction on
    random well-conditioned and reflection-containing 3x3 matrices, incl.
    moment-matrix magnitudes (~1e5 entries, where an unnormalized f32
    eigensolve loses eigenvector accuracy)."""
    import jax.numpy as jnp
    from pctpu.register.procrustes import rotation_polar3

    for i in range(50):
        R = Rotation.random(random_state=i).as_matrix().astype(np.float32)
        s = np.diag(rng.uniform(0.5, 3.0, 3).astype(np.float32))
        if i % 3 == 0:
            s[2, 2] *= -1.0  # reflection case
        Q = Rotation.random(random_state=500 + i).as_matrix().astype(
            np.float32)
        scale = 1e5 if i % 2 else 1.0
        H = (R @ (Q @ s @ Q.T)) * scale
        Rp = np.asarray(rotation_polar3(jnp.asarray(H)))
        U, _, Vt = np.linalg.svd(H.astype(np.float64))
        d = np.linalg.det(U @ Vt)
        Rsvd = U @ np.diag([1.0, 1.0, d]) @ Vt
        assert np.abs(Rp - Rsvd).max() < 1e-3, (i, np.abs(Rp - Rsvd).max())
        assert abs(np.linalg.det(Rp) - 1.0) < 1e-4


def test_procrustes_degenerate_guards(rng):
    """r4 advisor (high): rank-deficient inputs must return a valid
    rotation — identity for rank<2 (zero weights, collinear inliers),
    the rank-2 closed form for planar — never a zero/NaN matrix that
    would compose a singular transform into an ICP pose chain."""
    from pctpu.register.procrustes import weighted_procrustes

    src = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    # all-zero weights (empty association iteration)
    R, t = weighted_procrustes(src, src + 1.0, jnp.zeros((32,)))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)
    # collinear correspondences (rank-1 cross-covariance)
    line = jnp.asarray(
        (np.arange(16)[:, None] * np.array([1.0, 0, 0])).astype(np.float32))
    R, t = weighted_procrustes(line, line + jnp.asarray([0.0, 1.0, 0.0]),
                               jnp.ones((16,)))
    assert np.all(np.isfinite(np.asarray(R)))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-5)
    # planar (rank-2) still solves the in-plane rotation exactly
    P = rng.normal(size=(64, 3)).astype(np.float32)
    P[:, 2] = 0.0
    th = 0.7
    Rgt = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    Q = P @ Rgt.T + np.array([1, 2, 3], np.float32)
    R, t = weighted_procrustes(jnp.asarray(P), jnp.asarray(Q),
                               jnp.ones((64,)))
    assert np.abs(np.asarray(R) - Rgt).max() < 1e-5
    assert np.abs(np.asarray(t) - [1, 2, 3]).max() < 1e-4


def test_trimmed_icp_weights():
    """_trim_weights keeps exactly the best `trim` fraction of the valid
    associations and honors the anneal gate."""
    from pctpu.register.icp import _trim_weights
    d2 = jnp.asarray(np.array([0.1, 0.5, 0.2, 0.9, 0.4, 1e30], np.float32))
    w = jnp.asarray(np.array([1, 1, 1, 1, 1, 0], np.float32))
    wt = np.asarray(_trim_weights(w, d2, 0.6))
    # 5 valid, trim 0.6 -> keep the 3 smallest distances (0.1, 0.2, 0.4)
    np.testing.assert_array_equal(wt, [1, 0, 1, 0, 1, 0])
    # inactive anneal gate leaves weights untouched
    w0 = np.asarray(_trim_weights(w, d2, 0.6, active=jnp.bool_(False)))
    np.testing.assert_array_equal(w0, np.asarray(w))
    # trim=1.0 is the identity
    np.testing.assert_array_equal(np.asarray(_trim_weights(w, d2, 1.0)),
                                  np.asarray(w))


def test_ransac_batch_matches_single(rng):
    """Batch-native RANSAC row b == the single-pair path on (inputs,
    key) b (same sampling stream, same scoring)."""
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    srcs, dsts, valids = [], [], []
    for i in range(3):
        src, dst, _ = make_pair(rng, n=256, angle_deg=25 + 5 * i, trans=3.0)
        bad = rng.choice(256, 100, replace=False)
        dst = dst.copy()
        dst[bad] = rng.uniform(-20, 20, size=(100, 3))
        srcs.append(src)
        dsts.append(dst)
        valids.append(np.ones(256, bool))
    out = register.ransac_registration_batch(
        jnp.asarray(np.stack(srcs)), jnp.asarray(np.stack(dsts)),
        jnp.asarray(np.stack(valids)), keys, dist_thresh=0.5,
        num_hypotheses=1024)
    for i in range(3):
        one = register.ransac_registration(
            jnp.asarray(srcs[i]), jnp.asarray(dsts[i]),
            corr_valid=jnp.asarray(valids[i]), key=keys[i],
            dist_thresh=0.5, num_hypotheses=1024)
        np.testing.assert_allclose(np.asarray(out.T[i]), np.asarray(one.T),
                                   atol=1e-4)
        assert int(out.inliers[i]) == int(one.inliers)


def test_refine_exact_mega_matches_xla(rng):
    """The one-launch mega exact refine == the per-iteration XLA/Pallas
    refine path on the same strided subsample (r5: the batched pipeline's
    full-res polish)."""
    import jax
    from pctpu.core.cloud import PointCloud
    from pctpu.register.pipeline import (RegistrationConfig,
                                         _refine_exact_batch)
    from pctpu.register.icp import icp_refine_exact_mega_batch
    from scipy.spatial.transform import Rotation

    b, n = 2, 1024
    base = rng.uniform(-20, 20, (b, n, 3)).astype(np.float32)
    Ts = []
    dsts = []
    for i in range(b):
        R = Rotation.from_rotvec(rng.normal(scale=0.02, size=3)).as_matrix()
        t = rng.normal(scale=0.1, size=3)
        dsts.append((base[i] @ R.T + t).astype(np.float32))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, t
        Ts.append(T)
    src = PointCloud(points=jnp.asarray(base), mask=jnp.ones((b, n), bool))
    dst = PointCloud(points=jnp.asarray(np.stack(dsts)),
                     mask=jnp.ones((b, n), bool))
    T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    cfg = RegistrationConfig(icp_refine_iters=2, refine_subsample=512,
                             icp_dist_thresh=5.0)
    stride = max(1, n // cfg.refine_subsample)
    q = src.points[:, ::stride][:, :cfg.refine_subsample]
    qm = src.mask[:, ::stride][:, :cfg.refine_subsample]
    mega = np.asarray(icp_refine_exact_mega_batch(
        q, qm, dst.points, dst.mask, T0, iters=2,
        dist_thresh=cfg.icp_dist_thresh, block=512, query_tile=128,
        interpret=True))
    ref = np.asarray(_refine_exact_batch(T0, src, dst, cfg, backend="xla"))
    # both must land on (approximately) the ground-truth transform
    for i in range(b):
        np.testing.assert_allclose(mega[i], np.asarray(Ts[i]), atol=5e-2)
        np.testing.assert_allclose(mega[i], ref[i], atol=5e-2)
