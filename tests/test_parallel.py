"""Multi-device tests on the 8-CPU-device mesh (SURVEY.md §4: the
distributed tests the reference lacks entirely)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pctpu.core import se3
from pctpu import parallel


def require_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def make_pair(rng, n=512, angle=6.0, trans=0.4, seed_extra=0):
    src = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    R = Rotation.from_rotvec(np.radians(angle) * axis).as_matrix().astype(np.float32)
    t = (rng.normal(size=3) * trans).astype(np.float32)
    dst = src @ R.T + t
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return src, dst, T


def test_make_mesh_shapes():
    require_8()
    mesh = parallel.make_mesh((("pair", 4), ("point", 2)))
    assert mesh.devices.shape == (4, 2)
    mesh2 = parallel.make_mesh((("data", -1),))
    assert mesh2.devices.size == len(jax.devices())


@pytest.mark.slow
def test_pair_sweep_8_pairs():
    require_8()
    rng = np.random.default_rng(0)
    mesh = parallel.make_mesh((("data", 8),))
    srcs, dsts, gts = [], [], []
    for i in range(8):
        s, d, T = make_pair(rng, n=512)
        srcs.append(s)
        dsts.append(d)
        gts.append(T)
    src = jnp.asarray(np.stack(srcs))
    dst = jnp.asarray(np.stack(dsts))
    mask = jnp.ones((8, 512), bool)
    sweep = parallel.make_pair_sweep(mesh, iters=20, query_chunk=512,
                                     backend="xla")
    with mesh:
        Ts = sweep(src, mask, dst, mask)
    for b in range(8):
        rte, rre = se3.pose_diff_rte_rre(Ts[b], jnp.asarray(gts[b]))
        assert float(rte) < 0.05 and float(rre) < 0.5


@pytest.mark.slow
def test_full_pipeline_sweep_matches_batched():
    """Pair-sharded FULL registration pipeline (voxel -> FPFH -> RANSAC ->
    ICP via shard_map) == the single-device batched `register_pairs` on
    the same inputs, and every recovered pose passes the reference gate —
    BASELINE's "registration pairs/s scaling efficiency" north star for
    the full chain, not ICP-only."""
    require_8()
    from pctpu.core.cloud import PointCloud
    from pctpu.register.pipeline import RegistrationConfig, register_pairs

    from tests.test_pipeline import make_structured_scene

    rng = np.random.default_rng(3)
    b = 8
    src_np = make_structured_scene(rng, n=2000)
    n = src_np.shape[0]
    srcs, dsts, gts = [], [], []
    for i in range(b):
        angle = np.radians(10.0 + 3.0 * i)
        R = Rotation.from_rotvec([0, 0, angle]).as_matrix().astype(np.float32)
        t = np.array([2.0 + 0.3 * i, -1.0, 0.1 * i], np.float32)
        dst_np = (src_np @ R.T + t + rng.normal(
            scale=0.02, size=src_np.shape)).astype(np.float32)
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, :3] = R
        T_gt[:3, 3] = t
        srcs.append(src_np)
        dsts.append(dst_np)
        gts.append(T_gt)
    sp = PointCloud(points=jnp.asarray(np.stack(srcs)),
                    mask=jnp.ones((b, n), bool))
    dp = PointCloud(points=jnp.asarray(np.stack(dsts)),
                    mask=jnp.ones((b, n), bool))
    keys = jax.random.split(jax.random.PRNGKey(11), b)
    cfg = RegistrationConfig(voxel_size=1.0, feature_radius=5.0,
                             ransac_dist=1.5, ransac_hypotheses=2048,
                             icp_dist_thresh=2.0, icp_query_chunk=1024,
                             downsample_capacity=1024)
    mesh = parallel.make_mesh((("data", 8),))
    sweep = parallel.make_full_pipeline_sweep(mesh, cfg=cfg)
    with mesh:
        out_sh = sweep(sp, dp, keys)
    out_ref = register_pairs(sp, dp, keys=keys, cfg=cfg)
    np.testing.assert_allclose(np.asarray(out_sh.T), np.asarray(out_ref.T),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out_sh.num_matches),
                                  np.asarray(out_ref.num_matches))
    for i in range(b):
        # every sharded pair clears the reference gate (evaluate_rt.py:16-18)
        rte, rre = se3.pose_diff_rte_rre(out_sh.T[i], jnp.asarray(gts[i]))
        assert float(rte) < 2.0 and float(rre) < 5.0, (i, rte, rre)


@pytest.mark.slow
def test_point_sharded_icp_matches_single_device():
    require_8()
    rng = np.random.default_rng(1)
    mesh = parallel.make_mesh((("point", 8),))
    src, dst, T_gt = make_pair(rng, n=2048, angle=8, trans=0.5)
    f = parallel.make_point_sharded_icp(mesh, iters=25, query_chunk=256)
    with mesh:
        T = f(jnp.asarray(src), jnp.ones((2048,), bool),
              jnp.asarray(dst), jnp.ones((2048,), bool))
    rte, rre = se3.pose_diff_rte_rre(T, jnp.asarray(T_gt))
    assert float(rte) < 0.05 and float(rre) < 0.5

    # must agree with the single-device fixed-iter ICP
    from pctpu.register.icp import icp_fixed_iters
    T1 = icp_fixed_iters(jnp.asarray(src), jnp.ones((2048,), bool),
                         jnp.asarray(dst), jnp.ones((2048,), bool),
                         iters=25, query_chunk=256, backend="xla")
    np.testing.assert_allclose(np.asarray(T), np.asarray(T1), atol=1e-3)


def _ring_graph(rng, m=12, noise_rot=0.03, noise_t=0.15):
    """Ground-truth poses on a loop; noisy odometry edges + loop closure."""
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(1, m):
        R = Rotation.from_rotvec(rng.normal(scale=0.3, size=3)).as_matrix()
        t = rng.normal(scale=1.0, size=3)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        gt.append((gt[-1] @ T).astype(np.float32))
    gt = np.stack(gt)

    edges_i, edges_j, T_meas = [], [], []
    def add_edge(i, j):
        rel = np.linalg.inv(gt[i]) @ gt[j]
        dR = Rotation.from_rotvec(rng.normal(scale=noise_rot, size=3)).as_matrix()
        noisy = rel.copy()
        noisy[:3, :3] = rel[:3, :3] @ dR
        noisy[:3, 3] += rng.normal(scale=noise_t, size=3)
        edges_i.append(i); edges_j.append(j); T_meas.append(noisy)
    for i in range(m - 1):
        add_edge(i, i + 1)
    add_edge(m - 1, 0)  # loop closure
    add_edge(0, m // 2)
    return gt, (np.array(edges_i), np.array(edges_j),
                np.stack(T_meas).astype(np.float32))


def test_pose_graph_reduces_error():
    rng = np.random.default_rng(2)
    gt, (ei, ej, Tm) = _ring_graph(rng)
    m = gt.shape[0]
    # init: integrate noisy odometry (drifts)
    init = [np.eye(4, dtype=np.float32)]
    for k in range(m - 1):
        init.append((init[-1] @ Tm[k]).astype(np.float32))
    init = np.stack(init)

    res = parallel.optimize_pose_graph(
        jnp.asarray(init), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(Tm), iters=10)
    opt = np.asarray(res.poses)

    def ate(poses):
        # align pose 0 then average translation error
        aligned = np.linalg.inv(poses[0])[None] @ poses
        gt_aligned = np.linalg.inv(gt[0])[None] @ gt
        return np.linalg.norm(aligned[:, :3, 3] - gt_aligned[:, :3, 3],
                              axis=1).mean()

    assert ate(opt) < ate(init) * 0.75
    assert ate(opt) < 0.3


@pytest.mark.slow
def test_sharded_pose_graph_matches_single():
    require_8()
    rng = np.random.default_rng(3)
    gt, (ei, ej, Tm) = _ring_graph(rng, m=9)
    # pad edges to multiple of 8 with weight-0 self-edges
    E = len(ei)
    pad = (-E) % 8
    ei_p = np.concatenate([ei, np.zeros(pad, ei.dtype)])
    ej_p = np.concatenate([ej, np.zeros(pad, ej.dtype)])
    Tm_p = np.concatenate([Tm, np.tile(np.eye(4, dtype=np.float32),
                                       (pad, 1, 1))])
    w_p = np.concatenate([np.ones(E, np.float32), np.zeros(pad, np.float32)])

    init = [np.eye(4, dtype=np.float32)]
    for k in range(gt.shape[0] - 1):
        init.append((init[-1] @ Tm[k]).astype(np.float32))
    init = jnp.asarray(np.stack(init))

    mesh = parallel.make_mesh((("data", 8),))
    step = parallel.make_sharded_pose_graph_step(mesh)
    Tm_inv = jax.vmap(se3.invert_transform)(jnp.asarray(Tm_p))
    with mesh:
        out = step(init, jnp.asarray(ei_p), jnp.asarray(ej_p), Tm_inv,
                   jnp.asarray(w_p))

    # one single-device GN step with identical inputs
    res1 = parallel.optimize_pose_graph(
        init, jnp.asarray(ei_p), jnp.asarray(ej_p), jnp.asarray(Tm_p),
        weights=jnp.asarray(w_p), iters=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(res1.poses),
                               atol=1e-3)


@pytest.mark.slow
def test_halo_nearest_matches_brute():
    """Both clouds sharded into spatial slabs over 8 devices; halo exchange
    recovers exact nearest neighbors for all but pathological queries."""
    require_8()
    rng = np.random.default_rng(5)
    mesh = parallel.make_mesh((("point", 8),))
    dst_np = rng.uniform(0, 100, size=(4096, 3)).astype(np.float32)
    src_np = (dst_np + rng.normal(scale=0.3, size=dst_np.shape)
              ).astype(np.float32)

    dst_s, dst_m = parallel.partition_by_axis(dst_np, 8)
    src_s, src_m = parallel.partition_by_axis(src_np, 8)
    f = parallel.make_halo_nearest(mesh, halo_width=128, query_chunk=512)
    with mesh:
        d2, idx = f(jnp.asarray(src_s), jnp.asarray(src_m),
                    jnp.asarray(dst_s), jnp.asarray(dst_m))
    d2 = np.asarray(d2)
    idx = np.asarray(idx)
    # oracle on the sorted/padded arrays
    ref = ((src_s[:, None, :] - dst_s[None, :, :]) ** 2).sum(-1)
    ref[:, ~dst_m] = np.inf
    ref_d = ref.min(1)
    ref_i = ref.argmin(1)
    valid = src_m
    # halo width 128 on jittered slab data: nearly all exact (distances
    # compare with atol: the |a|^2+|b|^2-2ab expansion loses ~1e-3 to f32
    # cancellation at coordinate scale 100)
    exact = (idx[valid] == ref_i[valid]) | np.isclose(
        d2[valid], ref_d[valid], atol=2e-2)
    assert exact.mean() > 0.99
    # reported indices consistent with reported distances
    dd = ((src_s - dst_s[idx]) ** 2).sum(-1)
    np.testing.assert_allclose(dd[valid], d2[valid], atol=2e-2)


def test_pose_graph_sparse_matches_dense():
    """Block-sparse PCG backend agrees with the dense 6Mx6M solve."""
    rng = np.random.default_rng(5)
    gt, (ei, ej, Tm) = _ring_graph(rng, m=10)
    init = [np.eye(4, dtype=np.float32)]
    for k in range(gt.shape[0] - 1):
        init.append((init[-1] @ Tm[k]).astype(np.float32))
    init = jnp.asarray(np.stack(init))
    dense = parallel.optimize_pose_graph(
        init, jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(Tm), iters=5)
    sparse = parallel.optimize_pose_graph_sparse(
        init, jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(Tm), iters=5,
        cg_iters=200)
    np.testing.assert_allclose(np.asarray(sparse.poses),
                               np.asarray(dense.poses), atol=1e-3)


@pytest.mark.slow
def test_pose_graph_sparse_m256():
    """256-pose graph (the scale the dense solver can't reach) converges."""
    rng = np.random.default_rng(6)
    gt, (ei, ej, Tm) = _ring_graph(rng, m=256, noise_rot=0.02, noise_t=0.10)
    init = [np.eye(4, dtype=np.float32)]
    for k in range(gt.shape[0] - 1):
        init.append((init[-1] @ Tm[k]).astype(np.float32))
    init = np.stack(init)

    res = parallel.optimize_pose_graph_sparse(
        jnp.asarray(init), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(Tm), iters=10, cg_iters=200)
    opt = np.asarray(res.poses)

    def ate(poses):
        aligned = np.linalg.inv(poses[0])[None] @ poses
        gt_aligned = np.linalg.inv(gt[0])[None] @ gt
        return np.linalg.norm(aligned[:, :3, 3] - gt_aligned[:, :3, 3],
                              axis=1).mean()

    assert ate(opt) < ate(init) * 0.5, (ate(opt), ate(init))


@pytest.mark.slow
def test_sharded_sparse_pose_graph_matches_single():
    """Edge-sharded block-sparse GN step == single-device step (M=64,
    strict — CG fully converges there), and at M=256 the sharded step's
    GN cost matches the single-device step's to 5% (f32 conditioning on a
    256-pose graph bounds absolute pose agreement; see posegraph.py notes
    and the README complexity table)."""
    require_8()
    from pctpu.parallel import posegraph as pg

    def keyframe_graph(rng, m, closure_every):
        gt, (ei, ej, Tm) = _ring_graph(rng, m=m, noise_rot=0.02,
                                       noise_t=0.10)
        exi, exj, exT = [list(x) for x in (ei, ej, Tm)]
        for i in range(0, m - closure_every, closure_every):
            rel = np.linalg.inv(gt[i]) @ gt[i + closure_every]
            exi.append(i)
            exj.append(i + closure_every)
            exT.append(rel.astype(np.float32))
        return gt, (np.array(exi), np.array(exj),
                    np.stack(exT).astype(np.float32))

    def pad_edges(ei, ej, Tm):
        E = len(ei)
        pad = (-E) % 8
        return (np.concatenate([ei, np.zeros(pad, ei.dtype)]),
                np.concatenate([ej, np.zeros(pad, ej.dtype)]),
                np.concatenate([Tm, np.tile(np.eye(4, dtype=np.float32),
                                            (pad, 1, 1))]),
                np.concatenate([np.ones(E, np.float32),
                                np.zeros(pad, np.float32)]))

    def odom_init(m, Tm):
        init = [np.eye(4, dtype=np.float32)]
        for k in range(m - 1):
            init.append((init[-1] @ Tm[k]).astype(np.float32))
        return jnp.asarray(np.stack(init))

    def edge_cost(poses, ei, ej, Tm, w):
        Tm_inv = jax.vmap(se3.invert_transform)(jnp.asarray(Tm))
        r, _, _ = pg._edge_terms(poses, jnp.asarray(ei), jnp.asarray(ej),
                                 Tm_inv, jnp.asarray(w))
        return float(jnp.sum(r * r))

    mesh = parallel.make_mesh((("data", 8),))

    # M=64: strict agreement (sharded == single == dense)
    rng = np.random.default_rng(7)
    gt, (ei, ej, Tm) = keyframe_graph(rng, 64, 8)
    ei_p, ej_p, Tm_p, w_p = pad_edges(ei, ej, Tm)
    init = odom_init(64, Tm)
    step = parallel.make_sharded_pose_graph_step_sparse(mesh, cg_iters=400)
    Tm_inv = jax.vmap(se3.invert_transform)(jnp.asarray(Tm_p))
    with mesh:
        out = step(init, jnp.asarray(ei_p), jnp.asarray(ej_p), Tm_inv,
                   jnp.asarray(w_p))
    res1 = parallel.optimize_pose_graph_sparse(
        init, jnp.asarray(ei_p), jnp.asarray(ej_p), jnp.asarray(Tm_p),
        weights=jnp.asarray(w_p), iters=1, cg_iters=400)
    np.testing.assert_allclose(np.asarray(out), np.asarray(res1.poses),
                               atol=2e-3)
    resd = parallel.optimize_pose_graph(
        init, jnp.asarray(ei_p), jnp.asarray(ej_p), jnp.asarray(Tm_p),
        weights=jnp.asarray(w_p), iters=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(resd.poses),
                               atol=2e-3)

    # M=256: STRICT solution agreement in the f64 backend (VERDICT r4
    # item 7 — f32 CG's cond(H)*eps floor capped this at cost-parity-5%;
    # the x64 path floors ~1e-9 lower so sharded == single-device holds
    # at pose level), plus the f32 cost-parity sanity check
    rng = np.random.default_rng(8)
    gt, (ei, ej, Tm) = keyframe_graph(rng, 256, 16)
    ei_p, ej_p, Tm_p, w_p = pad_edges(ei, ej, Tm)
    init = odom_init(256, Tm)
    with jax.enable_x64():
        step = parallel.make_sharded_pose_graph_step_sparse(mesh,
                                                            cg_iters=800)
        Tm_inv64 = jax.vmap(se3.invert_transform)(
            jnp.asarray(Tm_p, jnp.float64))
        with mesh:
            out64 = step(jnp.asarray(np.asarray(init), jnp.float64),
                         jnp.asarray(ei_p), jnp.asarray(ej_p), Tm_inv64,
                         jnp.asarray(w_p, jnp.float64))
        res64 = parallel.optimize_pose_graph_sparse(
            jnp.asarray(np.asarray(init), jnp.float64), jnp.asarray(ei_p),
            jnp.asarray(ej_p), jnp.asarray(Tm_p, jnp.float64),
            weights=jnp.asarray(w_p, jnp.float64), iters=1, cg_iters=800)
        out64_np = np.asarray(out64)
        res64_np = np.asarray(res64.poses)
    np.testing.assert_allclose(out64_np, res64_np, atol=1e-2)

    step = parallel.make_sharded_pose_graph_step_sparse(mesh, cg_iters=800)
    Tm_inv = jax.vmap(se3.invert_transform)(jnp.asarray(Tm_p))
    with mesh:
        out = step(init, jnp.asarray(ei_p), jnp.asarray(ej_p), Tm_inv,
                   jnp.asarray(w_p))
    res1 = parallel.optimize_pose_graph_sparse(
        init, jnp.asarray(ei_p), jnp.asarray(ej_p), jnp.asarray(Tm_p),
        weights=jnp.asarray(w_p), iters=1, cg_iters=800)
    c0 = edge_cost(init, ei_p, ej_p, Tm_p, w_p)
    c_sh = edge_cost(jnp.asarray(out), ei_p, ej_p, Tm_p, w_p)
    c_1 = edge_cost(res1.poses, ei_p, ej_p, Tm_p, w_p)
    assert c_sh < 0.5 * c0, (c_sh, c0)
    assert abs(c_sh - c_1) < 0.05 * c_1, (c_sh, c_1)
    # the f32 sharded step must also land near the f64 truth
    np.testing.assert_allclose(np.asarray(out), out64_np, atol=0.2)


@pytest.mark.slow
def test_pose_graph_sparse_m1024_drive():
    """1024-keyframe synthetic drive (real KITTI-trajectory scale,
    VERDICT r4 item 7) through the block-sparse backend: a drifting
    1024-pose loop with closure edges every 32 keyframes must come back
    to the ground truth — ATE improves >4x over the odometry chain, in
    BOTH the f64 backend and the f32+refine path."""
    rng = np.random.default_rng(10)
    m = 1024
    gt, (ei, ej, Tm) = _ring_graph(rng, m=m, noise_rot=0.004, noise_t=0.02)
    exi, exj, exT = [list(x) for x in (ei, ej, Tm)]
    for i in range(0, m - 32, 32):
        rel = np.linalg.inv(gt[i]) @ gt[i + 32]
        exi.append(i)
        exj.append(i + 32)
        exT.append(rel.astype(np.float32))
    ei, ej = np.array(exi, np.int32), np.array(exj, np.int32)
    Tm = np.stack(exT).astype(np.float32)

    init = [np.eye(4, dtype=np.float32)]
    for k in range(m - 1):
        init.append((init[-1] @ Tm[k]).astype(np.float32))
    init = np.stack(init)

    def ate(poses):
        aligned = np.linalg.inv(poses[0])[None] @ poses
        gt_aligned = np.linalg.inv(gt[0])[None] @ gt
        return np.linalg.norm(aligned[:, :3, 3] - gt_aligned[:, :3, 3],
                              axis=1).mean()

    a0 = ate(init)
    res64 = parallel.optimize_pose_graph_sparse_f64(
        init, ei, ej, Tm, iters=10, cg_iters=600)
    a64 = ate(np.asarray(res64.poses))
    assert a64 < 0.25 * a0, (a64, a0)

    res32 = parallel.optimize_pose_graph_sparse(
        jnp.asarray(init), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(Tm), iters=10, cg_iters=600)
    a32 = ate(np.asarray(res32.poses))
    assert a32 < 0.25 * a0, (a32, a0)


def test_batched_icp_mega_interpret():
    """The vmapped whole-loop mega sweep recovers every pair's transform
    (interpret mode, CPU) — the bench's pairs/s path."""
    from pctpu.parallel.pair_sweep import batched_icp_mega

    rng = np.random.default_rng(3)
    srcs, dsts, gts = [], [], []
    for i in range(3):
        s, d, T = make_pair(rng, n=512, angle=4)
        srcs.append(s)
        dsts.append(d)
        gts.append(T)
    src = jnp.asarray(np.stack(srcs))
    dst = jnp.asarray(np.stack(dsts))
    mask = jnp.ones((3, 512), bool)
    Ts = np.asarray(batched_icp_mega(
        src, mask, dst, mask, coarse_iters=12, polish_iters=3,
        dist_thresh=5.0, block=128, window_blocks=2, query_tile=128,
        interpret=True))
    for b in range(3):
        rte, rre = se3.pose_diff_rte_rre(
            jnp.asarray(Ts[b]), jnp.asarray(gts[b]))
        assert float(rte) < 0.05 and float(rre) < 0.5


def test_pose_graph_huber_rejects_bad_closure():
    """A single corrupted loop closure (wrong by meters) must not drag the
    robust (Huber IRLS) solution; the plain L2 solve IS dragged — the
    capability difference the robust kernel exists for."""
    rng = np.random.default_rng(9)
    gt, (ei, ej, Tm) = _ring_graph(rng, m=12, noise_rot=0.01, noise_t=0.05)
    m = gt.shape[0]
    # corrupt the 0 -> m/2 closure edge (last row) by a large bogus offset
    Tm_bad = Tm.copy()
    Tm_bad[-1][:3, 3] += np.array([8.0, -6.0, 3.0], np.float32)

    init = [np.eye(4, dtype=np.float32)]
    for k in range(m - 1):
        init.append((init[-1] @ Tm[k]).astype(np.float32))
    init = np.stack(init)

    def ate(poses):
        aligned = np.linalg.inv(poses[0])[None] @ poses
        gt_aligned = np.linalg.inv(gt[0])[None] @ gt
        return np.linalg.norm(aligned[:, :3, 3] - gt_aligned[:, :3, 3],
                              axis=1).mean()

    plain = parallel.optimize_pose_graph(
        jnp.asarray(init), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(Tm_bad), iters=10)
    robust = parallel.optimize_pose_graph(
        jnp.asarray(init), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(Tm_bad), iters=10, robust_delta=0.5)
    e_plain, e_rob = ate(np.asarray(plain.poses)), ate(np.asarray(robust.poses))
    assert e_rob < 0.3, e_rob
    assert e_rob < 0.5 * e_plain, (e_rob, e_plain)

    # sparse backend agrees with dense under the same robust kernel
    rob_sp = parallel.optimize_pose_graph_sparse(
        jnp.asarray(init), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(Tm_bad), iters=10, cg_iters=200, robust_delta=0.5)
    e_sp = ate(np.asarray(rob_sp.poses))
    assert abs(e_sp - e_rob) < 0.05, (e_sp, e_rob)
