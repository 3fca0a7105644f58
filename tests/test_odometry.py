"""Odometry/SLAM pipeline on a synthetic loop trajectory."""
import numpy as np
import pytest

from pctpu.pipelines.odometry import OdometryConfig, ate, run_odometry


def make_world(rng, n=6000):
    """A structured world: ground + scattered pillars/walls."""
    pts = []
    g = np.zeros((n // 2, 3), np.float32)
    g[:, :2] = rng.uniform(-30, 30, (n // 2, 2))
    g[:, 2] = rng.normal(scale=0.02, size=n // 2)
    pts.append(g)
    for _ in range(12):
        c = rng.uniform(-25, 25, 2)
        m = n // 24
        pillar = np.zeros((m, 3), np.float32)
        ang = rng.uniform(0, 2 * np.pi, m)
        pillar[:, 0] = c[0] + 0.4 * np.cos(ang)
        pillar[:, 1] = c[1] + 0.4 * np.sin(ang)
        pillar[:, 2] = rng.uniform(0, 4, m)
        pts.append(pillar)
    return np.concatenate(pts).astype(np.float32)


def circular_trajectory(n_frames, radius=8.0):
    poses = []
    for i in range(n_frames):
        th = 2 * np.pi * i / n_frames
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(th), np.sin(th)
        T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        T[:3, 3] = [radius * np.cos(th), radius * np.sin(th), 0.0]
        poses.append(T)
    return np.stack(poses)


def render_scan(world, pose, rng, max_range=20.0, noise=0.01):
    """Transform world into the sensor frame and crop to range."""
    inv = np.linalg.inv(pose)
    local = world @ inv[:3, :3].T + inv[:3, 3]
    keep = np.linalg.norm(local[:, :2], axis=1) < max_range
    pts = local[keep]
    return (pts + rng.normal(scale=noise, size=pts.shape)).astype(np.float32)


@pytest.mark.slow
def test_odometry_closes_loop(rng):
    world = make_world(rng)
    gt = circular_trajectory(32, radius=6.0)  # ~1.2 m + 11 deg per frame
    scans = [render_scan(world, p, rng) for p in gt]
    cfg = OdometryConfig(voxel_leaf=0.4, icp_iters=25, icp_dist_thresh=3.0,
                         keyframe_every=4, closure_radius=6.0,
                         closure_min_gap=3, query_chunk=1024)
    out = run_odometry(scans, cfg)
    err_odo = ate(out["poses"], gt)
    err_opt = ate(out["poses_optimized"], gt)
    # the p2pl front end should track the circle tightly; the closure-
    # optimized trajectory must stay within the quality bound (graph
    # optimization redistributes error and may move ATE-to-GT slightly
    # either way when drift is already small)
    assert err_odo < 0.6, err_odo
    assert err_opt <= max(err_odo * 1.3, 0.45), (err_opt, err_odo)
    assert len(out["closures"]) >= 1  # the loop was detected


def figure_eight_trajectory(n_frames, radius=6.0):
    """1:2 Lissajous figure-eight (two crossing lobes), heading along the
    velocity — the crossing forces loop closures between temporally
    distant passes."""
    poses = []
    for i in range(n_frames):
        t = i / n_frames
        x = radius * np.sin(2 * np.pi * t)
        y = 0.5 * radius * np.sin(4 * np.pi * t)
        dx = radius * 2 * np.pi * np.cos(2 * np.pi * t)
        dy = 0.5 * radius * 4 * np.pi * np.cos(4 * np.pi * t)
        yaw = np.arctan2(dy, dx)
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(yaw), np.sin(yaw)
        T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        T[:3, 3] = [x, y, 0.0]
        poses.append(T)
    return np.stack(poses)


@pytest.mark.slow
def test_odometry_figure_eight_128(rng):
    """128-frame figure-eight, keyframe_every=1 -> 128 keyframes: the
    crossing produces >= 2 accepted loop closures between distant passes,
    the >100-keyframe graph exercises the block-sparse PCG backend, and
    the optimized ATE beats the raw chain within a
    trajectory-length-relative bound (VERDICT r4 item 8)."""
    world = make_world(rng, n=3000)
    gt = figure_eight_trajectory(128, radius=6.0)
    scans = [render_scan(world, p, rng, max_range=12.0) for p in gt]
    # path length of the 1:2 Lissajous at r=6: ~31 m
    seg = np.diff(gt[:, :3, 3], axis=0)
    path_len = float(np.linalg.norm(seg, axis=1).sum())
    cfg = OdometryConfig(voxel_leaf=0.5, icp_iters=15, icp_dist_thresh=3.0,
                         keyframe_every=1, closure_radius=2.0,
                         closure_min_gap=24, query_chunk=1024,
                         closure_reg_capacity=1024)
    out = run_odometry(scans, cfg)
    err_odo = ate(out["poses"], gt)
    err_opt = ate(out["poses_optimized"], gt)
    assert len(out["keyframes"]) > 100          # sparse-PCG path engaged
    assert len(out["closures"]) >= 2, (out["closures"],
                                       out["closures_rejected"])
    # both passes of the crossing must be stitched: closures span the
    # temporal gap, not just adjacent keyframes
    assert max(b - a for a, b in out["closures"]) >= 24
    assert err_opt <= max(err_odo, 0.02 * path_len), (err_opt, err_odo)
    assert err_opt < 0.02 * path_len, (err_opt, path_len)


def test_odometry_checkpoint_resume(tmp_path, rng):
    from pctpu.pipelines.odometry import save_odometry_state
    world = make_world(rng, n=2000)
    gt = circular_trajectory(8, radius=4.0)
    scans = [render_scan(world, p, rng, max_range=15.0) for p in gt]
    cfg = OdometryConfig(voxel_leaf=0.5, icp_iters=10, icp_dist_thresh=3.0,
                         keyframe_every=3, query_chunk=512)
    ckpt = str(tmp_path / "odo.npz")
    full = run_odometry(scans, cfg, checkpoint_path=ckpt, checkpoint_every=2)
    # simulate a crash after frame 4: truncate the state and resume
    poses = [p for p in full["poses"][:5]]
    deltas = [np.eye(4, dtype=np.float32)] + [
        np.linalg.inv(full["poses"][i - 1]) @ full["poses"][i]
        for i in range(1, 5)]
    save_odometry_state(ckpt, 4, poses,
                        [d.astype(np.float32) for d in deltas])
    resumed = run_odometry(scans, cfg, checkpoint_path=ckpt)
    np.testing.assert_allclose(resumed["poses"][:5], full["poses"][:5],
                               atol=1e-5)
    assert resumed["poses"].shape == full["poses"].shape


@pytest.mark.slow
@pytest.mark.parametrize("submap_frames", [1, 3])
def test_scan_frontend_matches_host(submap_frames):
    """The device-resident lax.scan front end produces the same deltas as
    the per-frame host loop (same jitted ICP, same priors) — for both
    scan-to-scan and scan-to-submap (rolling K-frame target) modes."""
    rng = np.random.default_rng(7)
    world = make_world(rng, n=3000)
    gt = circular_trajectory(8, radius=6.0)
    scans = [render_scan(world, p, rng) for p in gt]
    cfg_h = OdometryConfig(voxel_leaf=0.5, icp_iters=15,
                           icp_dist_thresh=3.0, keyframe_every=4,
                           query_chunk=1024, frontend="host",
                           submap_frames=submap_frames)
    cfg_s = OdometryConfig(voxel_leaf=0.5, icp_iters=15,
                           icp_dist_thresh=3.0, keyframe_every=4,
                           query_chunk=1024, frontend="scan",
                           submap_frames=submap_frames)
    out_h = run_odometry(scans, cfg_h)
    out_s = run_odometry(scans, cfg_s)
    # atol 2e-2: the two paths maintain the submap buffer differently
    # (incremental transform vs rebuilt-from-poses) — float-identical
    # associations are not guaranteed, only the same trajectory
    np.testing.assert_allclose(out_s["poses"], out_h["poses"], atol=2e-2)


def test_compose_deltas_matches_chain():
    from pctpu.pipelines.odometry import compose_deltas
    from scipy.spatial.transform import Rotation
    rng = np.random.default_rng(3)
    F = 9
    deltas = []
    for i in range(F):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rotation.random(random_state=i).as_matrix()
        T[:3, 3] = rng.normal(size=3)
        deltas.append(T)
    out = np.asarray(compose_deltas(np.stack(deltas)))
    acc = np.eye(4, dtype=np.float32)
    for i in range(F):
        acc = (acc @ deltas[i]).astype(np.float32)
        np.testing.assert_allclose(out[i], acc, atol=1e-4)
