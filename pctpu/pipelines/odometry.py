"""LiDAR odometry + pose-graph SLAM pipeline.

The BASELINE.json stretch config ("KITTI odometry LiDAR SLAM: scan-to-map
ICP + distributed pose-graph BA"): sequential scan-to-scan ICP with a
constant-velocity prior, keyframe selection, proximity loop closures
re-registered by ICP, and pose-graph Gauss-Newton over the keyframe graph
(`pctpu.parallel.posegraph` — whose edge-sharded variant distributes the
normal-equation reduction over the mesh).

Every ICP runs as one jitted program on fixed-capacity downsampled clouds,
so the whole sequence reuses two compiled executables (odometry + closure).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from pctpu.core.cloud import PointCloud, round_up
from pctpu.features.fpfh_dense import normals_radius_dense
from pctpu.ops.voxel import voxel_downsample
from pctpu.register.icp import icp_fixed_iters, icp_fixed_iters_p2pl
from pctpu.parallel.posegraph import (optimize_pose_graph,
                                      optimize_pose_graph_sparse)


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    voxel_leaf: float = 0.5
    icp_iters: int = 25
    icp_dist_thresh: float = 2.0
    keyframe_every: int = 5
    closure_radius: float = 5.0       # keyframe proximity for loop closure
    closure_min_gap: int = 3          # in keyframes
    # closure VALIDATION: accept a closure edge only if, at the ICP-refined
    # pose, at least this fraction of source points finds a target
    # neighbor within validation_dist (a drifted init can make closure ICP
    # converge to a wrong pose; one bad edge drags the whole graph)
    closure_min_fitness: float = 0.55
    closure_validation_dist: float = 0.5
    pose_graph_iters: int = 10
    # Geman-McClure IRLS scale for the graph solve (None = plain L2);
    # redescending influence suppresses any bad edge that slips through
    robust_delta: Optional[float] = 0.5
    # 'p2pl' (default): point-to-plane scan matching — on planar-dominated
    # scenes it converges far past point-to-point's partial-overlap bias
    # floor (measured 6x less drift on the synthetic loop). 'p2p' keeps
    # the reference-semantics point-to-point associations.
    method: str = "p2pl"
    # trimmed association (keep best fraction of in-threshold matches,
    # annealed on for the second half of the iterations): available for
    # partial-overlap edge-attraction bias; off by default — on the
    # synthetic loop it did not beat plain p2pl (r4 measurements)
    trim: float = 1.0
    closure_trim: float = 1.0
    query_chunk: int = 2048
    # 'scan'  = whole front end in one jitted lax.scan (one host
    #           round-trip per sequence; no mid-sequence checkpointing)
    # 'host'  = python loop, one jitted ICP per frame (restartable)
    # 'auto'  = scan unless checkpoint_path is given
    frontend: str = "auto"


def _prep(scan: np.ndarray, capacity: int, leaf: float) -> PointCloud:
    pc = PointCloud.from_numpy(scan, capacity=capacity)
    down = voxel_downsample(pc.points, pc.mask, leaf)
    return down


def save_odometry_state(path: str, i: int, poses, deltas) -> None:
    """Restartable front-end state (SURVEY.md §5.3: multi-host job
    restartability via checkpointed pose-graph state)."""
    np.savez(path, i=i, poses=np.stack(poses), deltas=np.stack(deltas))


def load_odometry_state(path: str):
    import os
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return (int(z["i"]), [p for p in z["poses"].astype(np.float32)],
            [d for d in z["deltas"].astype(np.float32)])


@partial(jax.jit, static_argnames=("iters", "dist_thresh", "query_chunk",
                                   "method", "trim"))
def odometry_deltas_scan(points: jax.Array, masks: jax.Array,
                         normals: Optional[jax.Array] = None,
                         iters: int = 25, dist_thresh: float = 2.0,
                         query_chunk: int = 2048,
                         method: str = "p2pl",
                         trim: float = 1.0) -> jax.Array:
    """Device-resident odometry front end: the WHOLE scan-to-scan chain as
    one jitted program. points [F,N,3] / masks [F,N] (downsampled, fixed
    capacity; normals [F,N,3] for method='p2pl') -> deltas [F,4,4] with
    deltas[0]=I and deltas[k] = prev_T_cur for frame k. A `lax.scan`
    carries the previous cloud and the constant-velocity prior across
    frames — zero host round-trips inside the sequence (the host loop in
    `run_odometry` pays one tunnel round-trip per frame; this pays one
    per sequence)."""
    eye = jnp.eye(4, dtype=jnp.float32)
    if method == "p2pl":
        assert normals is not None

        def body(carry, x):
            prev_pts, prev_nrm, prev_mask, prior = carry
            cur_pts, cur_nrm, cur_mask = x
            T = icp_fixed_iters_p2pl(cur_pts, cur_mask, prev_pts, prev_nrm,
                                     prev_mask, init_T=prior, iters=iters,
                                     dist_thresh=dist_thresh,
                                     query_chunk=query_chunk, trim=trim)
            return (cur_pts, cur_nrm, cur_mask, T), T

        _, deltas = jax.lax.scan(
            body, (points[0], normals[0], masks[0], eye),
            (points[1:], normals[1:], masks[1:]))
    else:
        def body(carry, x):
            prev_pts, prev_mask, prior = carry
            cur_pts, cur_mask = x
            T = icp_fixed_iters(cur_pts, cur_mask, prev_pts, prev_mask,
                                init_T=prior, iters=iters,
                                dist_thresh=dist_thresh,
                                query_chunk=query_chunk, trim=trim)
            return (cur_pts, cur_mask, T), T

        _, deltas = jax.lax.scan(body, (points[0], masks[0], eye),
                                 (points[1:], masks[1:]))
    return jnp.concatenate([eye[None], deltas], axis=0)


@jax.jit
def compose_deltas(deltas: jax.Array) -> jax.Array:
    """deltas [F,4,4] (delta[k] = pose[k-1]^-1 pose[k]) -> world poses
    [F,4,4] via parallel prefix: an associative scan over 4x4 composes in
    O(log F) depth instead of a sequential F-step chain. Exact-f32
    matmuls: the TPU default bf16 passes compound visibly over a
    pose chain (r4 precision finding)."""
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    return jax.lax.associative_scan(mm, deltas)


def run_odometry(scans: Sequence[np.ndarray],
                 cfg: OdometryConfig = OdometryConfig(),
                 checkpoint_path: Optional[str] = None,
                 checkpoint_every: int = 25) -> Dict:
    """scans: list of (N_i, 3) arrays in sensor frame. Returns dict with
    'poses' [F,4,4] world_T_sensor, keyframes, loop closures, and the
    optimized keyframe poses. With checkpoint_path, the scan-to-scan
    front end is restartable mid-sequence."""
    capacity = round_up(max(s.shape[0] for s in scans), 2048)
    clouds = [_prep(s, capacity, cfg.voxel_leaf) for s in scans]
    pts = jnp.stack([c.points for c in clouds])
    msk = jnp.stack([c.mask for c in clouds])
    if cfg.method == "p2pl":
        # batched dense radius-covariance normals for all frames at once
        nrms = normals_radius_dense(pts, msk, radius=2.5 * cfg.voxel_leaf)
    else:
        nrms = None

    def pair_icp(cur, cur_n, cur_m, prev, prev_n, prev_m, init,
                 trim=None):
        trim = cfg.trim if trim is None else trim
        if cfg.method == "p2pl":
            return icp_fixed_iters_p2pl(
                cur, cur_m, prev, prev_n, prev_m, init_T=init,
                iters=cfg.icp_iters, dist_thresh=cfg.icp_dist_thresh,
                query_chunk=cfg.query_chunk, trim=trim)
        return icp_fixed_iters(
            cur, cur_m, prev, prev_m, init_T=init, iters=cfg.icp_iters,
            dist_thresh=cfg.icp_dist_thresh, query_chunk=cfg.query_chunk,
            trim=trim)

    n = len(scans)
    frontend = cfg.frontend
    if frontend == "auto":
        frontend = "host" if checkpoint_path else "scan"
    if frontend == "scan":
        deltas_d = odometry_deltas_scan(pts, msk, nrms,
                                        iters=cfg.icp_iters,
                                        dist_thresh=cfg.icp_dist_thresh,
                                        query_chunk=cfg.query_chunk,
                                        method=cfg.method, trim=cfg.trim)
        poses = np.asarray(compose_deltas(deltas_d))
    else:
        poses = [np.eye(4, dtype=np.float32)]
        deltas = [np.eye(4, dtype=np.float32)]
        start = 1
        if checkpoint_path:
            restored = load_odometry_state(checkpoint_path)
            if restored:
                start, poses, deltas = restored
                start += 1
        for i in range(start, n):
            init = jnp.asarray(deltas[-1])        # constant-velocity prior
            # T maps cur (src) into prev (dst) frame
            T = np.asarray(pair_icp(
                pts[i], None if nrms is None else nrms[i], msk[i],
                pts[i - 1], None if nrms is None else nrms[i - 1],
                msk[i - 1], init))
            deltas.append(T.astype(np.float32))
            poses.append((poses[-1] @ T).astype(np.float32))
            if checkpoint_path and (i % checkpoint_every == 0 or i == n - 1):
                save_odometry_state(checkpoint_path, i, poses, deltas)
        poses = np.stack(poses)

    # keyframes + odometry edges between consecutive keyframes
    kf = list(range(0, n, cfg.keyframe_every))
    if kf[-1] != n - 1:
        kf.append(n - 1)
    kf_poses = poses[kf]
    edges_i, edges_j, T_meas = [], [], []
    for a in range(len(kf) - 1):
        rel = np.linalg.inv(kf_poses[a]) @ kf_poses[a + 1]
        edges_i.append(a)
        edges_j.append(a + 1)
        T_meas.append(rel.astype(np.float32))

    # loop closures: keyframes that come back near each other; each
    # candidate edge is VALIDATED by its post-ICP fitness (fraction of
    # source points with a target neighbor within validation_dist) —
    # closure ICP from a drifted init can converge to a wrong pose, and
    # one bad edge drags the whole graph (SURVEY.md §5.3 failure
    # isolation, applied to the SLAM backend)
    from pctpu.core import se3 as _se3
    from pctpu.ops.knn import nearest as _nearest
    closures = []
    rejected = []
    for a in range(len(kf)):
        for b in range(a + cfg.closure_min_gap + 1, len(kf)):
            d = np.linalg.norm(kf_poses[a][:3, 3] - kf_poses[b][:3, 3])
            if d < cfg.closure_radius:
                init = np.linalg.inv(kf_poses[a]) @ kf_poses[b]
                fa, fb = kf[a], kf[b]
                T = pair_icp(
                    pts[fb], None if nrms is None else nrms[fb], msk[fb],
                    pts[fa], None if nrms is None else nrms[fa], msk[fa],
                    jnp.asarray(init.astype(np.float32)),
                    trim=cfg.closure_trim)
                d2, _ = _nearest(_se3.apply_transform(T, pts[fb]),
                                 pts[fa], msk[fa], cfg.query_chunk)
                inl = (jnp.asarray(d2)
                       <= jnp.float32(cfg.closure_validation_dist) ** 2)
                fit = float(jnp.sum(inl & msk[fb])
                            / jnp.maximum(jnp.sum(msk[fb]), 1))
                if fit < cfg.closure_min_fitness:
                    rejected.append((a, b, fit))
                    continue
                edges_i.append(a)
                edges_j.append(b)
                T_meas.append(np.asarray(T).astype(np.float32))
                closures.append((a, b))

    # dense solve up to ~100 keyframes; block-sparse PCG beyond (O(M+E)
    # memory vs the dense path's [6M,6M] — see parallel/posegraph.py)
    if len(kf) <= 100:
        res = optimize_pose_graph(
            jnp.asarray(kf_poses), jnp.asarray(np.array(edges_i, np.int32)),
            jnp.asarray(np.array(edges_j, np.int32)),
            jnp.asarray(np.stack(T_meas)), iters=cfg.pose_graph_iters,
            robust_delta=cfg.robust_delta)
    else:
        res = optimize_pose_graph_sparse(
            jnp.asarray(kf_poses), jnp.asarray(np.array(edges_i, np.int32)),
            jnp.asarray(np.array(edges_j, np.int32)),
            jnp.asarray(np.stack(T_meas)), iters=cfg.pose_graph_iters,
            cg_iters=max(400, 3 * len(kf)),
            robust_delta=cfg.robust_delta)
    kf_opt = np.asarray(res.poses)

    # propagate the keyframe correction to in-between frames
    poses_opt = poses.copy()
    for a in range(len(kf)):
        corr = kf_opt[a] @ np.linalg.inv(kf_poses[a])
        lo = kf[a]
        hi = kf[a + 1] if a + 1 < len(kf) else n
        for f in range(lo, hi):
            poses_opt[f] = (corr @ poses[f]).astype(np.float32)

    return {"poses": poses, "poses_optimized": poses_opt,
            "keyframes": kf, "keyframe_poses": kf_opt,
            "closures": closures, "closures_rejected": rejected,
            "final_cost": float(res.final_cost)}


def ate(poses: np.ndarray, gt: np.ndarray) -> float:
    """Absolute trajectory error (translation RMSE after aligning frame 0)."""
    a = np.linalg.inv(poses[0])[None] @ poses
    g = np.linalg.inv(gt[0])[None] @ gt
    err = np.linalg.norm(a[:, :3, 3] - g[:, :3, 3], axis=1)
    return float(np.sqrt(np.mean(err ** 2)))
