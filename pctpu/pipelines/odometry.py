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
    # closure INITIALIZATION: 'global' (default) re-registers each closure
    # candidate from scratch with the FPFH+RANSAC front end
    # (register_pairs, batched over ALL candidates at once) — from a
    # drifted odometry init (~1 m on the r4 TPU bench) closure ICP
    # converges into a local minimum 0.2-0.5 m off and fails fitness
    # validation (0.29-0.35 vs 0.55), while global registration lands
    # 0.02-0.04 m from GT on the same pairs (r5 TPU measurement; see
    # tools/debug_closure3.py). 'odometry' keeps the drifted relative
    # pose as the ICP init (the r4 behavior).
    closure_init: str = "global"
    closure_reg_capacity: int = 2048
    closure_ransac_hypotheses: int = 2048
    # closure/optimize rounds: round 0 = global-reg init; rounds >= 1
    # re-detect + retry rejected candidates from the graph-CORRECTED
    # poses (stops early when a round accepts nothing new)
    closure_rounds: int = 2
    pose_graph_iters: int = 16
    # Geman-McClure IRLS scale for the graph solve (None = plain L2);
    # redescending influence suppresses any bad edge that slips through.
    # robust_warmup enables graduated non-convexity: delta starts at
    # 2^warmup * robust_delta and halves per GN iteration — without it
    # the redescending kernel crushes exactly the (validated!) closure
    # edges, whose initial residuals are drift-sized >> delta
    robust_delta: Optional[float] = 0.5
    robust_warmup: int = 8
    # 'p2pl' (default): point-to-plane scan matching — on planar-dominated
    # scenes it converges far past point-to-point's partial-overlap bias
    # floor (measured 6x less drift on the synthetic loop). 'p2p' keeps
    # the reference-semantics point-to-point associations.
    method: str = "p2pl"
    # scan-to-SUBMAP odometry (the BASELINE stretch's "scan-to-map ICP"):
    # each frame registers against the union of the last `submap_frames`
    # downsampled clouds (rolling buffer carried in the lax.scan, all in
    # the previous frame's coordinates) instead of just the previous
    # scan. 1 = classic scan-to-scan. A larger target suppresses the
    # partial-overlap bias that accumulates as drift, at ~K x the
    # association cost per frame.
    submap_frames: int = 1
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
                                   "method", "trim", "submap_frames"))
def odometry_deltas_scan(points: jax.Array, masks: jax.Array,
                         normals: Optional[jax.Array] = None,
                         iters: int = 25, dist_thresh: float = 2.0,
                         query_chunk: int = 2048,
                         method: str = "p2pl",
                         trim: float = 1.0,
                         submap_frames: int = 1) -> jax.Array:
    """Device-resident odometry front end: the WHOLE scan-to-scan (or
    scan-to-submap, submap_frames > 1) chain as one jitted program.
    points [F,N,3] / masks [F,N] (downsampled, fixed capacity; normals
    [F,N,3] for method='p2pl') -> deltas [F,4,4] with deltas[0]=I and
    deltas[k] = prev_T_cur for frame k. A `lax.scan` carries the rolling
    submap buffer (K clouds in the previous frame's coordinates) and the
    constant-velocity prior across frames — zero host round-trips inside
    the sequence (the host loop in `run_odometry` pays one tunnel
    round-trip per frame; this pays one per sequence)."""
    eye = jnp.eye(4, dtype=jnp.float32)
    k = max(1, submap_frames)
    n = points.shape[1]
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def init_buf(x0):
        """[N,...] -> [K,N,...] with only slot 0 live."""
        return jnp.concatenate([x0[None], jnp.zeros_like(
            jnp.broadcast_to(x0[None], (k - 1,) + x0.shape))]) \
            if k > 1 else x0[None]

    if method == "p2pl":
        assert normals is not None

        def body(carry, x):
            buf_pts, buf_nrm, buf_msk, prior = carry
            cur_pts, cur_nrm, cur_mask = x
            T = icp_fixed_iters_p2pl(cur_pts, cur_mask,
                                     buf_pts.reshape(k * n, 3),
                                     buf_nrm.reshape(k * n, 3),
                                     buf_msk.reshape(k * n),
                                     init_T=prior, iters=iters,
                                     dist_thresh=dist_thresh,
                                     query_chunk=query_chunk, trim=trim)
            # move the buffer into the CURRENT frame: p' = R^T (p - t),
            # normals rotate by R^T
            Rt = T[:3, :3].T
            moved = mm(buf_pts - T[:3, 3], Rt.T)
            moved_n = mm(buf_nrm, Rt.T)
            new_pts = jnp.concatenate([cur_pts[None], moved[:-1]])
            new_nrm = jnp.concatenate([cur_nrm[None], moved_n[:-1]])
            new_msk = jnp.concatenate([cur_mask[None], buf_msk[:-1]])
            return (new_pts, new_nrm, new_msk, T), T

        _, deltas = jax.lax.scan(
            body, (init_buf(points[0]), init_buf(normals[0]),
                   init_buf(masks[0]), eye),
            (points[1:], normals[1:], masks[1:]))
    else:
        def body(carry, x):
            buf_pts, buf_msk, prior = carry
            cur_pts, cur_mask = x
            T = icp_fixed_iters(cur_pts, cur_mask,
                                buf_pts.reshape(k * n, 3),
                                buf_msk.reshape(k * n),
                                init_T=prior, iters=iters,
                                dist_thresh=dist_thresh,
                                query_chunk=query_chunk, trim=trim)
            Rt = T[:3, :3].T
            moved = mm(buf_pts - T[:3, 3], Rt.T)
            new_pts = jnp.concatenate([cur_pts[None], moved[:-1]])
            new_msk = jnp.concatenate([cur_mask[None], buf_msk[:-1]])
            return (new_pts, new_msk, T), T

        _, deltas = jax.lax.scan(
            body, (init_buf(points[0]), init_buf(masks[0]), eye),
            (points[1:], masks[1:]))
    return jnp.concatenate([eye[None], deltas], axis=0)


@partial(jax.jit, static_argnames=("iters", "dist_thresh", "query_chunk",
                                   "trim", "method", "validation_dist"))
def _closure_validate_batch(src_p, src_m, src_n, dst_p, dst_n, dst_m,
                            inits, iters: int, dist_thresh: float,
                            query_chunk: int, trim: float, method: str,
                            validation_dist: float):
    """Vmapped closure refine + fitness for a batch of candidate pairs:
    Ts [C,4,4], fitness [C] (fraction of source points with a target
    neighbor within validation_dist at the refined pose)."""
    from pctpu.core import se3 as _se3
    from pctpu.ops.knn import nearest as _nearest

    if method == "p2pl":
        def one(sp, sm, sn, dp, dn, dm, it):
            return icp_fixed_iters_p2pl(sp, sm, dp, dn, dm, init_T=it,
                                        iters=iters,
                                        dist_thresh=dist_thresh,
                                        query_chunk=query_chunk, trim=trim)
        Ts = jax.vmap(one)(src_p, src_m, src_n, dst_p, dst_n, dst_m, inits)
    else:
        def one(sp, sm, dp, dm, it):
            return icp_fixed_iters(sp, sm, dp, dm, init_T=it, iters=iters,
                                   dist_thresh=dist_thresh,
                                   query_chunk=query_chunk, trim=trim)
        Ts = jax.vmap(one)(src_p, src_m, dst_p, dst_m, inits)

    def fit_one(T, sp, sm, dp, dm):
        d2, _ = _nearest(_se3.apply_transform(T, sp), dp, dm, query_chunk)
        inl = d2 <= jnp.float32(validation_dist) ** 2
        return (jnp.sum(inl & sm).astype(jnp.float32)
                / jnp.maximum(jnp.sum(sm), 1))

    fits = jax.vmap(fit_one)(Ts, src_p, src_m, dst_p, dst_m)
    return Ts, fits


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
                                        method=cfg.method, trim=cfg.trim,
                                        submap_frames=cfg.submap_frames)
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
        # rolling scan-to-submap buffer in the previous frame's
        # coordinates (mirrors the lax.scan path; rebuilt from the
        # checkpointed deltas on resume)
        K = max(1, cfg.submap_frames)

        def rebuild_buf(upto):
            buf = []
            for j in list(range(max(0, upto - K + 1), upto + 1))[::-1]:
                rel = np.linalg.inv(poses[upto]) @ poses[j]
                bp = np.asarray(pts[j]) @ rel[:3, :3].T + rel[:3, 3]
                bn = (None if nrms is None
                      else np.asarray(nrms[j]) @ rel[:3, :3].T)
                buf.append((bp.astype(np.float32), bn, np.asarray(msk[j])))
            return buf

        buf = rebuild_buf(start - 1)
        for i in range(start, n):
            init = jnp.asarray(deltas[-1])        # constant-velocity prior
            tgt_p = np.concatenate([b[0] for b in buf])
            tgt_n = (None if nrms is None
                     else np.concatenate([b[1] for b in buf]))
            tgt_m = np.concatenate([b[2] for b in buf])
            # T maps cur (src) into prev (dst) frame
            T = np.asarray(pair_icp(
                pts[i], None if nrms is None else nrms[i], msk[i],
                jnp.asarray(tgt_p),
                None if tgt_n is None else jnp.asarray(tgt_n),
                jnp.asarray(tgt_m), init))
            deltas.append(T.astype(np.float32))
            poses.append((poses[-1] @ T).astype(np.float32))
            inv = np.linalg.inv(T).astype(np.float32)
            buf = [(np.asarray(pts[i]), None if nrms is None
                    else np.asarray(nrms[i]), np.asarray(msk[i]))] + [
                (bp @ inv[:3, :3].T + inv[:3, 3],
                 None if bn is None else bn @ inv[:3, :3].T, bm)
                for bp, bn, bm in buf[:K - 1]]
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
    # isolation, applied to the SLAM backend).
    #
    # MULTI-ROUND closure (cfg.closure_rounds): round 0 initializes every
    # candidate with batched GLOBAL registration (drift-independent);
    # after the first graph solve, rounds >= 1 re-detect candidates from
    # the CORRECTED poses and retry previously-rejected pairs with the
    # (now-good) graph relative pose as ICP init — candidates whose
    # global registration failed (low-overlap opposite-side pairs)
    # usually converge from a corrected init, stitching the mid-loop.
    def validate_closures_batch(cand_list, init_arr):
        """ALL candidate closure ICPs + fitness validations in two
        batched dispatches (a host loop of per-candidate solves was ~10x
        the whole front end's cost once dense closures made the
        candidate set ~15 pairs). Pads to a pow2 bucket so repeat rounds
        reuse the compile. Returns (Ts [C,4,4], fits [C]) numpy."""
        c = len(cand_list)
        nb = max(1, 1 << (c - 1).bit_length())
        pad_cands = cand_list + [cand_list[-1]] * (nb - c)
        init_p = np.concatenate(
            [init_arr, np.tile(init_arr[-1:], (nb - c, 1, 1))], axis=0)
        ib = jnp.asarray([kf[b] for _, b in pad_cands], jnp.int32)
        ia = jnp.asarray([kf[a] for a, _ in pad_cands], jnp.int32)
        Ts, fits = _closure_validate_batch(
            pts[ib], msk[ib], None if nrms is None else nrms[ib],
            pts[ia], None if nrms is None else nrms[ia], msk[ia],
            jnp.asarray(init_p.astype(np.float32)),
            iters=cfg.icp_iters, dist_thresh=cfg.icp_dist_thresh,
            query_chunk=cfg.query_chunk, trim=cfg.closure_trim,
            method=cfg.method,
            validation_dist=cfg.closure_validation_dist)
        return np.asarray(Ts)[:c].astype(np.float32), np.asarray(fits)[:c]

    def solve_graph(kf_init, ei, ej, Tm):
        # dense solve up to ~100 keyframes; block-sparse PCG beyond
        # (O(M+E) memory vs the dense path's [6M,6M])
        if len(kf) <= 100:
            return optimize_pose_graph(
                jnp.asarray(kf_init), jnp.asarray(np.array(ei, np.int32)),
                jnp.asarray(np.array(ej, np.int32)),
                jnp.asarray(np.stack(Tm)), iters=cfg.pose_graph_iters,
                robust_delta=cfg.robust_delta,
                robust_warmup=cfg.robust_warmup)
        return optimize_pose_graph_sparse(
            jnp.asarray(kf_init), jnp.asarray(np.array(ei, np.int32)),
            jnp.asarray(np.array(ej, np.int32)),
            jnp.asarray(np.stack(Tm)), iters=cfg.pose_graph_iters,
            cg_iters=max(400, 3 * len(kf)),
            robust_delta=cfg.robust_delta,
            robust_warmup=cfg.robust_warmup)

    accepted = {}                 # (a, b) -> T_meas
    rejected = []
    kf_cur = kf_poses.copy()
    res = None
    for rnd in range(max(1, cfg.closure_rounds)):
        cands = []
        for a in range(len(kf)):
            for b in range(a + cfg.closure_min_gap + 1, len(kf)):
                if (a, b) in accepted:
                    continue
                d = np.linalg.norm(kf_cur[a][:3, 3] - kf_cur[b][:3, 3])
                if d < cfg.closure_radius:
                    cands.append((a, b))

        # round-0 inits: global re-registration of every candidate pair
        # in ONE batched register_pairs program (padded to a pow2 bucket
        # so repeat runs reuse the compile); later rounds use the
        # graph-corrected relative pose (see closure_init docs above)
        inits = {}
        if cands and rnd == 0 and cfg.closure_init == "global":
            from pctpu.register.pipeline import (RegistrationConfig,
                                                 register_pairs)
            leaf = cfg.voxel_leaf
            rcfg = RegistrationConfig(
                voxel_size=2.0 * leaf, feature_radius=10.0 * leaf,
                normal_radius=4.0 * leaf, ransac_dist=3.0 * leaf,
                ransac_hypotheses=cfg.closure_ransac_hypotheses,
                icp_dist_thresh=5.0 * leaf,
                downsample_capacity=cfg.closure_reg_capacity,
                # closure inits feed the pose graph: pin the accuracy-
                # oriented ICP budget here, independent of the throughput
                # defaults the bench pipeline tunes (r5: the 20->14 voxel-
                # iter trim silently degraded closure quality enough that
                # graph optimization stopped improving ATE)
                icp_voxel_iters=32, icp_refine_iters=2,
                refine_subsample=4096)
            nb = max(1, 1 << (len(cands) - 1).bit_length())  # pow2 bucket
            padded = cands + [cands[-1]] * (nb - len(cands))
            ib = jnp.asarray([kf[b] for _, b in padded], jnp.int32)
            ia = jnp.asarray([kf[a] for a, _ in padded], jnp.int32)
            sp = PointCloud(points=pts[ib], mask=msk[ib])
            dp = PointCloud(points=pts[ia], mask=msk[ia])
            keys = jax.random.split(jax.random.PRNGKey(0), nb)
            ro = register_pairs(sp, dp, keys=keys, cfg=rcfg)
            Ts_glob = np.asarray(ro.T)
            for k, (a, b) in enumerate(cands):
                inits[(a, b)] = Ts_glob[k].astype(np.float32)

        new_accepts = 0
        rejected = []
        if cands:
            init_arr = np.stack([
                inits.get((a, b), np.linalg.inv(kf_cur[a]) @ kf_cur[b])
                for a, b in cands]).astype(np.float32)
            Ts, fits = validate_closures_batch(cands, init_arr)
            for k, (a, b) in enumerate(cands):
                fit = float(fits[k])
                if fit < cfg.closure_min_fitness:
                    rejected.append((a, b, fit))
                    continue
                accepted[(a, b)] = Ts[k]
                new_accepts += 1

        if res is not None and new_accepts == 0:
            break                 # converged: no new information
        ei = edges_i + [a for a, _ in accepted]
        ej = edges_j + [b for _, b in accepted]
        Tm = T_meas + list(accepted.values())
        res = solve_graph(kf_poses, ei, ej, Tm)
        kf_cur = np.asarray(res.poses)

    closures = sorted(accepted.keys())
    edges_i = edges_i + [a for a, _ in accepted]
    edges_j = edges_j + [b for _, b in accepted]
    T_meas = T_meas + list(accepted.values())
    kf_opt = kf_cur

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
            "edges": (np.array(edges_i, np.int32),
                      np.array(edges_j, np.int32), np.stack(T_meas)),
            "final_cost": float(res.final_cost)}


def ate(poses: np.ndarray, gt: np.ndarray) -> float:
    """Absolute trajectory error (translation RMSE after aligning frame 0)."""
    a = np.linalg.inv(poses[0])[None] @ poses
    g = np.linalg.inv(gt[0])[None] @ gt
    err = np.linalg.norm(a[:, :3, 3] - g[:, :3, 3], axis=1)
    return float(np.sqrt(np.mean(err ** 2)))
