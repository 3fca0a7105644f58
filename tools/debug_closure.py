"""Diagnose why closure ICP fitness is ~0.3 on TPU vs accepted on CPU.

Rebuilds the exact bench_odometry workload, runs the front end, then for
each closure candidate prints: init error vs GT relative pose, post-ICP
error vs GT, and fitness — so we can see whether the failure is the
drifted init, the closure ICP convergence, or the fitness metric.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jaxcache")

import numpy as np
import jax
import jax.numpy as jnp


def make_workload(n_frames=32, seed=5):
    rng = np.random.default_rng(seed)
    pts = [np.concatenate([rng.uniform(-30, 30, (3000, 2)),
                           rng.normal(scale=0.02, size=(3000, 1))], axis=1)]
    for _ in range(12):
        c = rng.uniform(-25, 25, 2)
        ang = rng.uniform(0, 2 * np.pi, 250)
        pts.append(np.stack([c[0] + 0.4 * np.cos(ang),
                             c[1] + 0.4 * np.sin(ang),
                             rng.uniform(0, 4, 250)], axis=1))
    world = np.concatenate(pts).astype(np.float32)
    gt, scans = [], []
    for i in range(n_frames):
        th = 2 * np.pi * i / n_frames
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(th), np.sin(th)
        T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        T[:3, 3] = [6.0 * c, 6.0 * s, 0.0]
        gt.append(T)
        inv = np.linalg.inv(T)
        local = world @ inv[:3, :3].T + inv[:3, 3]
        keep = np.linalg.norm(local[:, :2], axis=1) < 20.0
        scans.append((local[keep] + rng.normal(
            scale=0.01, size=(int(keep.sum()), 3))).astype(np.float32))
    return np.stack(gt), scans


def main():
    from pctpu.pipelines.odometry import (OdometryConfig, ate, run_odometry,
                                          _prep)
    from pctpu.features.fpfh_dense import normals_radius_dense
    from pctpu.core.cloud import round_up
    from pctpu.core import se3 as _se3
    from pctpu.ops.knn import nearest as _nearest
    from pctpu.register.icp import icp_fixed_iters_p2pl

    gt, scans = make_workload()
    cfg = OdometryConfig(voxel_leaf=0.4, icp_iters=30, icp_dist_thresh=3.0,
                         keyframe_every=4, closure_radius=6.0,
                         closure_min_gap=3, query_chunk=1024,
                         frontend="scan")
    out = run_odometry(scans, cfg)
    print("backend:", jax.default_backend())
    print("closures:", out["closures"], "rejected:", out["closures_rejected"])
    print("ate raw:", ate(out["poses"], gt),
          "ate opt:", ate(out["poses_optimized"], gt))

    # per-frame drift of the raw front end
    poses = out["poses"]
    for f in (0, 8, 16, 24, 28, 31):
        D = np.linalg.inv(poses[f]) @ gt[f] @ np.linalg.inv(gt[0])
        print(f"frame {f}: drift trans={np.linalg.norm(D[:3,3]):.3f}")

    # rebuild the downsampled clouds exactly as run_odometry does
    capacity = round_up(max(s.shape[0] for s in scans), 2048)
    clouds = [_prep(s, capacity, cfg.voxel_leaf) for s in scans]
    pts = jnp.stack([c.points for c in clouds])
    msk = jnp.stack([c.mask for c in clouds])
    nrms = normals_radius_dense(pts, msk, radius=2.5 * cfg.voxel_leaf)

    kf = out["keyframes"]
    kfp = poses[kf]
    n_kf = len(kf)
    for a in range(n_kf):
        for b in range(a + cfg.closure_min_gap + 1, n_kf):
            d = np.linalg.norm(kfp[a][:3, 3] - kfp[b][:3, 3])
            if d >= cfg.closure_radius:
                continue
            fa, fb = kf[a], kf[b]
            init = np.linalg.inv(kfp[a]) @ kfp[b]
            gt_rel = np.linalg.inv(gt[fa]) @ gt[fb]
            Dinit = np.linalg.inv(init) @ gt_rel
            T = icp_fixed_iters_p2pl(
                pts[fb], msk[fb], pts[fa], nrms[fa], msk[fa],
                init_T=jnp.asarray(init.astype(np.float32)),
                iters=cfg.icp_iters, dist_thresh=cfg.icp_dist_thresh,
                query_chunk=cfg.query_chunk, trim=cfg.closure_trim)
            Tn = np.asarray(T)
            Dicp = np.linalg.inv(Tn) @ gt_rel
            d2, _ = _nearest(_se3.apply_transform(T, pts[fb]),
                             pts[fa], msk[fa], cfg.query_chunk)
            inl = (jnp.asarray(d2)
                   <= jnp.float32(cfg.closure_validation_dist) ** 2)
            fit = float(jnp.sum(inl & msk[fb])
                        / jnp.maximum(jnp.sum(msk[fb]), 1))
            # fitness at the GT relative pose (what a perfect ICP would get)
            d2g, _ = _nearest(_se3.apply_transform(
                jnp.asarray(gt_rel.astype(np.float32)), pts[fb]),
                pts[fa], msk[fa], cfg.query_chunk)
            inlg = (jnp.asarray(d2g)
                    <= jnp.float32(cfg.closure_validation_dist) ** 2)
            fitg = float(jnp.sum(inlg & msk[fb])
                         / jnp.maximum(jnp.sum(msk[fb]), 1))
            print(f"cand kf{a}<->kf{b} (frames {fa},{fb}) d={d:.2f}: "
                  f"init_err={np.linalg.norm(Dinit[:3,3]):.3f} m, "
                  f"icp_err={np.linalg.norm(Dicp[:3,3]):.3f} m, "
                  f"fit={fit:.3f}, fit@gt={fitg:.3f}")


if __name__ == "__main__":
    sys.exit(main())
