"""Closure ICP variants experiment: why does p2pl stall 0.2-0.5 m off from
a ~1 m drifted init, and what fixes it (more iters? p2p? coarse stage?
submap target?)."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jaxcache")

import numpy as np
import jax
import jax.numpy as jnp

from debug_closure import make_workload


def main():
    from pctpu.pipelines.odometry import OdometryConfig, run_odometry, _prep
    from pctpu.features.fpfh_dense import normals_radius_dense
    from pctpu.core.cloud import round_up, PointCloud
    from pctpu.core import se3 as _se3
    from pctpu.ops.knn import nearest as _nearest
    from pctpu.ops.voxel import voxel_downsample
    from pctpu.register.icp import icp_fixed_iters_p2pl, icp_fixed_iters

    gt, scans = make_workload()
    cfg = OdometryConfig(voxel_leaf=0.4, icp_iters=30, icp_dist_thresh=3.0,
                         keyframe_every=4, closure_radius=6.0,
                         closure_min_gap=3, query_chunk=1024,
                         frontend="scan")
    out = run_odometry(scans, cfg)
    poses = out["poses"]
    kf = out["keyframes"]
    kfp = poses[kf]

    capacity = round_up(max(s.shape[0] for s in scans), 2048)
    clouds = [_prep(s, capacity, cfg.voxel_leaf) for s in scans]
    pts = jnp.stack([c.points for c in clouds])
    msk = jnp.stack([c.mask for c in clouds])
    nrms = normals_radius_dense(pts, msk, radius=2.5 * cfg.voxel_leaf)

    def fitness(T, fb, tgt_pts, tgt_msk):
        d2, _ = _nearest(_se3.apply_transform(T, pts[fb]), tgt_pts, tgt_msk,
                         cfg.query_chunk)
        inl = jnp.asarray(d2) <= jnp.float32(cfg.closure_validation_dist) ** 2
        return float(jnp.sum(inl & msk[fb]) / jnp.maximum(jnp.sum(msk[fb]), 1))

    cands = [(0, 7), (0, 8)]
    for a, b in cands:
        fa, fb = kf[a], kf[b]
        init = np.linalg.inv(kfp[a]) @ kfp[b]
        gt_rel = np.linalg.inv(gt[fa]) @ gt[fb]

        def report(tag, T, tgt_pts=pts[fa], tgt_msk=msk[fa]):
            Tn = np.asarray(T)
            err = np.linalg.norm((np.linalg.inv(Tn) @ gt_rel)[:3, 3])
            print(f"  {tag}: err={err:.3f} fit={fitness(T, fb, tgt_pts, tgt_msk):.3f}")

        print(f"cand kf{a}<->kf{b}: init_err="
              f"{np.linalg.norm((np.linalg.inv(init) @ gt_rel)[:3, 3]):.3f}")
        ji = jnp.asarray(init.astype(np.float32))
        # variant 1: plain p2pl 30 iters (status quo)
        T = icp_fixed_iters_p2pl(pts[fb], msk[fb], pts[fa], nrms[fa], msk[fa],
                                 init_T=ji, iters=30, dist_thresh=3.0,
                                 query_chunk=1024)
        report("p2pl 30it", T)
        # variant 2: p2pl 100 iters
        T = icp_fixed_iters_p2pl(pts[fb], msk[fb], pts[fa], nrms[fa], msk[fa],
                                 init_T=ji, iters=100, dist_thresh=3.0,
                                 query_chunk=1024)
        report("p2pl 100it", T)
        # variant 3: p2p 30 iters
        T = icp_fixed_iters(pts[fb], msk[fb], pts[fa], msk[fa], init_T=ji,
                            iters=30, dist_thresh=3.0, query_chunk=1024)
        report("p2p 30it", T)
        # variant 4: p2p 30 then p2pl 30
        T = icp_fixed_iters(pts[fb], msk[fb], pts[fa], msk[fa], init_T=ji,
                            iters=30, dist_thresh=3.0, query_chunk=1024)
        T = icp_fixed_iters_p2pl(pts[fb], msk[fb], pts[fa], nrms[fa], msk[fa],
                                 init_T=T, iters=30, dist_thresh=1.0,
                                 query_chunk=1024)
        report("p2p30 + p2pl30@1.0", T)
        # variant 5: submap target — union of keyframe a's +-1 keyframe
        # clouds in keyframe a's frame, re-downsampled
        nbr = [k for k in range(len(kf))
               if abs(k - a) <= 1 or (a == 0 and k == len(kf) - 1)]
        sub = []
        for k in nbr:
            rel = np.linalg.inv(kfp[a]) @ kfp[kf.index(kf[k])] if False else \
                np.linalg.inv(kfp[a]) @ kfp[k]
            p = np.asarray(pts[kf[k]])[np.asarray(msk[kf[k]])]
            sub.append(p @ rel[:3, :3].T.astype(np.float32)
                       + rel[:3, 3].astype(np.float32))
        sub = np.concatenate(sub).astype(np.float32)
        cap2 = round_up(sub.shape[0], 2048)
        spc = PointCloud.from_numpy(sub, capacity=cap2)
        sdown = voxel_downsample(spc.points, spc.mask, cfg.voxel_leaf)
        snrm = normals_radius_dense(sdown.points[None], sdown.mask[None],
                                    radius=2.5 * cfg.voxel_leaf)[0]
        T = icp_fixed_iters_p2pl(pts[fb], msk[fb], sdown.points, snrm,
                                 sdown.mask, init_T=ji, iters=30,
                                 dist_thresh=3.0, query_chunk=1024)
        report("p2pl 30it submap", T, sdown.points, sdown.mask)
        T = icp_fixed_iters_p2pl(pts[fb], msk[fb], sdown.points, snrm,
                                 sdown.mask, init_T=ji, iters=60,
                                 dist_thresh=3.0, query_chunk=1024)
        report("p2pl 60it submap", T, sdown.points, sdown.mask)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
