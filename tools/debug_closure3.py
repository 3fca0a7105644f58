"""Closure experiment 3: does closure ICP converge tightly from a good
init (GT / RANSAC global registration), or is the p2pl solution biased on
this scene regardless of init? Also print rotation errors."""
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
    from pctpu.register.icp import icp_fixed_iters_p2pl, icp_fixed_iters
    from pctpu.register.pipeline import RegistrationConfig, register_pairs
    from scipy.spatial.transform import Rotation

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

    def fitness(T, fb, fa):
        d2, _ = _nearest(_se3.apply_transform(T, pts[fb]), pts[fa], msk[fa],
                         cfg.query_chunk)
        inl = jnp.asarray(d2) <= jnp.float32(cfg.closure_validation_dist) ** 2
        return float(jnp.sum(inl & msk[fb]) / jnp.maximum(jnp.sum(msk[fb]), 1))

    for a, b in [(0, 7), (0, 8)]:
        fa, fb = kf[a], kf[b]
        init = np.linalg.inv(kfp[a]) @ kfp[b]
        gt_rel = np.linalg.inv(gt[fa]) @ gt[fb]

        def report(tag, T):
            Tn = np.asarray(T)
            D = np.linalg.inv(Tn) @ gt_rel
            terr = np.linalg.norm(D[:3, 3])
            rerr = np.abs(Rotation.from_matrix(
                D[:3, :3]).as_rotvec(degrees=True)).sum()
            print(f"  {tag}: terr={terr:.3f} rerr={rerr:.2f}deg "
                  f"fit={fitness(T, fb, fa):.3f}")

        print(f"cand kf{a}<->kf{b}:")
        report("init (odometry)", init)
        gtj = jnp.asarray(gt_rel.astype(np.float32))
        # (a) p2pl from GT init: does it stay?
        T = icp_fixed_iters_p2pl(pts[fb], msk[fb], pts[fa], nrms[fa],
                                 msk[fa], init_T=gtj, iters=30,
                                 dist_thresh=3.0, query_chunk=1024)
        report("p2pl from GT", T)
        # (a2) tighter dist_thresh from GT
        T = icp_fixed_iters_p2pl(pts[fb], msk[fb], pts[fa], nrms[fa],
                                 msk[fa], init_T=gtj, iters=30,
                                 dist_thresh=1.0, query_chunk=1024)
        report("p2pl@1.0 from GT", T)
        # (b) p2p from GT init
        T = icp_fixed_iters(pts[fb], msk[fb], pts[fa], msk[fa], init_T=gtj,
                            iters=30, dist_thresh=3.0, query_chunk=1024)
        report("p2p from GT", T)
        # (c) RANSAC global init (registration front end on the two
        # keyframe clouds), then p2pl refine
        rcfg = RegistrationConfig(voxel_size=0.8, feature_radius=4.0,
                                  normal_radius=1.6, ransac_dist=1.2,
                                  ransac_hypotheses=2048,
                                  icp_dist_thresh=2.0,
                                  downsample_capacity=2048)
        sp = PointCloud(points=pts[fb][None], mask=msk[fb][None])
        dp = PointCloud(points=pts[fa][None], mask=msk[fa][None])
        ro = register_pairs(sp, dp, keys=jax.random.split(
            jax.random.PRNGKey(0), 1), cfg=rcfg)
        report("FPFH+RANSAC+ICP (full reg)", ro.T[0])
        T = icp_fixed_iters_p2pl(pts[fb], msk[fb], pts[fa], nrms[fa],
                                 msk[fa], init_T=ro.ransac_T[0], iters=30,
                                 dist_thresh=3.0, query_chunk=1024)
        report("ransac_T -> p2pl", T)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
