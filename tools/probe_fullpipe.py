#!/usr/bin/env python
"""Stage timings of register_pair (the full-pipeline pairs/s workload):
voxel+FPFH preprocess, mutual-NN matching, RANSAC, ICP refine."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(fn, sync, k_lo=1, k_hi=6, trials=2):
    sync(fn())
    ts = {}
    for k in (k_lo, k_hi):
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from bench import _load_scan, _perturb, N_POINTS, FULL_PAIR_ROT_DEG
    from pctpu.core.cloud import PointCloud
    from pctpu.features.fpfh import fpfh
    from pctpu.features.matching import match_features
    from pctpu.ops.voxel import voxel_downsample
    from pctpu.register.icp import ICPConfig, icp_point_to_point
    from pctpu.register.pipeline import RegistrationConfig
    from pctpu.register.ransac import ransac_registration

    pts = _load_scan()
    rng = np.random.default_rng(2)
    sel = rng.choice(pts.shape[0], N_POINTS, replace=False)
    src = pts[sel]
    rotvec = np.array([0.05, -0.03, np.radians(FULL_PAIR_ROT_DEG)])
    dst, T_gt = _perturb(src, rng, rotvec, [3.0, -2.0, 0.5], noise=0.02)
    sp, dp = PointCloud.from_numpy(src), PointCloud.from_numpy(dst)
    cfg = RegistrationConfig()

    @jax.jit
    def pre(pc_pts, pc_mask):
        down = voxel_downsample(pc_pts, pc_mask, cfg.voxel_size)
        feats = fpfh(down.points, mask=down.mask,
                     radius=cfg.feature_radius, k_cap=cfg.feature_k_cap,
                     normal_k=cfg.normal_k)
        return down.points, down.mask, feats

    spts, smask, sfeat = pre(sp.points, sp.mask)
    dpts, dmask, dfeat = pre(dp.points, dp.mask)
    t_pre = slope(lambda: pre(sp.points, sp.mask), lambda o: np.asarray(o[0]))
    print(f"preprocess (voxel+normals+FPFH), per cloud: {t_pre*1e3:8.1f} ms",
          flush=True)

    mj = jax.jit(partial(match_features, mutual=True))
    matches = mj(sfeat, dfeat, src_mask=smask, dst_mask=dmask)
    t_match = slope(lambda: mj(sfeat, dfeat, src_mask=smask, dst_mask=dmask),
                    lambda o: np.asarray(o.valid))
    print(f"mutual-NN matching:                         {t_match*1e3:8.1f} ms",
          flush=True)

    dst_kp = dpts[matches.dst_idx]
    rj = jax.jit(partial(ransac_registration,
                         dist_thresh=cfg.ransac_dist,
                         num_hypotheses=cfg.ransac_hypotheses))
    key = jax.random.PRNGKey(0)
    rr = rj(spts, dst_kp, corr_valid=matches.valid, key=key)
    t_ransac = slope(lambda: rj(spts, dst_kp, corr_valid=matches.valid,
                                key=key), lambda o: np.asarray(o.T))
    print(f"RANSAC ({cfg.ransac_hypotheses} hyps):      {t_ransac*1e3:8.1f} ms",
          flush=True)

    icp_cfg = ICPConfig(max_iters=cfg.icp_max_iters,
                        dist_thresh=cfg.icp_dist_thresh,
                        query_chunk=cfg.icp_query_chunk)
    ij = jax.jit(partial(icp_point_to_point, cfg=icp_cfg))
    icp = ij(sp.points, sp.mask, dp.points, dp.mask, init_T=rr.T)
    t_icp = slope(lambda: ij(sp.points, sp.mask, dp.points, dp.mask,
                             init_T=rr.T), lambda o: np.asarray(o.T))
    print(f"ICP refine (max {cfg.icp_max_iters} while-loop iters): "
          f"{t_icp*1e3:8.1f} ms, iters used={int(np.asarray(icp.iters))}",
          flush=True)

    total = 2 * t_pre + t_match + t_ransac + t_icp
    print(f"sum: {total*1e3:.1f} ms -> {1/total:.2f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
