"""Dump the bench workload's front-end output (poses, keyframes, edges
incl. global-reg closures) to npz so optimizer variants can be iterated
on CPU without re-running the TPU front end."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jaxcache")

import numpy as np

from debug_closure import make_workload


def main():
    from pctpu.pipelines.odometry import OdometryConfig, ate, run_odometry

    gt, scans = make_workload()
    cfg = OdometryConfig(voxel_leaf=0.4, icp_iters=30, icp_dist_thresh=3.0,
                         keyframe_every=4, closure_radius=6.0,
                         closure_min_gap=3, query_chunk=1024,
                         frontend="scan")
    out = run_odometry(scans, cfg)
    print("closures:", out["closures"],
          "rejected:", out["closures_rejected"])
    print("ate raw:", ate(out["poses"], gt),
          "ate opt:", ate(out["poses_optimized"], gt))
    kf = out["keyframes"]
    ei, ej, Tm = out["edges"]
    np.savez("/root/repo/tools/closure_dump.npz",
             poses=out["poses"], gt=gt, kf=np.array(kf),
             kf_opt=out["keyframe_poses"], ei=ei, ej=ej, Tm=Tm,
             closures=np.array(out["closures"], np.int32).reshape(-1, 2))
    print("dumped")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
