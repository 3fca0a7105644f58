"""Submap front-end experiment on the bench workload: drift + final ATE
for scan-to-scan vs scan-to-submap, with dense closures (radius 13)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jaxcache")

from debug_closure import make_workload


def main():
    from pctpu.pipelines.odometry import OdometryConfig, ate, run_odometry

    gt, scans = make_workload()
    for submap in (1, 3):
        cfg = OdometryConfig(voxel_leaf=0.4, icp_iters=30,
                             icp_dist_thresh=3.0, keyframe_every=4,
                             closure_radius=13.0, closure_min_gap=3,
                             query_chunk=1024, frontend="scan",
                             submap_frames=submap)
        out = run_odometry(scans, cfg)      # compile + warmup
        t0 = time.perf_counter()
        out = run_odometry(scans, cfg)
        dt = time.perf_counter() - t0
        print(f"submap={submap}: closures={len(out['closures'])} "
              f"rejected={len(out['closures_rejected'])} "
              f"ate_raw={ate(out['poses'], gt):.4f} "
              f"ate_opt={ate(out['poses_optimized'], gt):.4f} "
              f"{len(scans)/dt:.1f} frames/s")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
