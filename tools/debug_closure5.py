"""Dense-closure experiment: closure_radius spanning the whole circle —
every keyframe pair is a closure candidate (global-reg init makes distant
pairs feasible). Expect mid-loop drift correction -> big ATE drop."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jaxcache")


from debug_closure import make_workload


def main():
    from pctpu.pipelines.odometry import OdometryConfig, ate, run_odometry

    gt, scans = make_workload()
    for radius in (6.0, 13.0):
        cfg = OdometryConfig(voxel_leaf=0.4, icp_iters=30,
                             icp_dist_thresh=3.0, keyframe_every=4,
                             closure_radius=radius, closure_min_gap=3,
                             query_chunk=1024, frontend="scan")
        out = run_odometry(scans, cfg)
        print(f"radius={radius}: closures={len(out['closures'])} "
              f"rejected={len(out['closures_rejected'])} "
              f"ate_raw={ate(out['poses'], gt):.4f} "
              f"ate_opt={ate(out['poses_optimized'], gt):.4f}")
        print("  accepted:", out["closures"])
        print("  rejected:", [(a, b, round(f, 3))
                              for a, b, f in out["closures_rejected"]])


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
