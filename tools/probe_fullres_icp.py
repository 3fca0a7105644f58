"""Full-resolution mega ICP probe: the REAL 124,668-pt KITTI scan
(VERDICT r3 item 5 — the reference's actual workload, main.py:107-154).
Gated on the reference RTE/RRE bound; reports iters/s at several
block/window configs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

REFERENCE_BIN = "/root/reference/Kdtree_Octree/000000.bin"


def rte_rre(T_pred, T_gt):
    from scipy.spatial.transform import Rotation
    D = np.linalg.inv(T_pred) @ T_gt
    return (float(np.linalg.norm(D[:3, 3])),
            float(np.sum(np.abs(Rotation.from_matrix(
                D[:3, :3]).as_euler("xyz", degrees=True)))))


def slope(run, k_lo=1, k_hi=5, trials=2):
    ts = {}
    for k in (k_lo, k_hi):
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = run()
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def main():
    from scipy.spatial.transform import Rotation
    from pctpu.core.io import read_velodyne_bin
    from pctpu.register.icp import icp_fixed_iters_banded_mega

    print("backend:", jax.default_backend(), flush=True)
    src = read_velodyne_bin(REFERENCE_BIN)          # [124668, 3]
    rng = np.random.default_rng(0)
    R = Rotation.from_rotvec([0.01, 0.02, 0.05]).as_matrix().astype(
        np.float32)
    t = np.array([0.5, -0.3, 0.1], np.float32)
    dst = (src @ R.T + t + rng.normal(scale=0.01, size=src.shape)).astype(
        np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t

    s = jnp.asarray(src)
    d = jnp.asarray(dst)
    mask = jnp.ones((src.shape[0],), bool)

    for (ci, pi, blk, wb, qt, tag) in [
            (47, 3, 2048, 2, 1024, "47+3 b2k wb2 q1k"),
            (48, 2, 2048, 2, 1024, "48+2 b2k wb2 q1k"),
            (48, 2, 2048, 1, 1024, "48+2 b2k wb1 q1k"),
            (48, 2, 2048, 2, 2048, "48+2 b2k wb2 q2k"),
            (48, 2, 4096, 1, 2048, "48+2 b4k wb1 q2k"),
            (50, 0, 2048, 2, 1024, "50+0 b2k wb2 q1k")]:
        def run(ci=ci, pi=pi, blk=blk, wb=wb, qt=qt):
            return icp_fixed_iters_banded_mega(
                s, mask, d, mask, coarse_iters=ci, polish_iters=pi,
                dist_thresh=5.0, block=blk, window_blocks=wb,
                query_tile=qt)
        try:
            T = np.asarray(run())
            rte, rre = rte_rre(T, T_gt)
            gated = rte < 2.0 and rre < 5.0
            dt = slope(run)
            iters = ci + pi
            print(f"{tag}: {dt*1e3:7.1f} ms/solve -> {iters/dt:7.1f} "
                  f"iters/s  gated={gated} rte={rte:.4f} rre={rre:.3f}",
                  flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
