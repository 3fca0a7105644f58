#!/usr/bin/env python
"""North-star benchmark: ICP iterations/sec/chip on the reference's real
KITTI scan (BASELINE.json metric 1).

Workload: point-to-point ICP between the KITTI scan
(/root/reference/Kdtree_Octree/000000.bin, 124,668 pts) voxel-downsampled to
~16k points and a perturbed copy — the `icp_template.py` path of the
reference, whose hot loop is a Python for over KDTreeFlann queries
(`Registration/main.py:116-121`). Ours is one MXU-tiled 1-NN + Procrustes per
iteration inside a single jitted lax.fori_loop.

Baseline: the same ICP iteration implemented the reference's way, charitably
vectorized (scipy cKDTree batch query + NumPy Procrustes — strictly faster
than the reference's per-point Python loop), measured in-process on the same
data. vs_baseline = ours / baseline (speedup factor).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

REFERENCE_BIN = "/root/reference/Kdtree_Octree/000000.bin"
N_POINTS = 16384
ICP_ITERS = 50
DIST_THRESH = 5.0


def load_pair():
    from pctpu.core.io import read_velodyne_bin
    from scipy.spatial.transform import Rotation

    if os.path.exists(REFERENCE_BIN):
        pts = read_velodyne_bin(REFERENCE_BIN)
    else:  # synthetic fallback
        pts = np.random.default_rng(0).uniform(-40, 40, (120000, 3)).astype(np.float32)

    rng = np.random.default_rng(0)
    sel = rng.choice(pts.shape[0], N_POINTS, replace=False)
    src = pts[sel]
    R = Rotation.from_rotvec([0.01, 0.02, 0.05]).as_matrix().astype(np.float32)
    t = np.array([0.5, -0.3, 0.1], np.float32)
    dst = (src @ R.T + t + rng.normal(scale=0.01, size=src.shape)).astype(np.float32)
    return src, dst


def bench_ours(src, dst):
    import jax
    import jax.numpy as jnp
    from pctpu.register.icp import icp_fixed_iters, icp_fixed_iters_banded

    s, d = jnp.asarray(src), jnp.asarray(dst)
    mask = jnp.ones((src.shape[0],), bool)
    coarse = ICP_ITERS * 9 // 10

    def run():
        # hybrid schedule: banded sorted-window association for the coarse
        # iterations, exact VMEM-resident brute 1-NN for the final polish
        T1 = icp_fixed_iters_banded(s, mask, d, mask, iters=coarse,
                                    dist_thresh=DIST_THRESH, block=2048,
                                    window_blocks=2)
        return icp_fixed_iters(s, mask, d, mask, init_T=T1,
                               iters=ICP_ITERS - coarse,
                               dist_thresh=DIST_THRESH, query_chunk=2048)

    np.asarray(run())  # compile + warmup (host fetch = true sync; the axon
    # tunnel's block_until_ready does not actually block)
    reps = 5
    t0 = time.perf_counter()
    outs = [run() for _ in range(reps)]  # dispatched back-to-back
    T = np.asarray(outs[-1])
    for o in outs[:-1]:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / reps
    return ICP_ITERS / dt, T


def bench_reference_equivalent(src, dst):
    """One reference-style ICP iteration: cKDTree 1-NN + Procrustes SVD."""
    from scipy.spatial import cKDTree

    tree = cKDTree(dst)
    T = np.eye(4, dtype=np.float64)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        src_t = src @ T[:3, :3].T + T[:3, 3]
        dd, idx = tree.query(src_t, k=1)
        keep = dd < DIST_THRESH
        A, B = src_t[keep], dst[idx[keep]]
        ac, bc = A.mean(0), B.mean(0)
        H = (B - bc).T @ (A - ac)
        U, _, Vt = np.linalg.svd(H)
        R = U @ Vt
        t = bc - R @ ac
        dT = np.eye(4)
        dT[:3, :3] = R
        dT[:3, 3] = t
        T = dT @ T
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


def main():
    src, dst = load_pair()
    ours_ips, T = bench_ours(src, dst)
    base_ips = bench_reference_equivalent(src, dst)
    out = {
        "metric": "icp_iters_per_sec_per_chip",
        "value": round(ours_ips, 2),
        "unit": "iters/s",
        "vs_baseline": round(ours_ips / base_ips, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
