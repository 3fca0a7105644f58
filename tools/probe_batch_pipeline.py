"""Probe: batched full registration pipeline (register_pairs) on TPU.

Measures gated pairs/s for the whole voxel->FPFH->match->RANSAC->mega-ICP
chain vmapped over a pair batch, vs the single-pair path.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from pctpu.core.cloud import PointCloud
from pctpu.register.pipeline import (RegistrationConfig, register_pair,
                                     register_pairs)

REFERENCE_BIN = "/root/reference/Kdtree_Octree/000000.bin"
N_POINTS = 16384
BATCH = 16
ROT_DEG = 35.0


def rte_rre(T_pred, T_gt):
    from scipy.spatial.transform import Rotation
    D = np.linalg.inv(T_pred) @ T_gt
    rte = float(np.linalg.norm(D[:3, 3]))
    rre = float(np.sum(np.abs(
        Rotation.from_matrix(D[:3, :3]).as_euler("xyz", degrees=True))))
    return rte, rre


def make_batch():
    from scipy.spatial.transform import Rotation
    from pctpu.core.io import read_velodyne_bin
    pts = read_velodyne_bin(REFERENCE_BIN)
    rng = np.random.default_rng(2)
    srcs, dsts, gts = [], [], []
    for b in range(BATCH):
        sel = rng.choice(pts.shape[0], N_POINTS, replace=False)
        src = pts[sel]
        rotvec = np.array([0.05, -0.03, np.radians(ROT_DEG)])
        R = Rotation.from_rotvec(rotvec).as_matrix().astype(np.float32)
        t = np.array([3.0, -2.0, 0.5], np.float32)
        dst = (src @ R.T + t + rng.normal(
            scale=0.02, size=src.shape)).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        srcs.append(src)
        dsts.append(dst)
        gts.append(T)
    return (np.stack(srcs), np.stack(dsts), gts)


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
    print("backend:", jax.default_backend())
    srcs, dsts, gts = make_batch()
    src = PointCloud(points=jnp.asarray(srcs),
                     mask=jnp.ones((BATCH, N_POINTS), bool))
    dst = PointCloud(points=jnp.asarray(dsts),
                     mask=jnp.ones((BATCH, N_POINTS), bool))
    cfg = RegistrationConfig()
    ctr = [0]

    def run():
        ctr[0] += 1
        keys = jax.random.split(jax.random.PRNGKey(ctr[0]), BATCH)
        return register_pairs(src, dst, keys=keys, cfg=cfg).T

    t0 = time.perf_counter()
    Ts = np.asarray(run())
    print(f"compile+run: {time.perf_counter()-t0:.1f}s")
    ok = 0
    for i in range(BATCH):
        rte, rre = rte_rre(Ts[i], gts[i])
        good = rte < 2.0 and rre < 5.0
        ok += good
        if not good:
            print(f"  pair {i}: FAIL rte={rte:.3f} rre={rre:.3f}")
    print(f"gated: {ok}/{BATCH}")
    dt = slope(run)
    print(f"batched: {dt*1e3:.1f} ms/batch -> {BATCH/dt:.1f} pairs/s")

    # single-pair comparison
    sp = PointCloud(points=src.points[0], mask=src.mask[0])
    dp = PointCloud(points=dst.points[0], mask=dst.mask[0])

    def run1():
        ctr[0] += 1
        return register_pair(sp, dp, key=jax.random.PRNGKey(ctr[0]),
                             cfg=cfg).T
    np.asarray(run1())
    dt1 = slope(run1)
    print(f"single: {dt1*1e3:.1f} ms/pair -> {1/dt1:.1f} pairs/s")


if __name__ == "__main__":
    main()
