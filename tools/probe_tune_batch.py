"""Tuning probe: ransac (fast sampling), voxel fused-key sort, ICP
full-stage schedule variants, end-to-end register_pairs. One TPU run."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pctpu.core.cloud import PointCloud
from pctpu.register.pipeline import (RegistrationConfig, _cap_uniform_batch,
                                     register_pairs)

REFERENCE_BIN = "/root/reference/Kdtree_Octree/000000.bin"
N_POINTS = 16384
BATCH = 16


def make_batch():
    from scipy.spatial.transform import Rotation
    from pctpu.core.io import read_velodyne_bin
    pts = read_velodyne_bin(REFERENCE_BIN)
    rng = np.random.default_rng(2)
    srcs, dsts, gts = [], [], []
    for b in range(BATCH):
        sel = rng.choice(pts.shape[0], N_POINTS, replace=False)
        src = pts[sel]
        R = Rotation.from_rotvec(
            [0.05, -0.03, np.radians(35.0)]).as_matrix().astype(np.float32)
        t = np.array([3.0, -2.0, 0.5], np.float32)
        dst = (src @ R.T + t + rng.normal(
            scale=0.02, size=src.shape)).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        srcs.append(src)
        dsts.append(dst)
        gts.append(T)
    return np.stack(srcs), np.stack(dsts), gts


def rte_rre(T_pred, T_gt):
    from scipy.spatial.transform import Rotation
    D = np.linalg.inv(T_pred) @ T_gt
    return (float(np.linalg.norm(D[:3, 3])),
            float(np.sum(np.abs(Rotation.from_matrix(
                D[:3, :3]).as_euler("xyz", degrees=True)))))


def scal(out):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))


def slope(g, args, k_lo=2, k_hi=8, trials=2):
    np.asarray(g(*args))
    ts = {}
    for k in (k_lo, k_hi):
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(k):
                out = g(*args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def bench(name, fn, args, **kw):
    g = jax.jit(lambda *a: scal(fn(*a)))
    dt = slope(g, args, **kw)
    print(f"{name:34s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    srcs, dsts, gts = make_batch()
    src = PointCloud(points=jnp.asarray(srcs),
                     mask=jnp.ones((BATCH, N_POINTS), bool))
    dst = PointCloud(points=jnp.asarray(dsts),
                     mask=jnp.ones((BATCH, N_POINTS), bool))
    cfg = RegistrationConfig()
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)

    from pctpu.ops.voxel import voxel_downsample_batch
    from pctpu.register.icp import icp_fixed_iters_banded_mega_batch
    from pctpu.register.ransac import ransac_registration

    def vox(p, m):
        return _cap_uniform_batch(
            voxel_downsample_batch(p, m, cfg.voxel_size),
            cfg.downsample_capacity)
    bench("voxel+cap fusedkey (1 cloud)", vox, (src.points, src.mask))

    down, _ = jax.jit(vox)(src.points, src.mask)
    ddown, _ = jax.jit(vox)(dst.points, dst.mask)

    for h in (8192, 4096, 2048):
        bench(f"ransac vmap H={h}", lambda s, d, v, k, h=h: jax.vmap(
            lambda si, di, vi, ki: ransac_registration(
                si, di, corr_valid=vi, key=ki, dist_thresh=cfg.ransac_dist,
                num_hypotheses=h))(s, d, v, k),
            (down.points, ddown.points, down.mask, keys))

    rrT = jnp.tile(jnp.eye(4, dtype=jnp.float32), (BATCH, 1, 1))
    for (ci, wb, blk, qt, tag) in [
            (5, 2, 1024, 1024, "5it wb2 b1k q1k"),
            (3, 2, 1024, 1024, "3it wb2 b1k q1k"),
            (3, 1, 2048, 2048, "3it wb1 b2k q2k"),
            (5, 1, 2048, 1024, "5it wb1 b2k q1k")]:
        bench(f"icp full {tag}", lambda sp, sm, dp, dm, t, ci=ci, wb=wb,
              blk=blk, qt=qt: icp_fixed_iters_banded_mega_batch(
                  sp, sm, dp, dm, init_T=t, coarse_iters=ci,
                  polish_iters=0, dist_thresh=cfg.icp_dist_thresh,
                  block=blk, window_blocks=wb, query_tile=qt),
              (src.points, src.mask, dst.points, dst.mask, rrT))

    # end-to-end with tuned knobs
    for (vox_it, full_it, tag) in [(40, 5, "40/5"), (30, 3, "30/3")]:
        cfg2 = RegistrationConfig(icp_voxel_iters=vox_it,
                                  icp_full_iters=full_it)

        def run(s, d, k, cfg2=cfg2):
            return register_pairs(s, d, keys=k, cfg=cfg2).T

        g = jax.jit(run)
        Ts = np.asarray(g(src, dst, keys))
        ok = sum(1 for i in range(BATCH)
                 if rte_rre(Ts[i], gts[i]) < (2.0, 5.0))
        worst = max(rte_rre(Ts[i], gts[i])[0] for i in range(BATCH))
        dt = slope(g, (src, dst, keys), k_lo=1, k_hi=5)
        print(f"e2e {tag}: {dt*1e3:7.1f} ms/batch -> "
              f"{BATCH/dt:7.1f} pairs/s  gated={ok}/{BATCH} "
              f"worst_rte={worst:.4f}", flush=True)


if __name__ == "__main__":
    main()
