"""Stage timings of the BATCHED full pipeline on TPU (r4 batch-native
front end): voxel batch, dense FPFH, match, RANSAC, multiscale ICP, stats."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pctpu.core.cloud import PointCloud
from pctpu.register.pipeline import (RegistrationConfig, _cap_uniform_batch,
                                     _icp_stats_subsampled)

REFERENCE_BIN = "/root/reference/Kdtree_Octree/000000.bin"
N_POINTS = 16384
BATCH = 16


def make_batch():
    from scipy.spatial.transform import Rotation
    from pctpu.core.io import read_velodyne_bin
    pts = read_velodyne_bin(REFERENCE_BIN)
    rng = np.random.default_rng(2)
    srcs, dsts = [], []
    for b in range(BATCH):
        sel = rng.choice(pts.shape[0], N_POINTS, replace=False)
        src = pts[sel]
        R = Rotation.from_rotvec(
            [0.05, -0.03, np.radians(35.0)]).as_matrix().astype(np.float32)
        dst = (src @ R.T + np.array([3.0, -2.0, 0.5], np.float32)
               + rng.normal(scale=0.02, size=src.shape)).astype(np.float32)
        srcs.append(src)
        dsts.append(dst)
    return np.stack(srcs), np.stack(dsts)


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
    print(f"{name:30s} {dt*1e3:8.1f} ms  ({dt*1e3/BATCH:6.2f} ms/pair)",
          flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    srcs, dsts = make_batch()
    src = PointCloud(points=jnp.asarray(srcs),
                     mask=jnp.ones((BATCH, N_POINTS), bool))
    dst = PointCloud(points=jnp.asarray(dsts),
                     mask=jnp.ones((BATCH, N_POINTS), bool))
    cfg = RegistrationConfig()
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)

    from pctpu.features.fpfh_dense import fpfh_dense, normals_radius_dense
    from pctpu.features.matching import match_features
    from pctpu.ops.gather import gather_points
    from pctpu.ops.voxel import voxel_downsample_batch
    from pctpu.register.icp import icp_fixed_iters_banded_mega_batch
    from pctpu.register.ransac import ransac_registration

    def vox(p, m):
        return _cap_uniform_batch(
            voxel_downsample_batch(p, m, cfg.voxel_size),
            cfg.downsample_capacity)
    bench("voxel+cap (1 cloud)", vox, (src.points, src.mask))

    down, _ = jax.jit(vox)(src.points, src.mask)
    ddown, _ = jax.jit(vox)(dst.points, dst.mask)
    bench("normals dense (1 cloud)",
          lambda p, m: normals_radius_dense(p, m, radius=cfg.normal_radius),
          (down.points, down.mask))
    bench("fpfh dense (1 cloud)",
          lambda p, m: fpfh_dense(p, mask=m, radius=cfg.feature_radius,
                                  normal_radius=cfg.normal_radius),
          (down.points, down.mask))

    f1 = jax.jit(lambda p, m: fpfh_dense(
        p, mask=m, radius=cfg.feature_radius,
        normal_radius=cfg.normal_radius))(down.points, down.mask)
    f2 = jax.jit(lambda p, m: fpfh_dense(
        p, mask=m, radius=cfg.feature_radius,
        normal_radius=cfg.normal_radius))(ddown.points, ddown.mask)
    mm = jax.jit(lambda a, c, ma, mb: jax.vmap(
        lambda ai, ci, mai, mbi: match_features(
            ai, ci, src_mask=mai, dst_mask=mbi, mutual=True))(
        a, c, ma, mb))(f1, f2, down.mask, ddown.mask)
    bench("match vmap", lambda a, c, ma, mb: jax.vmap(
        lambda ai, ci, mai, mbi: match_features(
            ai, ci, src_mask=mai, dst_mask=mbi, mutual=True))(a, c, ma, mb),
        (f1, f2, down.mask, ddown.mask))

    dst_kp = gather_points(ddown.points, mm.dst_idx)
    bench("ransac vmap", lambda s, d, v, k: jax.vmap(
        lambda si, di, vi, ki: ransac_registration(
            si, di, corr_valid=vi, key=ki, dist_thresh=cfg.ransac_dist,
            num_hypotheses=cfg.ransac_hypotheses))(s, d, v, k),
        (down.points, dst_kp, mm.valid, keys))

    rrT = jnp.tile(jnp.eye(4, dtype=jnp.float32), (BATCH, 1, 1))
    bench("icp voxel 40it", lambda sp, sm, dp, dm, t: (
        icp_fixed_iters_banded_mega_batch(
            sp, sm, dp, dm, init_T=t, coarse_iters=cfg.icp_voxel_iters,
            polish_iters=0, dist_thresh=cfg.icp_dist_thresh, block=512,
            window_blocks=4, query_tile=512)),
        (down.points, down.mask, ddown.points, ddown.mask, rrT))
    bench("icp full 5it wb2", lambda sp, sm, dp, dm, t: (
        icp_fixed_iters_banded_mega_batch(
            sp, sm, dp, dm, init_T=t, coarse_iters=cfg.icp_full_iters,
            polish_iters=0, dist_thresh=cfg.icp_dist_thresh, block=1024,
            window_blocks=cfg.icp_full_window_blocks, query_tile=1024)),
        (src.points, src.mask, dst.points, dst.mask, rrT))
    bench("stats subsampled", lambda t, s, d: jax.vmap(
        lambda ti, si, di: _icp_stats_subsampled(ti, si, di, cfg))(t, s, d),
        (rrT, src, dst))


if __name__ == "__main__":
    main()
