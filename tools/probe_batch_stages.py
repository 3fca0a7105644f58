"""Stage timings of the BATCHED full pipeline on TPU: vmapped front end
(voxel+FPFH+match+RANSAC), batched mega ICP, batched exact stats pass."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pctpu.core.cloud import PointCloud
from pctpu.register.pipeline import RegistrationConfig, _front_end, _icp_stats
from pctpu.register.icp import icp_fixed_iters_banded_mega_batch

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
        rotvec = np.array([0.05, -0.03, np.radians(35.0)])
        R = Rotation.from_rotvec(rotvec).as_matrix().astype(np.float32)
        t = np.array([3.0, -2.0, 0.5], np.float32)
        dst = (src @ R.T + t + rng.normal(
            scale=0.02, size=src.shape)).astype(np.float32)
        srcs.append(src)
        dsts.append(dst)
    return np.stack(srcs), np.stack(dsts)


def timeit(name, fn, n=6):
    out = fn()
    jax.tree.map(np.asarray, out)   # sync
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.tree.map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:30s} {best*1e3:8.1f} ms  ({best*1e3/BATCH:6.2f} ms/pair)")
    return out


def main():
    print("backend:", jax.default_backend())
    srcs, dsts = make_batch()
    src = PointCloud(points=jnp.asarray(srcs),
                     mask=jnp.ones((BATCH, N_POINTS), bool))
    dst = PointCloud(points=jnp.asarray(dsts),
                     mask=jnp.ones((BATCH, N_POINTS), bool))
    cfg = RegistrationConfig()
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)

    front = jax.jit(lambda s, d, k: jax.vmap(
        lambda si, di, ki: _front_end(si, di, ki, cfg))(s, d, k))
    rr, nm, snv, dnv = timeit("front end (all)", lambda: front(src, dst, keys))

    rrT = rr.T

    icp = jax.jit(lambda sp, sm, dp, dm, t0: icp_fixed_iters_banded_mega_batch(
        sp, sm, dp, dm, init_T=t0, coarse_iters=cfg.icp_fixed_coarse,
        polish_iters=cfg.icp_fixed_polish, dist_thresh=cfg.icp_dist_thresh,
        block=1024, window_blocks=1, query_tile=1024))
    T = timeit("mega ICP batch", lambda: icp(
        src.points, src.mask, dst.points, dst.mask, rrT))

    stats = jax.jit(lambda t, s, d: jax.vmap(
        lambda ti, si, di: _icp_stats(ti, si, di, cfg, backend="xla"))(
            t, s, d))
    timeit("stats pass (xla)", lambda: stats(T, src, dst))

    # front-end substages
    from pctpu.ops.voxel import voxel_downsample
    from pctpu.register.pipeline import _cap_uniform
    from pctpu.features.fpfh import fpfh

    vox = jax.jit(lambda p, m: jax.vmap(
        lambda pi, mi: _cap_uniform(voxel_downsample(pi, mi, cfg.voxel_size),
                                    cfg.downsample_capacity))(p, m))
    down, nv = timeit("  voxel+cap (src)", lambda: vox(src.points, src.mask))

    feat = jax.jit(lambda p, m: jax.vmap(
        lambda pi, mi: fpfh(pi, mask=mi, radius=cfg.feature_radius,
                            k_cap=cfg.feature_k_cap,
                            normal_k=cfg.normal_k))(p, m))
    timeit("  fpfh (src)", lambda: feat(down.points, down.mask))

    from pctpu.features.matching import match_features
    f1 = feat(down.points, down.mask)
    match = jax.jit(lambda a, b, ma, mb: jax.vmap(
        lambda ai, bi, mai, mbi: match_features(
            ai, bi, src_mask=mai, dst_mask=mbi, mutual=True))(a, b, ma, mb))
    mm = timeit("  match (self)", lambda: match(f1, f1, down.mask, down.mask))

    from pctpu.register.ransac import ransac_registration
    rans = jax.jit(lambda sk, dk, v, k: jax.vmap(
        lambda s_, d_, v_, k_: ransac_registration(
            s_, d_, corr_valid=v_, key=k_, dist_thresh=cfg.ransac_dist,
            num_hypotheses=cfg.ransac_hypotheses))(sk, dk, v, k))
    dst_kp = jnp.take_along_axis(down.points, mm.dst_idx[..., None], axis=1)
    timeit("  ransac", lambda: rans(down.points, dst_kp, mm.valid, keys))


if __name__ == "__main__":
    main()
