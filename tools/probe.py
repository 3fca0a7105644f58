#!/usr/bin/env python
"""pctpu perf probe CLI — one parameterized tool replacing the r2/r3
one-off probe_* scripts (VERDICT r3 item 10).

  python tools/probe.py pipeline    # batched+single registration pairs/s
  python tools/probe.py stages      # per-stage timings, batched pipeline
  python tools/probe.py fullres     # 124,668-pt mega ICP iters/s (gated)
  python tools/probe.py model-step  # model train-step ms (ball|window)
  python tools/probe.py gather      # flat vs vmapped gather micro-bench

All timings are two-point slope measurements (K back-to-back dispatches +
one host fetch at K in {lo, hi}; the slope cancels the axon tunnel's
dispatch/fetch round trip, which `block_until_ready` does NOT cover).
Outputs reduce to one scalar on device so the fetch is 4 bytes.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jaxcache"))

import numpy as np  # noqa: E402

REFERENCE_BIN = "/root/reference/Kdtree_Octree/000000.bin"


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------

def _scal(out):
    import jax
    import jax.numpy as jnp
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))


def slope(run, k_lo=2, k_hi=8, trials=2):
    np.asarray(run())
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


def bench(name, fn, args, **kw):
    import jax
    g = jax.jit(lambda *a: _scal(fn(*a)))
    dt = slope(lambda: g(*args), **kw)
    print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def rte_rre(T_pred, T_gt):
    from scipy.spatial.transform import Rotation
    D = np.linalg.inv(T_pred) @ T_gt
    return (float(np.linalg.norm(D[:3, 3])),
            float(np.sum(np.abs(Rotation.from_matrix(
                D[:3, :3]).as_euler("xyz", degrees=True)))))


def load_scan():
    from pctpu.core.io import read_velodyne_bin
    if os.path.exists(REFERENCE_BIN):
        return read_velodyne_bin(REFERENCE_BIN)
    return np.random.default_rng(0).uniform(
        -40, 40, (120000, 3)).astype(np.float32)


def make_pair_batch(batch, n_points, rot_deg=35.0, seed=2):
    from scipy.spatial.transform import Rotation
    pts = load_scan()
    rng = np.random.default_rng(seed)
    srcs, dsts, gts = [], [], []
    for _ in range(batch):
        sel = rng.choice(pts.shape[0], n_points, replace=False)
        src = pts[sel]
        R = Rotation.from_rotvec(
            [0.05, -0.03, np.radians(rot_deg)]).as_matrix().astype(
            np.float32)
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


# --------------------------------------------------------------------------
# subcommands
# --------------------------------------------------------------------------

def cmd_pipeline(args):
    import jax
    import jax.numpy as jnp
    from pctpu.core.cloud import PointCloud
    from pctpu.register.pipeline import (RegistrationConfig, register_pair,
                                         register_pairs)
    B, N = args.batch, args.points
    print("backend:", jax.default_backend(), flush=True)
    srcs, dsts, gts = make_pair_batch(B, N, args.rot_deg)
    src = PointCloud(points=jnp.asarray(srcs), mask=jnp.ones((B, N), bool))
    dst = PointCloud(points=jnp.asarray(dsts), mask=jnp.ones((B, N), bool))
    cfg = RegistrationConfig()
    ctr = [0]

    def run():
        ctr[0] += 1
        keys = jax.random.split(jax.random.PRNGKey(ctr[0]), B)
        return register_pairs(src, dst, keys=keys, cfg=cfg).T

    t0 = time.perf_counter()
    Ts = np.asarray(run())
    print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    ok = sum(1 for i in range(B)
             if rte_rre(Ts[i], gts[i])[0] < 2.0
             and rte_rre(Ts[i], gts[i])[1] < 5.0)
    print(f"gated: {ok}/{B}")
    dt = slope(run, k_lo=1, k_hi=5)
    print(f"batched: {dt*1e3:.1f} ms/batch -> {B/dt:.1f} pairs/s")

    sp = PointCloud(points=src.points[0], mask=src.mask[0])
    dp = PointCloud(points=dst.points[0], mask=dst.mask[0])

    def run1():
        ctr[0] += 1
        return register_pair(sp, dp, key=jax.random.PRNGKey(ctr[0]),
                             cfg=cfg).T
    np.asarray(run1())
    dt1 = slope(run1, k_lo=1, k_hi=5)
    print(f"single: {dt1*1e3:.1f} ms/pair -> {1/dt1:.1f} pairs/s")


def cmd_stages(args):
    import jax
    import jax.numpy as jnp
    from pctpu.core.cloud import PointCloud
    from pctpu.features.fpfh_dense import fpfh_dense, normals_radius_dense
    from pctpu.features.matching import match_features
    from pctpu.ops.gather import gather_points
    from pctpu.ops.voxel import voxel_downsample_capped
    from pctpu.register.icp import icp_fixed_iters_banded_mega_batch
    from pctpu.register.pipeline import (RegistrationConfig,
                                         _icp_stats_subsampled,
                                         _refine_exact_batch)

    B, N = args.batch, args.points
    print("backend:", jax.default_backend(), flush=True)
    srcs, dsts, _ = make_pair_batch(B, N, args.rot_deg)
    src = PointCloud(points=jnp.asarray(srcs), mask=jnp.ones((B, N), bool))
    dst = PointCloud(points=jnp.asarray(dsts), mask=jnp.ones((B, N), bool))
    cfg = RegistrationConfig()
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def vox(p, m):
        return voxel_downsample_capped(p, m, cfg.voxel_size,
                                       cfg.downsample_capacity)
    bench("voxel capped (1 cloud)", vox, (src.points, src.mask))
    down, _ = jax.jit(vox)(src.points, src.mask)
    ddown, _ = jax.jit(vox)(dst.points, dst.mask)
    bench("normals dense (1 cloud)",
          lambda p, m: normals_radius_dense(p, m, radius=cfg.normal_radius),
          (down.points, down.mask))
    from pctpu.features.pallas_fpfh import fpfh_fused
    bench("fpfh dense (1 cloud)",
          lambda p, m: fpfh_dense(p, mask=m, radius=cfg.feature_radius,
                                  normal_radius=cfg.normal_radius),
          (down.points, down.mask))
    bench("fpfh fused+band (1 cloud)",
          lambda p, m: fpfh_fused(p, mask=m, radius=cfg.feature_radius,
                                  normal_radius=cfg.normal_radius,
                                  x_banded=True, x_slack=cfg.voxel_size),
          (down.points, down.mask))
    feat = jax.jit(lambda p, m: fpfh_fused(
        p, mask=m, radius=cfg.feature_radius,
        normal_radius=cfg.normal_radius, x_banded=True,
        x_slack=cfg.voxel_size))
    f1, f2 = feat(down.points, down.mask), feat(ddown.points, ddown.mask)
    mm = jax.jit(lambda a, c, ma, mb: jax.vmap(
        lambda ai, ci, mai, mbi: match_features(
            ai, ci, src_mask=mai, dst_mask=mbi, mutual=True))(
        a, c, ma, mb))(f1, f2, down.mask, ddown.mask)
    bench("match vmap", lambda a, c, ma, mb: jax.vmap(
        lambda ai, ci, mai, mbi: match_features(
            ai, ci, src_mask=mai, dst_mask=mbi, mutual=True))(a, c, ma, mb),
        (f1, f2, down.mask, ddown.mask))
    dst_kp = gather_points(ddown.points, mm.dst_idx)
    from pctpu.register.ransac import ransac_registration_batch
    bench(f"ransac batch H={cfg.ransac_hypotheses} cap={cfg.ransac_m_cap}",
          lambda s, d, v, k: ransac_registration_batch(
              s, d, v, k, dist_thresh=cfg.ransac_dist,
              num_hypotheses=cfg.ransac_hypotheses,
              m_cap=cfg.ransac_m_cap),
          (down.points, dst_kp, mm.valid, keys))
    rrT = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    bench(f"icp voxel {cfg.icp_voxel_iters}it",
          lambda sp, sm, dp, dm, t: icp_fixed_iters_banded_mega_batch(
              sp, sm, dp, dm, init_T=t, coarse_iters=cfg.icp_voxel_iters,
              polish_iters=0, dist_thresh=cfg.icp_dist_thresh, block=2048,
              window_blocks=1, query_tile=2048),
          (down.points, down.mask, ddown.points, ddown.mask, rrT))
    bench(f"exact refine x{cfg.icp_refine_iters} (mega)",
          lambda t, s, d: _refine_exact_batch(t, s, d, cfg,
                                              backend="mega"),
          (rrT, src, dst))
    bench("stats subsampled", lambda t, s, d: jax.vmap(
        lambda ti, si, di: _icp_stats_subsampled(ti, si, di, cfg))(t, s, d),
        (rrT, src, dst))


def cmd_fullres(args):
    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation
    from pctpu.register.icp import icp_fixed_iters_banded_mega
    print("backend:", jax.default_backend(), flush=True)
    src = load_scan()
    rng = np.random.default_rng(0)
    R = Rotation.from_rotvec([0.01, 0.02, 0.05]).as_matrix().astype(
        np.float32)
    t = np.array([0.5, -0.3, 0.1], np.float32)
    dst = (src @ R.T + t + rng.normal(
        scale=0.01, size=src.shape)).astype(np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t
    s, d = jnp.asarray(src), jnp.asarray(dst)
    mask = jnp.ones((src.shape[0],), bool)

    def run():
        return icp_fixed_iters_banded_mega(
            s, mask, d, mask, coarse_iters=args.iters,
            polish_iters=args.polish, dist_thresh=5.0, block=args.block,
            window_blocks=args.window_blocks, query_tile=args.query_tile)

    t0 = time.perf_counter()
    T = np.asarray(run())
    print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    rte, rre = rte_rre(T, T_gt)
    dt = slope(run, k_lo=1, k_hi=4)
    iters = args.iters + args.polish
    print(f"N={src.shape[0]}: {dt*1e3:.1f} ms/solve -> "
          f"{iters/dt:.1f} iters/s  gated={rte < 2 and rre < 5} "
          f"rte={rte:.4f} rre={rre:.3f}")


def cmd_model_step(args):
    import jax
    import jax.numpy as jnp
    from pctpu.nn.config import TrainConfig
    from pctpu.nn import train as T
    print("backend:", jax.default_backend(), flush=True)
    jobs = [("cls-ssg", 32, 4096, 40), ("semseg-ssg", 16, 4096, 13)]
    for model, B, N, nc in jobs:
        cfg = TrainConfig(model=model, num_classes=nc, num_points=N,
                          batch_size=B, grouping=args.grouping,
                          compute_dtype=args.dtype)
        rng = jax.random.PRNGKey(0)
        feat = 6 if model.startswith("cls") else 9
        pc = jax.random.normal(rng, (B, N, feat))
        labels = (jnp.zeros((B,), jnp.int32) if model.startswith("cls")
                  else jnp.zeros((B, N), jnp.int32))
        mdl, state = T.create_train_state(cfg, rng, pc)
        step = jax.jit(T.make_train_step(mdl, cfg))
        t0 = time.perf_counter()
        state, m = step(state, pc, labels, rng)
        np.asarray(m["loss"])
        compile_s = time.perf_counter() - t0
        holder = {"state": state}

        def run():
            holder["state"], m = step(holder["state"], pc, labels, rng)
            return m["loss"]
        dt = slope(run, k_lo=2, k_hi=8)
        print(f"{model} {args.grouping} {args.dtype} B={B}: "
              f"{dt*1e3:.1f} ms/step (compile {compile_s:.0f}s)",
              flush=True)


def cmd_gather(args):
    import jax
    import jax.numpy as jnp
    from pctpu.ops.gather import group_points
    print("backend:", jax.default_backend(), flush=True)
    B, N, K, C = 16, 2048, 100, 33
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(size=(B, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, N, K)).astype(np.int32))
    bench("group flat-batch", group_points, (pts, idx))
    bench("group vmap", lambda p, i: jax.vmap(
        lambda pi, ii: jnp.take(pi, ii.reshape(-1), axis=0))(p, i),
        (pts, idx))


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("pipeline")
    sp.add_argument("--batch", type=int, default=16)
    sp.add_argument("--points", type=int, default=16384)
    sp.add_argument("--rot-deg", type=float, default=35.0)
    sp = sub.add_parser("stages")
    sp.add_argument("--batch", type=int, default=16)
    sp.add_argument("--points", type=int, default=16384)
    sp.add_argument("--rot-deg", type=float, default=35.0)
    sp = sub.add_parser("fullres")
    sp.add_argument("--iters", type=int, default=48)
    sp.add_argument("--polish", type=int, default=2)
    sp.add_argument("--block", type=int, default=2048)
    sp.add_argument("--window-blocks", type=int, default=2)
    sp.add_argument("--query-tile", type=int, default=1024)
    sp = sub.add_parser("model-step")
    sp.add_argument("--grouping", default="ball",
                    choices=["ball", "window"])
    sp.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    sub.add_parser("gather")
    args = p.parse_args()
    {"pipeline": cmd_pipeline, "stages": cmd_stages,
     "fullres": cmd_fullres, "model-step": cmd_model_step,
     "gather": cmd_gather}[args.cmd](args)


if __name__ == "__main__":
    main()
