"""Neighbor-search benchmark CLI.

Re-design of `Kdtree_Octree/lesson2/benchmark.py:16-142` (C6) — including
fixing its transpose bug (`:27` feeds 3xN into N x 3 consumers, SURVEY.md §0):
times build/kNN/radius/brute on the real KITTI scan for our TPU path vs
scipy KDTree, printing the same style of ms table.

Run: python -m pctpu.pipelines.nn_benchmark [--bin PATH] [--n N] [--k K]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

DEFAULT_BIN = "/root/reference/Kdtree_Octree/000000.bin"


def sync(x):
    return np.asarray(x)  # host fetch = true device sync


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bin", default=DEFAULT_BIN)
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--radius", type=float, default=1.0)
    ap.add_argument("--queries", type=int, default=8192)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from pctpu.core.io import read_velodyne_bin
    from pctpu import ops

    import os
    if os.path.exists(args.bin):
        pts = read_velodyne_bin(args.bin)  # (N,3) — transpose bug fixed
    else:
        print(f"note: {args.bin} not found; using a synthetic uniform cloud")
        pts = np.random.default_rng(0).uniform(
            -40, 40, (124668, 3)).astype(np.float32)
    rng = np.random.default_rng(0)
    sel = rng.choice(pts.shape[0], min(args.n, pts.shape[0]), replace=False)
    db = pts[sel]
    q = db[: args.queries]
    dbj, qj = jnp.asarray(db), jnp.asarray(q)

    print(f"db={db.shape[0]} queries={q.shape[0]} k={args.k} "
          f"radius={args.radius}")

    # ours: knn
    sync(ops.knn(qj, dbj, args.k).dist2)  # compile
    t0 = time.perf_counter()
    sync(ops.knn(qj, dbj, args.k).dist2)
    print(f"pctpu knn:      {(time.perf_counter()-t0)*1e3:8.1f} ms")

    # ours: radius
    sync(ops.radius_search(qj, dbj, args.radius, 64).dist2)
    t0 = time.perf_counter()
    sync(ops.radius_search(qj, dbj, args.radius, 64).dist2)
    print(f"pctpu radius:   {(time.perf_counter()-t0)*1e3:8.1f} ms")

    # ours: 1-NN (pallas on TPU)
    sync(ops.nearest(qj, dbj)[0])
    t0 = time.perf_counter()
    sync(ops.nearest(qj, dbj)[0])
    print(f"pctpu 1-NN:     {(time.perf_counter()-t0)*1e3:8.1f} ms")

    # native C++ trees (host side; comparison counters like result_set.py:59)
    from pctpu.native import spatial

    if spatial.available():
        t0 = time.perf_counter()
        kd = spatial.KDTree(db)
        print(f"c++ kd build:   {(time.perf_counter()-t0)*1e3:8.1f} ms "
              f"({kd.node_count} nodes)")
        t0 = time.perf_counter()
        _, _, cmp = kd.knn(q, args.k)
        print(f"c++ kd knn:     {(time.perf_counter()-t0)*1e3:8.1f} ms "
              f"({cmp.mean():.0f} cmp/query)")
        t0 = time.perf_counter()
        kd.radius(q, args.radius, cap=64)
        print(f"c++ kd radius:  {(time.perf_counter()-t0)*1e3:8.1f} ms")
        t0 = time.perf_counter()
        oc = spatial.Octree(db)
        print(f"c++ oct build:  {(time.perf_counter()-t0)*1e3:8.1f} ms "
              f"({oc.node_count} nodes)")
        t0 = time.perf_counter()
        _, _, cmp = oc.knn(q, args.k)
        print(f"c++ oct knn:    {(time.perf_counter()-t0)*1e3:8.1f} ms "
              f"({cmp.mean():.0f} cmp/query)")
        t0 = time.perf_counter()
        oc.radius(q, args.radius, cap=64, fast=True)
        print(f"c++ oct radius: {(time.perf_counter()-t0)*1e3:8.1f} ms "
              f"(contains() fast path)")

    # scipy
    from scipy.spatial import cKDTree
    t0 = time.perf_counter()
    tree = cKDTree(db)
    print(f"scipy build:    {(time.perf_counter()-t0)*1e3:8.1f} ms")
    t0 = time.perf_counter()
    tree.query(q, k=args.k)
    print(f"scipy knn:      {(time.perf_counter()-t0)*1e3:8.1f} ms")
    t0 = time.perf_counter()
    tree.query_ball_point(q, args.radius)
    print(f"scipy radius:   {(time.perf_counter()-t0)*1e3:8.1f} ms")

    # brute force numpy (reference oracle, benchmark.py:65-69)
    qb = q[:256]
    t0 = time.perf_counter()
    d = ((qb[:, None, :] - db[None]) ** 2).sum(-1)
    np.argsort(d, axis=1)
    dt = time.perf_counter() - t0
    print(f"numpy brute:    {dt*1e3*q.shape[0]/qb.shape[0]:8.1f} ms "
          f"(extrapolated)")


if __name__ == "__main__":
    main()
