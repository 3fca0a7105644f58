#!/usr/bin/env python
"""Can the mega kernel vmap over a pair sweep, and at what rate?"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(fn, k_lo=2, k_hi=12, trials=3):
    np.asarray(fn())
    ts = {}
    for k in (k_lo, k_hi):
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn()
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def main():
    from functools import partial
    import jax
    import jax.numpy as jnp
    from bench import (_load_scan, _perturb, rte_rre, PAIR_BATCH,
                       PAIR_POINTS, PAIR_ITERS, DIST_THRESH)
    from pctpu.register.icp import icp_fixed_iters_banded_mega

    pts = _load_scan()
    rng = np.random.default_rng(1)
    srcs, dsts, gts = [], [], []
    for b in range(PAIR_BATCH):
        sel = rng.choice(pts.shape[0], PAIR_POINTS, replace=False)
        src = pts[sel]
        rotvec = rng.uniform(-0.05, 0.05, 3)
        trans = rng.uniform(-0.5, 0.5, 3)
        dst, T = _perturb(src, rng, rotvec, trans)
        srcs.append(src)
        dsts.append(dst)
        gts.append(T)
    s = jnp.asarray(np.stack(srcs))
    d = jnp.asarray(np.stack(dsts))
    m = jnp.ones((PAIR_BATCH, PAIR_POINTS), bool)

    for ci, pi, blk, wb, qt in ((28, 2, 512, 1, 512),
                                (28, 2, 512, 2, 512),
                                (28, 2, 1024, 1, 1024),
                                (18, 2, 512, 2, 512)):
        f = partial(icp_fixed_iters_banded_mega, coarse_iters=ci,
                    polish_iters=pi, dist_thresh=DIST_THRESH, block=blk,
                    window_blocks=wb, query_tile=qt)
        vf = jax.jit(jax.vmap(lambda a, am, b, bm: f(a, am, b, bm)))

        def run():
            return vf(s, m, d, m)
        try:
            Ts = np.asarray(run())
            worst = (0.0, 0.0)
            ok = True
            for i in range(PAIR_BATCH):
                rte, rre = rte_rre(Ts[i], gts[i])
                worst = (max(worst[0], rte), max(worst[1], rre))
                ok = ok and rte < 2.0 and rre < 5.0
            per = slope(run)
            print(f"c={ci} p={pi} blk={blk} wb={wb} qt={qt}: "
                  f"{PAIR_BATCH/per:8.1f} pairs/s  worst RTE={worst[0]:.4f} "
                  f"RRE={worst[1]:.4f} gate={'OK' if ok else 'FAIL'}",
                  flush=True)
        except Exception as e:
            print(f"c={ci} p={pi} blk={blk} wb={wb} qt={qt}: FAILED "
                  f"{type(e).__name__} {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
