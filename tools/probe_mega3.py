#!/usr/bin/env python
"""Slope-timed sweep of mega-kernel configs with gating."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(fn, k_lo=2, k_hi=22, trials=3):
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
    from bench import load_pair, rte_rre, DIST_THRESH
    import jax.numpy as jnp
    from pctpu.register.icp import icp_fixed_iters_banded_mega

    src, dst, T_gt = load_pair()
    s, d = jnp.asarray(src), jnp.asarray(dst)
    mask = jnp.ones((src.shape[0],), bool)

    configs = [
        (48, 2, 1024, 1, 512),
        (47, 3, 1024, 1, 512),
        (48, 2, 1024, 1, 1024),
        (47, 3, 1024, 1, 1024),
    ]
    for ci, pi, blk, wb, qt in configs:
        def run():
            return icp_fixed_iters_banded_mega(
                s, mask, d, mask, coarse_iters=ci, polish_iters=pi,
                dist_thresh=DIST_THRESH, block=blk, window_blocks=wb,
                query_tile=qt)
        try:
            T = np.asarray(run())
            rte, rre = rte_rre(T, T_gt)
            per = slope(run)
            n = ci + pi
            print(f"c={ci} p={pi} blk={blk:4d} wb={wb} qt={qt}: "
                  f"{per*1e3:6.2f} ms/run = {n/per:7.1f} iters/s  "
                  f"RTE={rte:.4f} RRE={rre:.4f}", flush=True)
        except Exception as e:
            print(f"c={ci} p={pi} blk={blk} wb={wb} qt={qt}: FAILED "
                  f"{type(e).__name__} {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
