#!/usr/bin/env python
"""Mega-kernel ICP: interpret-mode correctness + TPU perf sweep."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def correctness():
    import jax.numpy as jnp
    from bench import load_pair, rte_rre
    from pctpu.register.icp import icp_fixed_iters_banded_mega

    src, dst, T_gt = load_pair()
    n = 2048
    s = jnp.asarray(src[:n])
    d = jnp.asarray(dst[:n])
    mask = jnp.ones((n,), bool)
    T = np.asarray(icp_fixed_iters_banded_mega(
        s, mask, d, mask, coarse_iters=20, polish_iters=5,
        dist_thresh=5.0, block=512, window_blocks=4, query_tile=256,
        interpret=True))
    rte, rre = rte_rre(T, T_gt)
    print(f"interpret: RTE={rte:.4f} RRE={rre:.4f}")
    assert rte < 2.0 and rre < 5.0, "mega ICP fails the bound in interpret"
    print("interpret OK")


def perf():
    import jax.numpy as jnp
    from bench import load_pair, rte_rre, DIST_THRESH
    from pctpu.register.icp import icp_fixed_iters_banded_mega

    src, dst, T_gt = load_pair()
    s, d = jnp.asarray(src), jnp.asarray(dst)
    mask = jnp.ones((src.shape[0],), bool)

    configs = [
        (45, 5, 512, 4, 256),
        (45, 5, 512, 4, 512),
        (45, 5, 512, 6, 512),
        (45, 5, 1024, 2, 256),
        (45, 5, 512, 6, 1024),
        (50, 0, 512, 4, 256),
    ]
    for ci, pi, blk, wb, qt in configs:
        def run():
            return icp_fixed_iters_banded_mega(
                s, mask, d, mask, coarse_iters=ci, polish_iters=pi,
                dist_thresh=DIST_THRESH, block=blk, window_blocks=wb,
                query_tile=qt)
        try:
            t0 = time.perf_counter()
            T = np.asarray(run())
            compile_s = time.perf_counter() - t0
            rte, rre = rte_rre(T, T_gt)
            reps = 10
            t0 = time.perf_counter()
            outs = [run() for _ in range(reps)]
            for o in outs:
                np.asarray(o)
            dt = (time.perf_counter() - t0) / reps
            iters = ci + pi
            print(f"mega c={ci} p={pi} blk={blk} wb={wb} qt={qt}: "
                  f"{iters/dt:.1f} iters/s ({dt*1e3:.2f} ms/run, compile "
                  f"{compile_s:.0f}s, RTE={rte:.4f} RRE={rre:.4f})",
                  flush=True)
        except Exception as e:
            print(f"mega c={ci} p={pi} blk={blk} wb={wb} qt={qt}: FAILED "
                  f"{type(e).__name__} {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    if "--perf" in sys.argv:
        perf()
    else:
        correctness()
