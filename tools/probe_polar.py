#!/usr/bin/env python
"""TPU probe: fused banded ICP with solver=svd vs solver=polar.

Decides whether the closed-form Newton-polar Procrustes epilogue
(`pctpu.register.procrustes.rotation_polar3`) beats the iterative SVD
custom call in the fused ICP inner loop (VERDICT round-2 task #1).
Mirrors bench.py workload 1 exactly (16,384-pt KITTI subsample, 45 coarse
iters, block=2048, window_blocks=2).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import load_pair, rte_rre, COARSE_ITERS, DIST_THRESH  # noqa: E402


def main():
    import jax.numpy as jnp
    from pctpu.register.icp import icp_fixed_iters_banded_fused

    src, dst, T_gt = load_pair()
    s, d = jnp.asarray(src), jnp.asarray(dst)
    mask = jnp.ones((src.shape[0],), bool)

    for solver in ("svd", "polar"):
        def run():
            return icp_fixed_iters_banded_fused(
                s, mask, d, mask, iters=COARSE_ITERS,
                dist_thresh=DIST_THRESH, block=2048, window_blocks=2,
                solver=solver)
        t0 = time.perf_counter()
        T = np.asarray(run())
        compile_s = time.perf_counter() - t0
        rte, rre = rte_rre(T, T_gt)
        reps = 8
        t0 = time.perf_counter()
        outs = [run() for _ in range(reps)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / reps
        print(f"{solver}: {COARSE_ITERS / dt:.1f} iters/s  "
              f"({dt * 1e3:.2f} ms/run, compile {compile_s:.0f}s, "
              f"RTE={rte:.4f} RRE={rre:.4f})", flush=True)


if __name__ == "__main__":
    main()
