#!/usr/bin/env python
"""TPU probe: fused banded ICP tiles_per_step sweep (VERDICT r2 task #3).

Multi-tile query batching per grid step amortizes the fixed per-grid-step
latency that bounded the round-2 kernel (README roofline note). Mirrors
bench.py workload 1 (16,384-pt KITTI subsample, 45 coarse iters).
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

    configs = [
        # (tiles_per_step, query_tile, block, window_blocks)
        (1, 512, 2048, 2),
        (2, 512, 2048, 2),
        (4, 512, 2048, 2),
        (8, 512, 2048, 2),
        (4, 256, 2048, 2),
        (8, 256, 1024, 4),
        (16, 512, 2048, 2),
    ]
    for tps, qt, blk, wb in configs:
        def run():
            return icp_fixed_iters_banded_fused(
                s, mask, d, mask, iters=COARSE_ITERS,
                dist_thresh=DIST_THRESH, block=blk, window_blocks=wb,
                query_tile=qt, solver="polar", tiles_per_step=tps)
        try:
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
            print(f"tps={tps} qt={qt} blk={blk} wb={wb}: "
                  f"{COARSE_ITERS / dt:.1f} iters/s ({dt * 1e3:.2f} ms/run, "
                  f"compile {compile_s:.0f}s, RTE={rte:.4f} RRE={rre:.4f})",
                  flush=True)
        except Exception as e:
            print(f"tps={tps} qt={qt} blk={blk} wb={wb}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
