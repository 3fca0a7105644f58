#!/usr/bin/env python
"""TPU probe: fused ICP window geometry sweep (block size x window_blocks x
query tile). The slope probe showed ~0.537 ms/iter compute-bound in the
VPU passes over the scanned window; smaller windows cut that linearly if
accuracy still gates."""
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
        (512, 2048, 2),   # round-2 baseline, window 4096
        (512, 1024, 2),   # window 2048
        (256, 1024, 2),   # window 2048, finer centering
        (1024, 1024, 2),  # window 2048, wider tiles
        (256, 512, 2),    # window 1024
        (256, 512, 4),    # window 2048, fine blocks
        (512, 256, 4),    # window 1024, fine blocks
    ]
    for qt, blk, wb in configs:
        def run():
            return icp_fixed_iters_banded_fused(
                s, mask, d, mask, iters=COARSE_ITERS,
                dist_thresh=DIST_THRESH, block=blk, window_blocks=wb,
                query_tile=qt, solver="polar", tiles_per_step=2)
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
            print(f"qt={qt} blk={blk} wb={wb}: {COARSE_ITERS/dt:.1f} iters/s "
                  f"({dt*1e3:.2f} ms/run, compile {compile_s:.0f}s, "
                  f"RTE={rte:.4f} RRE={rre:.4f})", flush=True)
        except Exception as e:
            print(f"qt={qt} blk={blk} wb={wb}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
