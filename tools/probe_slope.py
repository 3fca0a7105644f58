#!/usr/bin/env python
"""TPU probe: fused ICP per-iteration cost via iteration-count slope.

The ~28 ms axon dispatch+fetch floor can mask the true kernel time when a
45-iteration program fits under it; t(iters) for growing iteration counts
separates fixed dispatch cost from per-iteration compute.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import load_pair, rte_rre, DIST_THRESH  # noqa: E402


def main():
    import jax.numpy as jnp
    from pctpu.register.icp import icp_fixed_iters_banded_fused

    src, dst, T_gt = load_pair()
    s, d = jnp.asarray(src), jnp.asarray(dst)
    mask = jnp.ones((src.shape[0],), bool)

    for tps in (2,):
        for iters in (45, 225, 450, 900):
            def run():
                return icp_fixed_iters_banded_fused(
                    s, mask, d, mask, iters=iters,
                    dist_thresh=DIST_THRESH, block=2048, window_blocks=2,
                    query_tile=512, solver="polar", tiles_per_step=tps)
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
            print(f"tps={tps} iters={iters}: {dt*1e3:.2f} ms/run "
                  f"(compile {compile_s:.0f}s, RTE={rte:.4f} "
                  f"RRE={rre:.4f})", flush=True)


if __name__ == "__main__":
    main()
