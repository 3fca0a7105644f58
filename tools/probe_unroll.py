#!/usr/bin/env python
"""TPU probe: fori_loop unroll factor + window config for the fused ICP
(per-iter cost is op-launch overhead; unrolling lets XLA fuse across
iterations)."""
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
        # (unroll, qt, blk, wb)
        (1, 512, 2048, 2),
        (5, 512, 2048, 2),
        (15, 512, 2048, 2),
        (45, 512, 2048, 2),
        (15, 256, 512, 4),
        (45, 256, 512, 4),
    ]
    for un, qt, blk, wb in configs:
        def run():
            return icp_fixed_iters_banded_fused(
                s, mask, d, mask, iters=COARSE_ITERS,
                dist_thresh=DIST_THRESH, block=blk, window_blocks=wb,
                query_tile=qt, solver="polar", tiles_per_step=2, unroll=un)
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
            print(f"unroll={un} qt={qt} blk={blk} wb={wb}: "
                  f"{COARSE_ITERS/dt:.1f} iters/s ({dt*1e3:.2f} ms/run, "
                  f"compile {compile_s:.0f}s, RTE={rte:.4f} RRE={rre:.4f})",
                  flush=True)
        except Exception as e:
            print(f"unroll={un}: FAILED {type(e).__name__} {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
