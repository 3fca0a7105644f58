#!/usr/bin/env python
"""TPU probe: fused ICP v2 (in-kernel transform + offsets) vs v1."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import load_pair, rte_rre, COARSE_ITERS, DIST_THRESH  # noqa: E402


def main():
    import jax.numpy as jnp
    from pctpu.register.icp import (icp_fixed_iters_banded_fused,
                                    icp_fixed_iters_banded_fused_v2)

    src, dst, T_gt = load_pair()
    s, d = jnp.asarray(src), jnp.asarray(dst)
    mask = jnp.ones((src.shape[0],), bool)

    configs = [
        ("v1", icp_fixed_iters_banded_fused, 1, 256, 512, 4, {"tiles_per_step": 2}),
        ("v2", icp_fixed_iters_banded_fused_v2, 1, 256, 512, 4, {}),
        ("v2", icp_fixed_iters_banded_fused_v2, 15, 256, 512, 4, {}),
        ("v2", icp_fixed_iters_banded_fused_v2, 1, 512, 2048, 2, {}),
        ("v2", icp_fixed_iters_banded_fused_v2, 15, 512, 1024, 2, {}),
        ("v2", icp_fixed_iters_banded_fused_v2, 15, 512, 512, 4, {}),
    ]
    for name, fn, un, qt, blk, wb, extra in configs:
        def run():
            return fn(s, mask, d, mask, iters=COARSE_ITERS,
                      dist_thresh=DIST_THRESH, block=blk, window_blocks=wb,
                      query_tile=qt, solver="polar", unroll=un, **extra)
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
            print(f"{name} unroll={un} qt={qt} blk={blk} wb={wb}: "
                  f"{COARSE_ITERS/dt:.1f} iters/s ({dt*1e3:.2f} ms/run, "
                  f"compile {compile_s:.0f}s, RTE={rte:.4f} RRE={rre:.4f})",
                  flush=True)
        except Exception as e:
            print(f"{name} unroll={un} qt={qt} blk={blk} wb={wb}: FAILED "
                  f"{type(e).__name__} {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
