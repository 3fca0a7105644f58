#!/usr/bin/env python
"""Isolate the mega-kernel per-iteration cost: newton_iters effect, iters
slope, and window/tile scaling."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    from bench import load_pair, DIST_THRESH
    from pctpu.register.icp import icp_fixed_iters_banded_mega

    src, dst, _ = load_pair()
    s, d = jnp.asarray(src), jnp.asarray(dst)
    mask = jnp.ones((src.shape[0],), bool)

    # (coarse, polish, blk, wb, qt, newton)
    configs = [
        (1, 0, 512, 4, 256, 6),
        (10, 0, 512, 4, 256, 6),
        (50, 0, 512, 4, 256, 6),
        (100, 0, 512, 4, 256, 6),
        (50, 0, 512, 4, 256, 1),
        (50, 0, 512, 2, 256, 6),
        (50, 0, 256, 2, 256, 6),
    ]
    for ci, pi, blk, wb, qt, nw in configs:
        def run():
            return icp_fixed_iters_banded_mega(
                s, mask, d, mask, coarse_iters=ci, polish_iters=pi,
                dist_thresh=DIST_THRESH, block=blk, window_blocks=wb,
                query_tile=qt, newton_iters=nw)
        np.asarray(run())
        reps = 10
        t0 = time.perf_counter()
        outs = [run() for _ in range(reps)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / reps
        print(f"c={ci} blk={blk} wb={wb} qt={qt} newton={nw}: "
              f"{dt*1e3:.2f} ms/run = {dt*1e6/max(ci+pi,1):.1f} us/iter",
              flush=True)


if __name__ == "__main__":
    main()
