#!/usr/bin/env python
"""Slope-timing through the axon tunnel: time K back-to-back dispatches
with ONE final sync for K in {2, 22}; slope = true per-call device time,
intercept = tunnel latency."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(fn, sync, k_lo=2, k_hi=22, trials=3):
    sync(fn())  # warmup/compile
    ts = {}
    for k in (k_lo, k_hi):
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    per = (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)
    return per, ts[k_lo] - k_lo * per


def main():
    import jax
    import jax.numpy as jnp
    from bench import load_pair, DIST_THRESH
    from pctpu.ops.pallas_banded import build_banded
    from pctpu.register.icp import (icp_fixed_iters_banded_mega,
                                    icp_fixed_iters_banded_fused)

    src, dst, _ = load_pair()
    s, d = jnp.asarray(src), jnp.asarray(dst)
    mask = jnp.ones((src.shape[0],), bool)
    tiny = jnp.ones((4, 4), jnp.float32)

    @jax.jit
    def trivial(x):
        return x * 2.0

    per, lat = slope(lambda: trivial(tiny), np.asarray)
    print(f"trivial:        {per*1e3:7.3f} ms/call (latency {lat*1e3:.1f} ms)")

    @jax.jit
    def just_sort(x):
        return jnp.argsort(x[:, 0])[:8]

    per, lat = slope(lambda: just_sort(d), np.asarray)
    print(f"argsort 16k:    {per*1e3:7.3f} ms/call (latency {lat*1e3:.1f} ms)")

    per, lat = slope(lambda: build_banded(d, mask, block=512),
                     lambda o: np.asarray(o.lut))
    print(f"build_banded:   {per*1e3:7.3f} ms/call (latency {lat*1e3:.1f} ms)")

    for ci, pi in ((1, 0), (45, 5), (95, 5)):
        def run():
            return icp_fixed_iters_banded_mega(
                s, mask, d, mask, coarse_iters=ci, polish_iters=pi,
                dist_thresh=DIST_THRESH, block=512, window_blocks=4,
                query_tile=256)
        per, lat = slope(run, np.asarray)
        n = ci + pi
        print(f"mega c={ci:3d} p={pi}: {per*1e3:7.3f} ms/call "
              f"({per*1e6/n:6.1f} us/iter, latency {lat*1e3:.1f} ms)")

    def runf():
        return icp_fixed_iters_banded_fused(
            s, mask, d, mask, iters=45, dist_thresh=DIST_THRESH,
            block=2048, window_blocks=2)
    per, lat = slope(runf, np.asarray)
    print(f"fused v1 c=45:  {per*1e3:7.3f} ms/call ({per*1e6/45:6.1f} us/iter,"
          f" latency {lat*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
