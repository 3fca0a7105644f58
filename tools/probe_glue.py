#!/usr/bin/env python
"""TPU probe: split the fused-ICP per-iteration cost into (a) the Pallas
kernel and (b) the XLA glue (transform apply + LUT offsets + 3x3 polar
solve). Window-size sweeps were flat, so the window work is NOT the
bottleneck; this decides what to attack next."""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import load_pair, COARSE_ITERS, DIST_THRESH  # noqa: E402


def timeit(fn, reps=8):
    import jax.numpy as jnp
    out = fn()
    np.asarray(jnp.sum(out))
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    for o in outs:
        np.asarray(jnp.sum(o))
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from pctpu.core import se3
    from pctpu.ops.pallas_banded import build_banded, icp_moments_banded
    from pctpu.register.procrustes import procrustes_from_moments

    src, dst, T_gt = load_pair()
    s, d = jnp.asarray(src), jnp.asarray(dst)
    n = s.shape[0]
    mask = jnp.ones((n,), bool)
    bdb = build_banded(d, mask, block=2048)
    svals = jnp.take_along_axis(
        s, jnp.broadcast_to(bdb.axis[None, None], (n, 1)), axis=1)[:, 0]
    sorder = jnp.argsort(svals)
    src_s = s[sorder]

    kern = partial(icp_moments_banded, bdb, dist_thresh=DIST_THRESH,
                   block=2048, window_blocks=2, query_tile=512,
                   tiles_per_step=2)

    @jax.jit
    def full_loop():
        def body(_, T):
            src_t = se3.apply_transform(T, src_s)
            m16 = kern(src_t, mask)
            R, t = procrustes_from_moments(m16, solver="polar")
            return se3.make_transform(R, t) @ T
        return jax.lax.fori_loop(0, COARSE_ITERS, body, jnp.eye(4))

    @jax.jit
    def kernel_only_loop():
        # keep the sequential dependency, skip the solver: T update from a
        # trivial function of m16
        def body(_, carry):
            T, acc = carry
            src_t = se3.apply_transform(T, src_s)
            m16 = kern(src_t, mask)
            T = T + 0.0 * m16[0, 0]
            return T, acc + m16
        _, acc = jax.lax.fori_loop(
            0, COARSE_ITERS, body, (jnp.eye(4), jnp.zeros((4, 4))))
        return acc

    @jax.jit
    def glue_only_loop():
        # skip the kernel: m16 from a cheap full-array reduction that still
        # depends on src_t
        def body(_, T):
            src_t = se3.apply_transform(T, src_s)
            v = jnp.sum(src_t, axis=0)
            m16 = (jnp.eye(4) * 1000.0
                   + jnp.outer(jnp.append(v * 1e-6, 1.0),
                               jnp.append(v * 1e-6, 1.0)))
            R, t = procrustes_from_moments(m16, solver="polar")
            return se3.make_transform(R, t * 0.0) @ T
        return jax.lax.fori_loop(0, COARSE_ITERS, body, jnp.eye(4))

    for name, fn in (("full", full_loop), ("kernel-only", kernel_only_loop),
                     ("glue-only", glue_only_loop)):
        t0 = time.perf_counter()
        try:
            dt = timeit(fn)
            print(f"{name:12s}: {dt*1e3:7.2f} ms/run "
                  f"({dt/COARSE_ITERS*1e3:6.3f} ms/iter, compile "
                  f"{time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
