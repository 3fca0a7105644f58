#!/usr/bin/env python
"""TPU probe: per-op cost of the semseg-ssg BALL forward at B=16 — which
stage still dominates after the Pallas FPS + fused ball-group kernels."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, k_lo=2, k_hi=22, trials=3):
    """Two-point slope timing: K back-to-back dispatches + one final
    fetch; the slope cancels the fixed tunnel round-trip."""
    def sync(o):
        np.asarray(o[0] if isinstance(o, tuple) else o)
    sync(fn(*args))
    ts = {}
    for k in (k_lo, k_hi):
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn(*args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp
    from pctpu.ops.fps import fps_batched
    from pctpu.ops.pallas_ballgroup import ball_group_pallas_batched
    from pctpu.ops.interpolate import three_nn, three_interpolate

    B = 16
    rng = np.random.default_rng(0)
    # semseg-ssg ladder: (N -> M, radius, K, C_in feature width)
    ladder = [(4096, 1024, 0.1, 32, 9),
              (1024, 256, 0.2, 32, 64),
              (256, 64, 0.4, 32, 128),
              (64, 16, 0.8, 32, 256)]
    total = 0.0
    for (n, m, r, k, c) in ladder:
        xyz = jnp.asarray(rng.uniform(-1, 1, (B, n, 3)).astype(np.float32))
        packed = jnp.asarray(
            rng.normal(size=(B, n, 3 + c)).astype(np.float32))
        f = jax.jit(lambda p: fps_batched(p, m))
        t1 = timeit(f, xyz)
        cidx = f(xyz)
        new_xyz = jnp.take_along_axis(xyz, cidx[..., None], axis=1)
        g = jax.jit(lambda nx, pk: ball_group_pallas_batched(nx, pk, r, k))
        t2 = timeit(g, new_xyz, packed)
        total += t1 + t2
        print(f"SA n={n:5d}->m={m:5d} k={k}: fps {t1*1e3:6.2f} ms, "
              f"fused ball-group {t2*1e3:6.2f} ms", flush=True)
    for (n, m, _, _, c) in reversed(ladder):
        up = jnp.asarray(rng.uniform(-1, 1, (B, n, 3)).astype(np.float32))
        dn = jnp.asarray(rng.uniform(-1, 1, (B, m, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(B, m, c)).astype(np.float32))

        def fp(u, d, ft):
            d2, idx = three_nn(u, d)
            return three_interpolate(ft, idx, d2)
        f = jax.jit(jax.vmap(fp))
        t = timeit(f, up, dn, feats)
        total += t
        print(f"FP m={m:5d}->n={n:5d}: three-nn+interp {t*1e3:6.2f} ms",
              flush=True)
    print(f"sum of grouping/interp stages: {total*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
