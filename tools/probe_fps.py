#!/usr/bin/env python
"""TPU probe: pallas FPS vs XLA-loop FPS; ball_query top_k variants.

SA1 stage costs (probe_ball_stages, v5e): fps ~13 ms real, ball_query
~16 ms real for (B=16, N=4096, M=512, K=64). Targets of VERDICT r2 #5."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=20):
    import jax.numpy as jnp
    out = fn(*args)
    np.asarray(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        np.asarray(jnp.sum(o[0] if isinstance(o, tuple) else o))
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from pctpu.ops.fps import fps
    from pctpu.ops.pallas_fps import fps_pallas
    from pctpu.ops.ball_query import ball_query

    B, N, M, K = 16, 4096, 512, 64
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))

    f_xla = jax.jit(jax.vmap(lambda p: fps(p, M)))
    t = timeit(f_xla, xyz)
    print(f"fps XLA loop    : {t*1e3:7.2f} ms", flush=True)
    f_pl = jax.jit(jax.vmap(lambda p: fps_pallas(p, M)))
    t = timeit(f_pl, xyz)
    print(f"fps pallas      : {t*1e3:7.2f} ms", flush=True)
    a, b = np.asarray(f_xla(xyz)), np.asarray(f_pl(xyz))
    print(f"fps agree       : {(a == b).all()}", flush=True)

    centers = jnp.take_along_axis(xyz, jnp.asarray(b)[..., None], axis=1)

    bq = jax.jit(jax.vmap(lambda c, p: ball_query(c, p, 0.2, K)[0]))
    t = timeit(bq, centers, xyz)
    print(f"ball_query top_k {N}-wide: {t*1e3:7.2f} ms", flush=True)

    from pctpu.ops.pairwise import pairwise_sqdist

    def bq_two_stage(cc, pts):
        r2 = jnp.float32(0.2) ** 2
        d2 = pairwise_sqdist(cc, pts, None)     # [M,N]
        within = d2 < r2
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        mc = jnp.where(within, cols, jnp.int32(2**30))
        # stage 1: K smallest per 512-chunk; stage 2: K smallest of the
        # (N/512)*K survivors — same result, narrower top_k invocations
        mcc = mc.reshape(cc.shape[0], -1, 512)
        s1 = -jax.lax.top_k(-mcc, K)[0]         # [M, N/512, K]
        s1 = s1.reshape(cc.shape[0], -1)
        out = -jax.lax.top_k(-s1, K)[0]
        cnt = jnp.sum(within, axis=1).astype(jnp.int32)
        first = jnp.where(cnt > 0, out[:, 0], 0)
        j = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        filled = j < jnp.minimum(cnt, K)[:, None]
        return jnp.where(filled, out, first[:, None])

    bq2 = jax.jit(jax.vmap(bq_two_stage))
    t = timeit(bq2, centers, xyz)
    print(f"ball_query two-stage     : {t*1e3:7.2f} ms", flush=True)
    i1 = np.asarray(bq(centers, xyz))
    i2 = np.asarray(bq2(centers, xyz))
    print(f"ball_query agree: {(i1 == i2).all()}", flush=True)


if __name__ == "__main__":
    main()
