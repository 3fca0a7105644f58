#!/usr/bin/env python
"""TPU probe: per-stage cost of the ball-grouping SA path (cls-ssg SA1+SA2
shapes, B=16, N=4096) — decide what a fused kernel must attack.

Each stage is timed as a separate jitted program over `reps` chained
dispatches (axon: sync via host fetch of a small reduction)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=8):
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
    from pctpu.ops.fps import fps
    from pctpu.ops.ball_query import ball_query
    from pctpu.ops.gather import group_points, gather_points

    B, N, M, K = 16, 4096, 512, 64
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, N, 64)).astype(np.float32))

    fps_b = jax.jit(jax.vmap(lambda p: fps(p, M)))
    t = timeit(fps_b, xyz)
    print(f"fps         [B={B},N={N}->M={M}]: {t*1e3:7.2f} ms", flush=True)
    cidx = fps_b(xyz)

    gp = jax.jit(gather_points)
    t = timeit(gp, xyz, cidx)
    print(f"gather_ctrs [B,{M}]             : {t*1e3:7.2f} ms", flush=True)
    new_xyz = gp(xyz, cidx)

    bq = jax.jit(jax.vmap(lambda c, p: ball_query(c, p, 0.2, K)[0]))
    t = timeit(bq, new_xyz, xyz)
    print(f"ball_query  [{M}x{N}, K={K}]    : {t*1e3:7.2f} ms", flush=True)
    idx = bq(new_xyz, xyz)

    gr = jax.jit(group_points)
    t = timeit(gr, xyz, idx)
    print(f"group_xyz   [B,{M},{K},3]       : {t*1e3:7.2f} ms", flush=True)
    t = timeit(gr, feats, idx)
    print(f"group_feats [B,{M},{K},64]      : {t*1e3:7.2f} ms", flush=True)

    # MLP-equivalent MXU work: [B,M,K,67] -> 64 -> 64 -> 128
    w1 = jnp.asarray(rng.normal(size=(67, 64)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, M, K, 67)).astype(np.float32))

    @jax.jit
    def mlp(g):
        h = jax.nn.relu(g @ w1)
        h = jax.nn.relu(h @ w2)
        return jnp.max(jax.nn.relu(h @ w3), axis=2)

    t = timeit(mlp, g)
    print(f"mlp+max     [B,{M},{K},67->128] : {t*1e3:7.2f} ms", flush=True)

    # combined ball-path SA1 analogue in ONE program
    @jax.jit
    def sa1(xyz, feats):
        ci = jax.vmap(lambda p: fps(p, M))(xyz)
        nx = gather_points(xyz, ci)
        ix = jax.vmap(lambda c, p: ball_query(c, p, 0.2, K)[0])(nx, xyz)
        gx = group_points(xyz, ix) - nx[:, :, None, :]
        gf = group_points(feats, ix)
        g = jnp.concatenate([gx, gf], axis=-1)
        h = jax.nn.relu(g @ w1)
        h = jax.nn.relu(h @ w2)
        return jnp.max(jax.nn.relu(h @ w3), axis=2)

    t = timeit(sa1, xyz, feats)
    print(f"SA1 fused-XLA program           : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
