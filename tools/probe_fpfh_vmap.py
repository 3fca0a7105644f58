"""Why is vmapped FPFH slower per cloud than single-pair FPFH?
Times each FPFH substage single vs vmapped(B=16) on TPU.

Methodology: every jitted fn reduces its outputs to ONE scalar (so the
host fetch is 4 bytes) and is timed by two-point slope (K back-to-back
dispatches + one fetch), cancelling the axon tunnel's dispatch/fetch
round-trip."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

B, N = 16, 2048
R_FEAT, K_CAP, K_NORM = 10.0, 100, 30


def _scalarize(out):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))


def slope(run, k_lo=2, k_hi=10, trials=3):
    ts = {}
    for k in (k_lo, k_hi):
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = run()
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def timeit(name, fn):
    f = jax.jit(lambda *a: _scalarize(fn(*a)))

    def mk(args):
        def run():
            return f(*args)
        return run
    return f, mk


def main():
    from pctpu.ops.knn import knn, radius_search
    from pctpu.ops.normals import estimate_normals
    from pctpu.features.fpfh import fpfh, spfh
    from pctpu.ops.gather import group_points

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-40, 40, (B, N, 3)).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    p0, m0 = pts[0], mask[0]

    def bench(name, fn, args):
        f = jax.jit(lambda *a: _scalarize(fn(*a)))
        np.asarray(f(*args))   # compile
        dt = slope(lambda: f(*args))
        print(f"{name:34s} {dt*1e3:8.2f} ms")
        return dt

    t1 = bench("fpfh single",
               lambda p, m: fpfh(p, mask=m, radius=R_FEAT, k_cap=K_CAP,
                                 normal_k=K_NORM), (p0, m0))
    t2 = bench("fpfh vmap16",
               lambda p, m: jax.vmap(lambda pi, mi: fpfh(
                   pi, mask=mi, radius=R_FEAT, k_cap=K_CAP,
                   normal_k=K_NORM))(p, m), (pts, mask))
    print(f"  -> vmap16/single ratio: {t2/t1:.1f} (ideal <= 16)\n")

    bench("normals single",
          lambda p, m: estimate_normals(p, mask=m, k=K_NORM), (p0, m0))
    bench("normals vmap16",
          lambda p, m: jax.vmap(lambda pi, mi: estimate_normals(
              pi, mask=mi, k=K_NORM))(p, m), (pts, mask))

    bench("radius_search single",
          lambda p, m: radius_search(p, p, R_FEAT, K_CAP, db_mask=m),
          (p0, m0))
    bench("radius_search vmap16",
          lambda p, m: jax.vmap(lambda pi, mi: radius_search(
              pi, pi, R_FEAT, K_CAP, db_mask=mi))(p, m), (pts, mask))

    # materialize neighbor sets + normals for downstream stages
    nb = jax.jit(lambda p, m: jax.vmap(lambda pi, mi: radius_search(
        pi, pi, R_FEAT, K_CAP, db_mask=mi))(p, m))(pts, mask)
    nrm = jax.jit(lambda p, m: jax.vmap(lambda pi, mi: estimate_normals(
        pi, mask=mi, k=K_NORM))(p, m))(pts, mask)
    nb0 = jax.tree.map(lambda x: x[0], nb)

    bench("spfh single", spfh, (p0, nrm[0], nb0))
    bench("spfh vmap16", lambda p, n_, s: jax.vmap(spfh)(p, n_, s),
          (pts, nrm, nb))

    feats = jnp.asarray(rng.uniform(size=(B, N, 33)).astype(np.float32))
    bench("group_points single", group_points, (feats[0], nb0.idx))
    bench("group_points vmap16",
          lambda f, i: jax.vmap(group_points)(f, i), (feats, nb.idx))

    bench("knn30 single", lambda p, m: knn(p, p, K_NORM, db_mask=m),
          (p0, m0))
    bench("knn30 vmap16",
          lambda p, m: jax.vmap(lambda pi, mi: knn(
              pi, pi, K_NORM, db_mask=mi))(p, m), (pts, mask))


if __name__ == "__main__":
    main()
