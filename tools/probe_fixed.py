#!/usr/bin/env python
"""Decompose the 23 ms per-call fixed cost: tunnel round-trip vs argsort
vs build_banded vs layout prep."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps=20, sync=lambda o: np.asarray(o)):
    fn_out = fn()
    sync(fn_out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    for o in outs:
        sync(o)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from bench import load_pair
    from pctpu.ops.pallas_banded import build_banded

    src, dst, _ = load_pair()
    s, d = jnp.asarray(src), jnp.asarray(dst)
    mask = jnp.ones((src.shape[0],), bool)

    # 1. trivial jit round-trip through the tunnel
    @jax.jit
    def trivial(x):
        return x * 2.0

    tiny = jnp.ones((4, 4), jnp.float32)
    print(f"trivial jit roundtrip:   {timeit(lambda: trivial(tiny))*1e3:.2f} ms")

    # 2. argsort of 16k
    @jax.jit
    def just_sort(x):
        return jnp.argsort(x[:, 0])[:8]

    print(f"argsort 16k roundtrip:   {timeit(lambda: just_sort(d))*1e3:.2f} ms")

    # 3. build_banded
    def bb():
        return build_banded(d, mask, block=512)
    print(f"build_banded roundtrip:  {timeit(bb, sync=lambda o: np.asarray(o.lut))*1e3:.2f} ms")

    # 4. two sorts + gathers, the full prep shape
    @jax.jit
    def full_prep(s, d):
        o1 = jnp.argsort(d[:, 0])
        o2 = jnp.argsort(s[:, 0])
        return d[o1][:4], s[o2][:4]

    print(f"two sorts + gathers:     {timeit(lambda: full_prep(s, d), sync=lambda o: np.asarray(o[0]))*1e3:.2f} ms")

    # 5. ten trivial calls dispatched back-to-back, one sync (pipelining)
    def ten():
        outs = [trivial(tiny) for _ in range(10)]
        return outs[-1]
    print(f"10x trivial, one sync:   {timeit(ten)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
