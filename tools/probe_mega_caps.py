#!/usr/bin/env python
"""TPU capability probe for the mega-kernel ICP: (a) scalar reads from a
VMEM scratch accumulator, (b) SMEM scalar scratch carried across grid
steps, (c) scalar math (sqrt/where/fori_loop) on the scalar core."""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, out_ref, acc_ref, pose_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        pose_ref[0, 0] = 1.0

    # vector-domain accumulation into VMEM scratch
    tile = x_ref[:4, :]                        # [4, 128]
    m = jax.lax.dot_general(tile, tile, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [4,4]
    acc_ref[:4, :4] = acc_ref[:4, :4] + m

    # scalar-domain: read a VMEM scratch element, do scalar math with a
    # fori_loop, carry through SMEM scratch across grid steps
    s = acc_ref[0, 0]
    p = pose_ref[0, 0]

    def body(_, c):
        return 0.5 * (c + jnp.sqrt(jnp.maximum(s, 1e-6)) / jnp.maximum(c, 1e-6))

    p2 = jax.lax.fori_loop(0, 4, body, p)
    p2 = jnp.where(s > 0, p2, p)
    pose_ref[0, 0] = p2

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0, 0] = pose_ref[0, 0]
        out_ref[0, 1] = acc_ref[0, 0]
        out_ref[0, 2] = acc_ref[1, 2]


@functools.partial(jax.jit, static_argnames=())
def run(x):
    return pl.pallas_call(
        kernel,
        grid=(x.shape[0] // 8,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SMEM((1, 16), jnp.float32)],
    )(x)


def main():
    import numpy as np
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(32, 128)).astype(np.float32))
    out = np.asarray(run(x))
    # expected acc[0,0] = sum over all 4 grid steps of row0.row0
    xa = np.asarray(x).reshape(4, 8, 128)
    acc00 = sum(float(xa[g, 0] @ xa[g, 0]) for g in range(4))
    acc12 = sum(float(xa[g, 1] @ xa[g, 2]) for g in range(4))
    print("kernel out:", out)
    print("expected acc00:", acc00, "acc12:", acc12)
    assert abs(out[0, 1] - acc00) < 1e-2 * max(1, abs(acc00))
    assert abs(out[0, 2] - acc12) < 1e-2 * max(1, abs(acc12))
    print("OK: VMEM scalar reads + SMEM carry + scalar fori_loop all work")


if __name__ == "__main__":
    main()
