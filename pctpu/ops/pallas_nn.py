"""Pallas TPU kernels for nearest-neighbor search.

The XLA brute-force path (`pctpu.ops.pairwise`) materializes [chunk, N]
distance blocks to HBM; at ICP scale (16k x 16k per iteration) that HBM
round-trip dominates. This kernel keeps the whole db (3xN coords + masked
|b|^2 row, ~1 MB at N=16k) resident in VMEM and streams query tiles through,
carrying the running (min, argmin) in registers — HBM traffic is O(M+N)
instead of O(M*N).

Replaces the role of the reference's KDTreeFlann per-point queries in the ICP
hot loop (`Registration/main.py:116-121`) and the lesson KD-tree/octree
searches (`Kdtree_Octree/lesson2/`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30          # plain Python scalars: Pallas kernels cannot capture
INT_BIG = 2**31 - 1  # traced constants


def _nn_kernel(q_ref, dbt_ref, pen_ref, d2_ref, idx_ref, *, db_tile: int):
    # Distances via direct squared differences on the VPU (K=3 would leave
    # the MXU ~98% idle anyway, and the |a|^2+|b|^2-2ab expansion loses
    # precision to cancellation at LiDAR coordinate ranges).
    q = q_ref[:]                                   # [TQ, 3]
    qx = q[:, 0:1]
    qy = q[:, 1:2]
    qz = q[:, 2:3]
    n = dbt_ref.shape[1]
    n_tiles = n // db_tile
    tq = q.shape[0]

    def body(j, carry):
        minv, mini = carry
        start = j * db_tile
        dx = qx - dbt_ref[0:1, pl.ds(start, db_tile)]   # [TQ, DBT]
        dy = qy - dbt_ref[1:2, pl.ds(start, db_tile)]
        dz = qz - dbt_ref[2:3, pl.ds(start, db_tile)]
        d2 = dx * dx + dy * dy + dz * dz
        d2 = d2 + pen_ref[0:1, pl.ds(start, db_tile)]   # +BIG where masked/pad
        tmin = jnp.min(d2, axis=1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, db_tile), 1) + start
        tidx = jnp.min(jnp.where(d2 <= tmin, cols, INT_BIG),
                       axis=1, keepdims=True)
        better = tmin < minv                        # strict: first tile wins ties
        return (jnp.where(better, tmin, minv),
                jnp.where(better, tidx, mini))

    init = (jnp.full((tq, 1), BIG), jnp.zeros((tq, 1), jnp.int32))
    minv, mini = jax.lax.fori_loop(0, n_tiles, body, init)
    d2_ref[:] = minv
    idx_ref[:] = mini


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("query_tile", "db_tile", "interpret"))
def nearest_pallas(query: jax.Array, db: jax.Array,
                   db_mask: jax.Array | None = None,
                   query_tile: int = 512, db_tile: int = 2048,
                   interpret: bool = False):
    """1-NN of each query in db. query [M,3], db [N,3] ->
    (d2 [M] f32, idx [M] int32). Ties resolve to the lowest index
    (np.argmin parity)."""
    m, n = query.shape[0], db.shape[0]
    mp = _round_up(m, query_tile)
    np_ = _round_up(n, db_tile)

    q = jnp.zeros((mp, 3), jnp.float32).at[:m].set(query.astype(jnp.float32))
    dbt = jnp.zeros((3, np_), jnp.float32).at[:, :n].set(
        db.astype(jnp.float32).T)
    valid = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0).squeeze(-1) < n
    if db_mask is not None:
        valid = valid & jnp.pad(db_mask, (0, np_ - n))
    penalty = jnp.where(valid, 0.0, BIG)[None, :]   # [1, Np]

    grid = (mp // query_tile,)
    d2, idx = pl.pallas_call(
        partial(_nn_kernel, db_tile=db_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((query_tile, 3), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((3, np_), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, np_), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, 1), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((query_tile, 1), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q, dbt, penalty)
    return d2[:m, 0], idx[:m, 0]
