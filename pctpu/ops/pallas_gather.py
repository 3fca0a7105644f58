"""Pallas row-gather kernel: fast dynamic gathers for small tables.

XLA's TPU gather runs at tens of millions of rows/s (measured ~3.5 s for
1M x 128 rows on v5e) — it dominates PointNet++ grouping. But every grouping
gather in the model reads from a SMALL table (<= a few thousand points x a
few hundred channels, well under VMEM): this kernel keeps the whole table in
VMEM and copies rows with an on-chip loop, avoiding HBM random access
entirely.

Used by `pctpu.ops.gather.group_points` on TPU when the table fits; falls
back to XLA otherwise.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# table must fit in VMEM alongside the output tile
MAX_TABLE_BYTES = 8 * 1024 * 1024


SUBCHUNKS = 8  # SMEM block sublane count (tiling-compliant)


def _gather_kernel(idx_ref, table_ref, out_ref, *, rows_per_step: int):
    def body(i, _):
        s = i // rows_per_step
        r = i % rows_per_step
        j = idx_ref[0, s, r]
        out_ref[0, i, :] = table_ref[0, j, :]
        return 0

    jax.lax.fori_loop(0, SUBCHUNKS * rows_per_step, body, 0)


@partial(jax.jit, static_argnames=("rows_per_step", "interpret"))
def gather_rows_pallas(table: jax.Array, idx: jax.Array,
                       rows_per_step: int = 1024,
                       interpret: bool = False) -> jax.Array:
    """table [B, N, C], idx [B, M] int32 -> [B, M, C].

    Grid = (B, M/rows_per_step); per program the full [N, C] table slice
    sits in VMEM and rows are copied VMEM->VMEM.
    """
    b, n, c = table.shape
    m = idx.shape[1]
    rows_per_block = SUBCHUNKS * rows_per_step
    mp = ((m + rows_per_block - 1) // rows_per_block) * rows_per_block
    chunks = mp // rows_per_step
    idx_p = jnp.zeros((b, mp), jnp.int32).at[:, :m].set(
        jnp.clip(idx.astype(jnp.int32), 0, n - 1))
    idx_p = idx_p.reshape(b, chunks, rows_per_step)

    grid = (b, chunks // SUBCHUNKS)
    out = pl.pallas_call(
        partial(_gather_kernel, rows_per_step=rows_per_step),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, SUBCHUNKS, rows_per_step),
                         lambda bi, mi: (bi, mi, 0),
                         memory_space=pl.ANY if interpret else pltpu.SMEM),
            pl.BlockSpec((1, n, c), lambda bi, mi: (bi, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_per_block, c), lambda bi, mi: (bi, mi, 0),
            memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, mp, c), table.dtype),
        interpret=interpret,
    )(idx_p, table)
    return out[:, :m, :]


def table_fits(table_shape, dtype_bytes: int = 4) -> bool:
    n, c = table_shape[-2], table_shape[-1]
    c_padded = ((c + 127) // 128) * 128
    return n * c_padded * dtype_bytes <= MAX_TABLE_BYTES


def _scatter_add_kernel(idx_ref, grads_ref, out_ref, *, rows: int,
                        n_chunks: int):
    """out[idx[i], :] += grads[i, :], sequentially — deterministic, no
    atomics (SURVEY §5.2). Grid = (B,); the whole [N, C] output block stays
    resident in VMEM while the grid step streams its batch element."""
    out_ref[0] = jnp.zeros_like(out_ref[0])

    def body(i, _):
        s = i // rows
        r = i % rows
        j = idx_ref[0, s, r]
        out_ref[0, j, :] += grads_ref[0, i, :]
        return 0

    jax.lax.fori_loop(0, n_chunks * rows, body, 0)


@partial(jax.jit, static_argnames=("n", "rows_per_step", "interpret"))
def scatter_add_rows_pallas(grads: jax.Array, idx: jax.Array, n: int,
                            rows_per_step: int = 1024,
                            interpret: bool = False) -> jax.Array:
    """grads [B, M, C], idx [B, M] int32 -> [B, n, C] with rows
    accumulated at their indices — the transpose of gather_rows_pallas."""
    b, m, c = grads.shape
    rows_per_block = SUBCHUNKS * rows_per_step
    mp = ((m + rows_per_block - 1) // rows_per_block) * rows_per_block
    # out-of-range parking slot n for padded entries, dropped afterwards
    idx_p = jnp.full((b, mp), n, jnp.int32).at[:, :m].set(
        jnp.clip(idx.astype(jnp.int32), 0, n - 1))
    idx_p = idx_p.reshape(b, mp // rows_per_step, rows_per_step)
    g_p = jnp.zeros((b, mp, c), grads.dtype).at[:, :m].set(grads)
    mem = pl.ANY if interpret else pltpu.SMEM
    out = pl.pallas_call(
        partial(_scatter_add_kernel, rows=rows_per_step,
                n_chunks=mp // rows_per_step),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, mp // rows_per_step, rows_per_step),
                         lambda bi: (bi, 0, 0), memory_space=mem),
            pl.BlockSpec((1, mp, c), lambda bi: (bi, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n + 1, c), lambda bi: (bi, 0, 0),
            memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n + 1, c), grads.dtype),
        interpret=interpret,
    )(idx_p, g_p)
    return out[:, :n, :]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def group_points_pallas(points: jax.Array, idx: jax.Array,
                        rows_per_step: int = 1024,
                        interpret: bool = False) -> jax.Array:
    """Differentiable VMEM-resident grouping: points [B,N,C],
    idx [B,M,K] -> [B,M,K,C]. Forward is the row-gather kernel; backward is
    the sequential in-kernel scatter-add (deterministic, no XLA scatter)."""
    b, m, k = idx.shape
    flat = gather_rows_pallas(points, idx.reshape(b, m * k),
                              rows_per_step=rows_per_step,
                              interpret=interpret)
    return flat.reshape(b, m, k, points.shape[-1])


def _gpp_fwd(points, idx, rows_per_step, interpret):
    return group_points_pallas(points, idx, rows_per_step, interpret), \
        (idx, points.shape[-2])


def _gpp_bwd(rows_per_step, interpret, res, g):
    idx, n = res
    b, m, k, c = g.shape
    dpoints = scatter_add_rows_pallas(
        g.reshape(b, m * k, c), idx.reshape(b, m * k), n,
        rows_per_step=rows_per_step, interpret=interpret)
    return dpoints, None


group_points_pallas.defvjp(_gpp_fwd, _gpp_bwd)
