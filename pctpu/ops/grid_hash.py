"""Grid-hash (voxel-bucket) neighbor search — O(27·cap) per query.

Same voxel hash as the reference's voxel filter (`voxel_filter.py:30-33`
h = hx + hy*Dx + hz*Dx*Dy, here packed into one int32 key), sort-by-key,
and per-query candidate gathering from the 27 neighboring cells.

POSITIONING (revised r2): on TPU the 27-cell candidate gather is
dynamic-gather-bound and measured ~3 orders slower than the banded
sorted-window kernels (`pctpu.ops.pallas_banded`) — 0.4 vs >1500 ICP
iters/s on the 124k KITTI scan. Use this module as the CPU-mesh /
correctness oracle and for asymptotic-complexity parity with the
reference's spatial index; the banded kernels (1-D spatial bucketing +
scalar-prefetched contiguous windows, i.e. grid hashing re-shaped for a
vector machine) are the production TPU path.

Guarantees: exact for radius searches with radius <= cell_size, and for kNN
whenever the k-th neighbor lies within cell_size; candidates beyond the
27-cell stencil are not seen. Cells clamp to a 1024^3 lattice — choose
cell_size >= extent/1024.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pctpu.ops.knn import NeighborSet

BIG = 1e30
MAX_CELLS = 1024  # per axis; keys pack into (cx<<20)|(cy<<10)|cz


class HashGrid(NamedTuple):
    points: jax.Array      # [N,3] sorted by cell key
    mask: jax.Array        # [N] sorted validity
    order: jax.Array       # [N] original index of each sorted slot
    keys: jax.Array        # [N] sorted int32 cell keys (invalid -> 2^30)
    origin: jax.Array      # [3]
    cell_size: jax.Array   # scalar


def _cell_key(cells: jax.Array) -> jax.Array:
    c = jnp.clip(cells, 0, MAX_CELLS - 1)
    return (c[..., 0] << 20) | (c[..., 1] << 10) | c[..., 2]


@jax.jit
def build_grid(points: jax.Array, mask: Optional[jax.Array] = None,
               cell_size: float = 1.0) -> HashGrid:
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    cs = jnp.asarray(cell_size, jnp.float32)
    origin = jnp.min(jnp.where(mask[:, None], points, BIG), axis=0)
    cells = jnp.floor((points - origin) / cs).astype(jnp.int32)
    keys = jnp.where(mask, _cell_key(cells), jnp.int32(1 << 30))
    order = jnp.argsort(keys).astype(jnp.int32)
    return HashGrid(points[order], mask[order], order, keys[order],
                    origin, cs)


def _stencil_keys(qcells: jax.Array) -> jax.Array:
    """[M,3] query cells -> [M,27] neighbor-cell keys."""
    offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2)] * 3),
                                  indexing="ij"), axis=-1).reshape(27, 3)
    nbr = qcells[:, None, :] + offs[None, :, :]
    in_lattice = jnp.all((nbr >= 0) & (nbr < MAX_CELLS), axis=-1)
    return jnp.where(in_lattice, _cell_key(nbr), jnp.int32(1 << 30) - 1)


@partial(jax.jit, static_argnames=("cap_per_cell", "query_chunk"))
def _gather_candidates(grid: HashGrid, query: jax.Array,
                       cap_per_cell: int = 32, query_chunk: int = 1024):
    """Per query: candidate slots from the 27-cell stencil.

    Returns (cand_sorted_idx [M, 27*cap], cand_valid [M, 27*cap],
    overflow [M] — candidates dropped by the per-cell cap)."""
    m = query.shape[0]
    qcells = jnp.floor((query - grid.origin) / grid.cell_size).astype(jnp.int32)
    nkeys = _stencil_keys(qcells)                         # [M,27]
    starts = jnp.searchsorted(grid.keys, nkeys, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(grid.keys, nkeys, side="right").astype(jnp.int32)
    lens = ends - starts
    overflow = jnp.sum(jnp.maximum(lens - cap_per_cell, 0), axis=1)
    offs = jax.lax.broadcasted_iota(jnp.int32, (27, cap_per_cell), 1)
    idx = starts[:, :, None] + offs[None, :, :]           # [M,27,cap]
    valid = offs[None] < lens[:, :, None]
    n = grid.points.shape[0]
    idx = jnp.clip(idx, 0, n - 1)
    return (idx.reshape(m, -1), valid.reshape(m, -1), overflow)


@partial(jax.jit, static_argnames=("k", "cap_per_cell", "query_chunk"))
def grid_knn(grid: HashGrid, query: jax.Array, k: int,
             cap_per_cell: int = 32, query_chunk: int = 1024) -> NeighborSet:
    """kNN among the 27-cell candidates. Indices refer to the ORIGINAL
    point order used to build the grid."""
    m = query.shape[0]
    pad = (-m) % query_chunk
    qp = jnp.pad(query, ((0, pad), (0, 0))).reshape(-1, query_chunk, 3)

    def one_chunk(qc):
        idx, valid, _ = _gather_candidates(grid, qc, cap_per_cell)
        cand = grid.points[idx]                           # [q,C,3]
        d2 = jnp.sum((cand - qc[:, None, :]) ** 2, axis=-1)
        ok = valid & grid.mask[idx]
        d2 = jnp.where(ok, d2, BIG)
        neg, sel = jax.lax.top_k(-d2, k)
        best = jnp.take_along_axis(idx, sel, axis=1)
        return -neg, grid.order[best]

    d2, oidx = jax.lax.map(one_chunk, qp)
    d2 = d2.reshape(-1, k)[:m]
    oidx = oidx.reshape(-1, k)[:m]
    valid = d2 < BIG
    return NeighborSet(oidx, d2, valid,
                       jnp.sum(valid, axis=1).astype(jnp.int32))


@partial(jax.jit, static_argnames=("k_cap", "cap_per_cell", "query_chunk"))
def grid_radius(grid: HashGrid, query: jax.Array, radius: float,
                k_cap: int = 64, cap_per_cell: int = 32,
                query_chunk: int = 1024) -> NeighborSet:
    """Radius search (exact when radius <= cell_size and caps suffice)."""
    r2 = jnp.float32(radius) ** 2
    m = query.shape[0]
    pad = (-m) % query_chunk
    qp = jnp.pad(query, ((0, pad), (0, 0))).reshape(-1, query_chunk, 3)

    def one_chunk(qc):
        idx, valid, _ = _gather_candidates(grid, qc, cap_per_cell)
        cand = grid.points[idx]
        d2 = jnp.sum((cand - qc[:, None, :]) ** 2, axis=-1)
        ok = valid & grid.mask[idx] & (d2 <= r2)
        cnt = jnp.sum(ok, axis=1).astype(jnp.int32)
        d2 = jnp.where(ok, d2, BIG)
        neg, sel = jax.lax.top_k(-d2, k_cap)
        best = jnp.take_along_axis(idx, sel, axis=1)
        return -neg, grid.order[best], cnt

    d2, oidx, cnt = jax.lax.map(one_chunk, qp)
    d2 = d2.reshape(-1, k_cap)[:m]
    oidx = oidx.reshape(-1, k_cap)[:m]
    cnt = cnt.reshape(-1)[:m]
    return NeighborSet(oidx, d2, d2 < BIG, cnt)


@partial(jax.jit, static_argnames=("cap_per_cell", "query_chunk"))
def grid_nearest(grid: HashGrid, query: jax.Array,
                 cap_per_cell: int = 32, query_chunk: int = 2048):
    """1-NN among the 27-cell candidates: (d2 [M], idx [M], found [M]).

    Queries farther than cell_size from every point come back found=False
    (d2=BIG) — in ICP those are exactly the associations the distance
    threshold would reject anyway."""
    m = query.shape[0]
    pad = (-m) % query_chunk
    qp = jnp.pad(query, ((0, pad), (0, 0))).reshape(-1, query_chunk, 3)

    def one_chunk(qc):
        idx, valid, _ = _gather_candidates(grid, qc, cap_per_cell)
        cand = grid.points[idx]
        d2 = jnp.sum((cand - qc[:, None, :]) ** 2, axis=-1)
        ok = valid & grid.mask[idx]
        d2 = jnp.where(ok, d2, BIG)
        best = jnp.argmin(d2, axis=1)
        bd = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
        bi = jnp.take_along_axis(idx, best[:, None], axis=1)[:, 0]
        return bd, grid.order[bi]

    d2, oidx = jax.lax.map(one_chunk, qp)
    d2 = d2.reshape(-1)[:m]
    oidx = oidx.reshape(-1)[:m]
    return d2, oidx, d2 < BIG
