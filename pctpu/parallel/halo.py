"""Halo-exchange point-sharded neighbor search.

SURVEY.md §5.7: the sequence-parallel analogue for point clouds when BOTH
clouds are too big to replicate — shard both along a spatial axis into
contiguous slabs (one per device); each device's queries only need its own
dst slab plus a halo of boundary points from the two neighboring devices.
The halo moves by `ppermute` (ring exchange over ICI) — the kNN counterpart
of ring attention's block exchange.

Exactness: a query's true nearest neighbor is found whenever it lies within
its device's slab or the halo; halo_width points per side bound the error to
queries whose NN is farther (in slab-axis rank) than the halo — choose
halo_width >= the expected NN count within the association threshold, and
thresholded consumers (ICP) are exact.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pctpu.ops.pairwise import chunked_min_argmin


def partition_by_axis(points: np.ndarray, n_shards: int,
                      axis: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: sort by `axis` and pad so each shard is a contiguous,
    equal-size spatial slab. Returns (sorted_padded [n_shards*S, 3],
    mask [n_shards*S])."""
    order = np.argsort(points[:, axis], kind="stable")
    pts = points[order]
    n = pts.shape[0]
    per = -(-n // n_shards)
    total = per * n_shards
    out = np.zeros((total, points.shape[1]), points.dtype)
    out[:n] = pts
    if n:
        out[n:] = pts[-1]
    mask = np.zeros((total,), bool)
    mask[:n] = True
    return out, mask


def make_halo_nearest(mesh: Mesh, halo_width: int,
                      point_axis: str = "point",
                      query_chunk: int = 1024):
    """Returns jitted f(src, src_mask, dst, dst_mask) -> (d2 [N], idx_local
    [N] into the PADDED sorted dst, found-ness via d2 < BIG).

    All four inputs sharded over `point_axis` (contiguous slabs from
    partition_by_axis). Each device searches its dst slab extended by
    halo_width points exchanged from each ring neighbor.
    """
    axis_size = mesh.shape[point_axis]

    def body(src, src_mask, dst, dst_mask):
        # src/dst here are the per-device slabs [S,3]
        s = dst.shape[0]
        i = jax.lax.axis_index(point_axis)

        right_perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]
        left_perm = [(j, (j - 1) % axis_size) for j in range(axis_size)]

        # halo from the left neighbor: its LAST halo_width points
        tail = dst[s - halo_width:]
        tail_m = dst_mask[s - halo_width:]
        from_left = jax.lax.ppermute(tail, point_axis, right_perm)
        from_left_m = jax.lax.ppermute(tail_m, point_axis, right_perm)
        # halo from the right neighbor: its FIRST halo_width points
        head = dst[:halo_width]
        head_m = dst_mask[:halo_width]
        from_right = jax.lax.ppermute(head, point_axis, left_perm)
        from_right_m = jax.lax.ppermute(head_m, point_axis, left_perm)

        # ring wrap-around would pair the two ends of the sort axis —
        # disable those halos (device 0 has no left, last has no right)
        from_left_m = from_left_m & (i > 0)
        from_right_m = from_right_m & (i < axis_size - 1)

        ext = jnp.concatenate([from_left, dst, from_right], axis=0)
        ext_m = jnp.concatenate([from_left_m, dst_mask, from_right_m])
        d2, local = chunked_min_argmin(src, ext, ext_m, query_chunk)
        # map extended index -> global padded-sorted dst index
        base = i * s - halo_width
        in_left = local < halo_width
        in_right = local >= halo_width + s
        global_idx = base + local
        global_idx = jnp.where(in_left, (i - 1) * s + (s - halo_width)
                               + local, global_idx)
        global_idx = jnp.where(in_right, (i + 1) * s
                               + (local - halo_width - s), global_idx)
        d2 = jnp.where(src_mask, d2, jnp.float32(1e30))
        return d2, global_idx.astype(jnp.int32)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(point_axis), P(point_axis), P(point_axis),
                            P(point_axis)),
                  out_specs=(P(point_axis), P(point_axis)))
    return jax.jit(f)
