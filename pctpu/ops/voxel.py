"""Voxel-grid downsampling (centroid / random), fully jittable.

Re-design of `Pca_and_Voxel_filter/voxel_filter.py:10-68`: the reference
hashes `h = hx + hy*Dx + hz*Dx*Dy`, sorts, and group-reduces in a Python
loop. Here the same sort-by-voxel idea runs as one XLA program: a 3-key
lexicographic sort (collision-free, unlike a flat hash that can overflow
int32 at fine leaf sizes), run-boundary detection, and `segment_sum`
reductions. Output keeps the input's static capacity with a voxel-count mask.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from pctpu.core.cloud import PointCloud

INT_SENTINEL = jnp.int32(2**31 - 1)


def _voxel_cells(points, mask, leaf):
    big = jnp.float32(1e30)
    pmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    cell = jnp.floor((points - pmin) / leaf).astype(jnp.int32)
    cell = jnp.where(mask[:, None], cell, INT_SENTINEL)  # padding sorts last
    return cell


@partial(jax.jit, static_argnames=("method",))
def voxel_downsample(points: jax.Array, mask: jax.Array, leaf: float,
                     method: str = "centroid",
                     key: Optional[jax.Array] = None) -> PointCloud:
    """points [N,3], mask [N] -> PointCloud of voxel representatives
    (capacity N, valid voxels compacted to the front).

    method: 'centroid' (per-voxel mean) or 'random' (uniform member pick),
    matching the reference's two modes (`voxel_filter.py:39-64`).
    """
    n = points.shape[0]
    cell = _voxel_cells(points, mask, jnp.float32(leaf))

    if method == "random":
        if key is None:
            key = jax.random.PRNGKey(0)
        prio = jax.random.randint(key, (n,), 0, 2**31 - 1, dtype=jnp.int32)
    else:
        prio = jnp.zeros((n,), jnp.int32)

    order = jnp.lexsort((prio, cell[:, 2], cell[:, 1], cell[:, 0]))
    cs = cell[order]
    ps = points[order]
    ms = mask[order]

    prev = jnp.roll(cs, 1, axis=0)
    new_run = jnp.any(cs != prev, axis=1)
    new_run = new_run.at[0].set(True)
    new_run = new_run & ms
    seg = jnp.cumsum(new_run.astype(jnp.int32)) - 1  # [-1 .. V-1]
    num_voxels = seg[-1] + 1 if n else jnp.int32(0)
    num_voxels = jnp.maximum(seg[jnp.argmax(jnp.where(ms, seg, -1))] + 1, 0)
    seg_safe = jnp.where(ms, seg, n - 1)  # dump padding into last slot

    if method == "centroid":
        sums = jax.ops.segment_sum(
            jnp.where(ms[:, None], ps, 0.0), seg_safe, num_segments=n)
        cnts = jax.ops.segment_sum(ms.astype(jnp.float32), seg_safe, num_segments=n)
        out_pts = sums / jnp.maximum(cnts, 1.0)[:, None]
    else:
        # first element of each (cell, priority)-sorted run = random member
        out_pts = jax.ops.segment_max(
            jnp.where((new_run & ms)[:, None], ps, -jnp.float32(1e30)),
            seg_safe, num_segments=n)

    out_mask = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < num_voxels
    out_pts = jnp.where(out_mask[:, None], out_pts, out_pts[:1])
    return PointCloud(points=out_pts, mask=out_mask)


def voxel_downsample_cloud(pc: PointCloud, leaf: float,
                           method: str = "centroid",
                           key: Optional[jax.Array] = None) -> PointCloud:
    return voxel_downsample(pc.points, pc.mask, leaf, method=method, key=key)


@partial(jax.jit, static_argnames=("max_cells",))
def voxel_downsample_batch(points: jax.Array, mask: jax.Array,
                           leaf: float,
                           max_cells: int = 1024) -> PointCloud:
    """Batch-aware centroid voxel downsample: [B,N,3] x [B,N] -> PointCloud
    with batched [B,N,3]/[B,N] fields (valid voxels compacted to the front
    of each batch row).

    Semantics match `voxel_downsample(method='centroid')` per batch element
    as long as every axis spans < `max_cells` cells (e.g. 2 km at the
    2.0 m reference leaf); cells beyond that clamp into the edge voxel.
    The clamp buys a SINGLE fused int32 sort key (the reference's own
    `h = hx + hy*Dx + hz*Dx*Dy`, `voxel_filter.py:30-33`, with static
    dims) instead of a 3-key lexsort. The explicit batch implementation
    exists because vmapping the single version is ~3x off on TPU: batched
    row-gathers and batched segment_sum lower poorly, while folding the
    batch into flat indices/segments keeps the fast single-axis paths
    (r4 probe history).
    """
    from pctpu.ops.gather import _flat_row_gather
    b, n, _ = points.shape
    big = jnp.float32(1e30)
    pmin = jnp.min(jnp.where(mask[..., None], points, big), axis=1)  # [B,3]
    cell = jnp.floor((points - pmin[:, None, :]) / jnp.float32(leaf))
    cell = jnp.clip(cell.astype(jnp.int32), 0, max_cells - 1)
    key = (cell[..., 0] * max_cells + cell[..., 1]) * max_cells \
        + cell[..., 2]
    key = jnp.where(mask, key, INT_SENTINEL)  # padding sorts last

    order = jnp.argsort(key, axis=-1).astype(jnp.int32)     # [B,N]
    ks = _flat_row_gather(key[..., None], order)[..., 0]
    ps = _flat_row_gather(points, order)
    ms = _flat_row_gather(mask[..., None], order)[..., 0]

    new_run = ks != jnp.roll(ks, 1, axis=1)
    new_run = new_run.at[:, 0].set(True)
    new_run = new_run & ms
    seg = jnp.cumsum(new_run.astype(jnp.int32), axis=1) - 1   # [B,N]
    num_voxels = jnp.maximum(
        jnp.max(jnp.where(ms, seg, -1), axis=1) + 1, 0)       # [B]
    seg_safe = jnp.where(ms, seg, n - 1)
    # flat segments: fold the batch into the segment id
    flat_seg = (seg_safe
                + jnp.arange(b, dtype=jnp.int32)[:, None] * n).reshape(-1)
    sums = jax.ops.segment_sum(
        jnp.where(ms[..., None], ps, 0.0).reshape(b * n, 3), flat_seg,
        num_segments=b * n).reshape(b, n, 3)
    cnts = jax.ops.segment_sum(
        ms.astype(jnp.float32).reshape(-1), flat_seg,
        num_segments=b * n).reshape(b, n)
    out_pts = sums / jnp.maximum(cnts, 1.0)[..., None]
    out_mask = (jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
                < num_voxels[:, None])
    out_pts = jnp.where(out_mask[..., None], out_pts, out_pts[:, :1])
    return PointCloud(points=out_pts, mask=out_mask)
