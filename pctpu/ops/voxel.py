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
