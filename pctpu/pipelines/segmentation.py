"""Ground removal + object clustering for LiDAR frames — the shared front
end of the KITTI ETL and detection pipelines.

Re-design of `Final_Project/scripts/extract.py:389-470` (and the simpler
`Cluster_dbscan/clustering.py:36-132`): normals -> z-normal-prefiltered plane
RANSAC -> FOV crop -> DBSCAN object ids. The jitted device program does
normals + RANSAC + DBSCAN in one go; only the file IO stays on host.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pctpu.cluster.dbscan import dbscan
from pctpu.cluster.plane_ransac import segment_ground
from pctpu.ops.normals import estimate_normals


@dataclasses.dataclass(frozen=True)
class SegmentationConfig:
    """Defaults = extract.py's numbers (`:412-468`)."""
    normal_k: int = 9                 # max_nn 9 at radius 5.0
    ground_dist: float = 0.30         # segment_plane distance
    ransac_hypotheses: int = 1024     # ~ 1000 iterations
    z_cos_thresh: float = 0.86602540  # cos(pi/6) normal prefilter
    fov_x: tuple = (1.95, 80.0)       # camera FOV crop
    fov_y: tuple = (-30.0, 30.0)
    dbscan_eps: float = 0.60
    dbscan_min_pts: int = 3
    dbscan_k_cap: int = 32


class SegmentationResult(NamedTuple):
    ground_mask: jax.Array     # [N] bool (within original mask)
    object_ids: jax.Array      # [N] int32, -1 = noise/ground/out-of-fov
    normals: jax.Array         # [N,3]
    foreground: jax.Array     # [N] bool: in-FOV, off-ground valid points


@partial(jax.jit, static_argnames=("cfg",))
def segment_ground_and_objects(points: jax.Array, mask: jax.Array,
                               key: jax.Array = None,
                               cfg: SegmentationConfig = SegmentationConfig()
                               ) -> SegmentationResult:
    if key is None:
        key = jax.random.PRNGKey(0)
    normals = estimate_normals(points, mask=mask, k=cfg.normal_k)
    ground, _ = segment_ground(
        points, mask=mask, dist_thresh=cfg.ground_dist,
        num_hypotheses=cfg.ransac_hypotheses, key=key, normals=normals,
        z_cos_thresh=cfg.z_cos_thresh)
    in_fov = ((points[:, 0] >= cfg.fov_x[0]) & (points[:, 0] <= cfg.fov_x[1])
              & (points[:, 1] >= cfg.fov_y[0]) & (points[:, 1] <= cfg.fov_y[1]))
    fg = mask & ~ground & in_fov
    ids = dbscan(points, cfg.dbscan_eps, cfg.dbscan_min_pts, mask=fg,
                 k_cap=cfg.dbscan_k_cap)
    ids = jnp.where(fg, ids, -1)
    return SegmentationResult(ground, ids, normals, fg)
