"""Plane RANSAC ground segmentation — batched hypotheses.

Re-design of the two reference variants (SURVEY.md C12/C40):
  * hand-rolled 3-point sampling loop, tau=0.6, 35 iters, early-exit at 50%
    inliers (`Cluster_dbscan/clustering.py:36-95`)
  * normal-prefiltered `o3d.segment_plane(0.30, 1000 iters)`
    (`Final_Project/scripts/extract.py:389-470`)

All hypotheses are evaluated at once: sample H triples, plane from cross
product, count inliers over all N points in one [H,N] masked reduction,
then refine the best plane by least squares over its inliers.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pctpu.ops.eigh3 import eigh3


class PlaneResult(NamedTuple):
    normal: jax.Array        # [3] unit normal
    offset: jax.Array        # scalar d: n.x + d = 0
    inlier_mask: jax.Array   # [N]
    num_inliers: jax.Array


@partial(jax.jit, static_argnames=("num_hypotheses", "refine"))
def plane_ransac(points: jax.Array, mask: Optional[jax.Array] = None,
                 dist_thresh: float = 0.3,
                 num_hypotheses: int = 1024,
                 key: Optional[jax.Array] = None,
                 refine: bool = True) -> PlaneResult:
    """points [N,3] -> best plane. Degenerate (near-collinear) samples score
    zero, replacing the reference's resample-on-degenerate loop
    (`clustering.py:55-62`)."""
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    if key is None:
        key = jax.random.PRNGKey(0)

    logits = jnp.where(mask, 0.0, -1e9)
    g = jax.random.gumbel(key, (num_hypotheses, n)) + logits[None, :]
    _, samples = jax.lax.top_k(g, 3)                  # [H,3]
    p = points[samples]                               # [H,3,3]
    v1 = p[:, 1] - p[:, 0]
    v2 = p[:, 2] - p[:, 0]
    normal = jnp.cross(v1, v2)                        # [H,3]
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    ok = norm[:, 0] > 1e-8                            # non-degenerate
    normal = normal / jnp.maximum(norm, 1e-12)
    d = -jnp.sum(normal * p[:, 0], axis=-1)           # [H]

    dist = jnp.abs(points @ normal.T + d[None, :])    # [N,H]
    inl = (dist.T < dist_thresh) & mask[None, :]      # [H,N]
    scores = jnp.sum(inl, axis=1) * ok.astype(jnp.int32)
    best = jnp.argmax(scores)
    bn, bd = normal[best], d[best]
    inlier_mask = inl[best]

    if refine:
        # least-squares plane through inliers: smallest eigvec of scatter
        w = inlier_mask.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(w), 1.0)
        c = jnp.sum(points * w[:, None], axis=0) / cnt
        diff = (points - c) * w[:, None]
        cov = diff.T @ diff / cnt
        _, vecs = eigh3(cov)
        bn2 = vecs[:, 0]
        bn2 = jnp.where(jnp.dot(bn2, bn) < 0, -bn2, bn2)  # keep orientation
        bd2 = -jnp.dot(bn2, c)
        dist2 = jnp.abs(points @ bn2 + bd2)
        inlier_mask = (dist2 < dist_thresh) & mask
        bn, bd = bn2, bd2

    return PlaneResult(bn, bd, inlier_mask,
                       jnp.sum(inlier_mask).astype(jnp.int32))


def segment_ground(points: jax.Array, mask: Optional[jax.Array] = None,
                   dist_thresh: float = 0.3, num_hypotheses: int = 1024,
                   key: Optional[jax.Array] = None,
                   normals: Optional[jax.Array] = None,
                   z_cos_thresh: float = 0.86602540378):
    """Ground segmentation with the Final_Project normal prefilter
    (`extract.py:412-434`: only points with |normal_z| > cos(pi/6) vote for
    the ground plane). Returns (ground_mask, PlaneResult)."""
    vote_mask = mask if mask is not None else jnp.ones(points.shape[:1], bool)
    if normals is not None:
        vote_mask = vote_mask & (jnp.abs(normals[:, 2]) > z_cos_thresh)
    res = plane_ransac(points, vote_mask, dist_thresh, num_hypotheses, key)
    dist = jnp.abs(points @ res.normal + res.offset)
    base = mask if mask is not None else jnp.ones(points.shape[:1], bool)
    ground = (dist < dist_thresh) & base
    return ground, res
