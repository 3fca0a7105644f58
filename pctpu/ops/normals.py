"""PCA and per-point normal estimation.

Capability parity with `Pca_and_Voxel_filter/pca_normal.py:10-36,85-94`
(global PCA; normals = least eigenvector of each kNN neighborhood) — but the
per-point eigenproblems run through the closed-form batched 3x3 solver
(`pctpu.ops.eigh3`) instead of N separate LAPACK calls.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.lax import Precision as _P

from pctpu.ops.eigh3 import eigh3
from pctpu.ops.knn import knn
from pctpu.ops.gather import group_points


def pca(data: jax.Array, mask: Optional[jax.Array] = None,
        correlation: bool = False):
    """Global PCA of [N,D] data -> (eigvals desc [D], eigvecs [D,D] columns).

    Mirrors the reference `PCA(data, correlation, sort=True)` contract
    (`pca_normal.py:10-36`): covariance (or correlation) of centered data,
    eigenvalues sorted descending.
    """
    if mask is None:
        mask = jnp.ones(data.shape[:1], bool)
    w = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(data * w[:, None], axis=0) / n
    centered = (data - mean) * w[:, None]
    cov = centered.T @ centered / n
    if correlation:
        d = jnp.sqrt(jnp.clip(jnp.diagonal(cov), 1e-12, None))
        cov = cov / d[:, None] / d[None, :]
    if data.shape[1] == 3:
        vals, vecs = eigh3(cov)
    else:
        vals, vecs = jnp.linalg.eigh(cov)
    # ascending -> descending
    return vals[::-1], vecs[:, ::-1]


def pca_project(data: jax.Array, n_components: int = 2,
                mask: Optional[jax.Array] = None) -> jax.Array:
    """Project [N,D] data onto its top principal axes -> [N,n_components]
    (the reference's draw_pca 2-D projection demo, `pca_normal.py:39-56`)."""
    if mask is None:
        mask = jnp.ones(data.shape[:1], bool)
    w = mask.astype(jnp.float32)
    mean = jnp.sum(data * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    _, vecs = pca(data, mask)
    return (data - mean) @ vecs[:, :n_components]


def neighborhood_covariances(points: jax.Array, idx: jax.Array,
                             valid: jax.Array):
    """Per-point scatter matrices of gathered neighborhoods.

    points [N,3], idx [M,K], valid [M,K] -> (cov [M,3,3], count [M]).
    """
    nbr = group_points(points, idx)                       # [M,K,3]
    w = valid.astype(jnp.float32)                          # [M,K]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)             # [M]
    mean = jnp.sum(nbr * w[..., None], axis=1) / cnt[:, None]
    d = (nbr - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("mki,mkj->mij", d, d, precision=_P.HIGHEST) / cnt[:, None, None]
    return cov, cnt


@partial(jax.jit, static_argnames=("k", "query_chunk"))
def estimate_normals(points: jax.Array,
                     mask: Optional[jax.Array] = None,
                     k: int = 5,
                     viewpoint: Optional[jax.Array] = None,
                     query_chunk: int = 1024) -> jax.Array:
    """Per-point normals = least eigenvector of the kNN(k) neighborhood
    covariance (k includes the point itself, as the reference's KDTreeFlann
    search does — `pca_normal.py:85-94` uses knn=5).

    If `viewpoint` [3] is given, normals are flipped to face it (the usual
    sensor-origin orientation for LiDAR).
    """
    res = knn(points, points, k, db_mask=mask, query_chunk=query_chunk)
    cov, _ = neighborhood_covariances(points, res.idx, res.valid)
    _, vecs = eigh3(cov)
    normals = vecs[:, :, 0]  # smallest-eigenvalue column
    if viewpoint is not None:
        to_vp = viewpoint[None, :] - points
        sign = jnp.where(jnp.sum(normals * to_vp, axis=-1) < 0, -1.0, 1.0)
        normals = normals * sign[:, None]
    return normals
