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


@partial(jax.jit, static_argnames=("k_cap", "normal_k", "measure"))
def harris3d_keypoints(points: jax.Array,
                       mask: Optional[jax.Array] = None,
                       radius: float = 0.5,
                       threshold: float = 0.0,
                       k: float = 0.04,
                       k_cap: int = 64,
                       normal_k: int = 16,
                       normals: Optional[jax.Array] = None,
                       measure: str = "noble") -> HarrisResult:
    """points [N,3] -> HarrisResult (response + NMS'd keypoint mask).

    measure: 'noble' (det/tr, PCL NOBLE, default) or 'harris'
    (det - k*tr^2, PCL HARRIS — honors `k`). With unit normals the two
    rank near-identically; thresholds are measure-specific.
    """
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
    if measure == "harris":
        # PCL HarrisKeypoint3D HARRIS method: det - k * tr^2
        response = det - jnp.float32(k) * tr * tr
    else:
        # Noble measure det/tr: with unit normals tr(C) ~= 1 everywhere,
        # so det - k*tr^2 is then a near-constant shift of det and the two
        # measures rank identically (tested on real scans); det/tr is the
        # scale-robust form and the default
        response = det / jnp.maximum(tr, 1e-12)
    cand = mask & (response > threshold)
    keep = radius_nms(points, response, cand, radius, k_cap=k_cap)
    return HarrisResult(keep, response)


@partial(jax.jit, static_argnames=("k_cap", "normal_k"))
def harris6d_keypoints(points: jax.Array,
                       intensity: jax.Array,
                       mask: Optional[jax.Array] = None,
                       radius: float = 0.5,
                       threshold: float = 0.0,
                       k_cap: int = 64,
                       normal_k: int = 16,
                       normals: Optional[jax.Array] = None) -> HarrisResult:
    """Harris6D: geometry + appearance corner response.

    Capability parity with PCL's HarrisKeypoint6D (`keypoints.cpp:64-84`,
    XYZRGB input): the 6-D structure combines the normal covariance with
    the covariance of per-point intensity gradients (estimated per
    neighborhood as the least-squares spatial gradient of `intensity`).
    Response = product of the two Noble measures, thresholded + radius NMS.
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    if normals is None:
        normals = estimate_normals(points, mask=mask, k=normal_k)

    res = radius_search(points, points, radius, k_cap, db_mask=mask)
    w = res.valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)

    # geometric structure: normal covariance (as Harris3D)
    nbr_n = group_points(normals, res.idx) * w[..., None]
    Cg = jnp.einsum("nki,nkj->nij", nbr_n, nbr_n) / cnt[:, None, None]

    # appearance: per-neighborhood least-squares intensity gradient, then
    # the covariance of neighbor gradients approximated by g g^T per point
    nbr_p = group_points(points, res.idx)
    nbr_i = jnp.where(res.valid, intensity[res.idx], 0.0)
    dp = (nbr_p - points[:, None, :]) * w[..., None]        # [N,K,3]
    di = (nbr_i - intensity[:, None]) * w                   # [N,K]
    A = jnp.einsum("nki,nkj->nij", dp, dp) + 1e-6 * jnp.eye(3)
    b = jnp.einsum("nki,nk->ni", dp, di)
    grad = jnp.linalg.solve(A, b[..., None])[..., 0]        # [N,3]
    nbr_g = group_points(grad, res.idx) * w[..., None]
    Ci = jnp.einsum("nki,nkj->nij", nbr_g, nbr_g) / cnt[:, None, None]

    def noble(C):
        tr = C[:, 0, 0] + C[:, 1, 1] + C[:, 2, 2]
        return jnp.linalg.det(C) / jnp.maximum(tr, 1e-12)

    response = noble(Cg) * (1.0 + noble(Ci))
    cand = mask & (response > threshold)
    keep = radius_nms(points, response, cand, radius, k_cap=k_cap)
    return HarrisResult(keep, response)
