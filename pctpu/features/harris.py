"""Harris3D keypoint detector.

Capability parity with the PCL wrapper (`PCLKeypoints/src/keypoints.cpp:39-60`,
HarrisKeypoint3D HARRIS method): the corner response is computed from the
covariance of surface normals in each point's radius neighborhood,
r = det(C) - k * trace(C)^2 (k = 0.04, PCL's constant), followed by a
threshold and radius NMS. Harris6D (`:64-84`) follows PCL's
HarrisKeypoint6D: tangent-plane intensity gradients
(IntensityGradientEstimation), unit-normalized, stacked with the normals
into a per-neighborhood 6x6 second-moment matrix whose smallest
eigenvalue (Tomasi) is the response.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.lax import Precision as _P

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
    C = jnp.einsum("nki,nkj->nij", nbr_n, nbr_n,
                   precision=_P.HIGHEST) / cnt[:, None, None]
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
def intensity_gradients(points: jax.Array, intensity: jax.Array,
                        normals: jax.Array,
                        mask: Optional[jax.Array] = None,
                        radius: float = 0.5,
                        k_cap: int = 64,
                        normal_k: int = 16) -> jax.Array:
    """Per-point tangent-plane intensity gradient, PCL
    `IntensityGradientEstimation` semantics: least-squares spatial
    gradient of `intensity` over the radius neighborhood (centered at
    the neighborhood centroid / mean intensity), with the surface-normal
    component projected out so the gradient lives in the local tangent
    plane. Returns [N,3].
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    res = radius_search(points, points, radius, k_cap, db_mask=mask)
    w = res.valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    nbr_p = group_points(points, res.idx)
    nbr_i = jnp.where(res.valid, intensity[res.idx], 0.0)
    centroid = jnp.sum(nbr_p * w[..., None], axis=1) / cnt[:, None]
    mean_i = jnp.sum(nbr_i * w, axis=1) / cnt
    dp = (nbr_p - centroid[:, None, :]) * w[..., None]      # [N,K,3]
    di = (nbr_i - mean_i[:, None]) * w                      # [N,K]
    A = jnp.einsum("nki,nkj->nij", dp, dp, precision=_P.HIGHEST) + 1e-9 * jnp.eye(3)
    b = jnp.einsum("nki,nk->ni", dp, di, precision=_P.HIGHEST)
    grad = jnp.linalg.solve(A, b[..., None])[..., 0]        # [N,3]
    # tangential projection: g - (g . n) n
    return grad - jnp.sum(grad * normals, axis=-1, keepdims=True) * normals


@partial(jax.jit, static_argnames=("k_cap", "normal_k"))
def harris6d_keypoints(points: jax.Array,
                       intensity: jax.Array,
                       mask: Optional[jax.Array] = None,
                       radius: float = 0.5,
                       threshold: float = 0.0,
                       k_cap: int = 64,
                       normal_k: int = 16,
                       normals: Optional[jax.Array] = None) -> HarrisResult:
    """Harris6D: PCL HarrisKeypoint6D semantics (`keypoints.cpp:64-84`).

    The PCL algorithm: (1) surface normals; (2) per-point TANGENT-PLANE
    intensity gradients (`IntensityGradientEstimation` — least-squares
    spatial gradient with the normal component projected out); (3) per
    point, the 6x6 second-moment matrix of the stacked 6-vector
    [n_x,n_y,n_z, g_x,g_y,g_z] over the radius neighborhood (gradients
    magnitude-normalized so appearance and geometry contribute on the
    same scale); (4) TOMASI response = smallest eigenvalue of the 6x6;
    (5) threshold + radius NMS. A purely-geometric corner and a
    purely-photometric corner both need the OTHER subspace to be
    well-conditioned for a large lambda_min — the true 6D coupling the
    earlier two-separate-3x3 stand-in lacked.
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    if normals is None:
        normals = estimate_normals(points, mask=mask, k=normal_k)
    grad = intensity_gradients(points, intensity, normals, mask=mask,
                               radius=radius, k_cap=k_cap,
                               normal_k=normal_k)
    gn = jnp.linalg.norm(grad, axis=-1, keepdims=True)
    # unit-normalize (PCL compute() does); leave true-zero gradients zero
    # rather than blowing float noise up to unit vectors
    grad_u = jnp.where(gn > 1e-8, grad / jnp.maximum(gn, 1e-12), 0.0)

    res = radius_search(points, points, radius, k_cap, db_mask=mask)
    w = res.valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    v6 = jnp.concatenate([normals, grad_u], axis=-1)        # [N,6]
    nbr_v = group_points(v6, res.idx) * w[..., None]        # [N,K,6]
    C6 = jnp.einsum("nki,nkj->nij", nbr_v, nbr_v,
                    precision=_P.HIGHEST) / cnt[:, None, None]
    response = jnp.linalg.eigvalsh(C6)[:, 0]                # lambda_min
    cand = mask & (response > threshold)
    keep = radius_nms(points, response, cand, radius, k_cap=k_cap)
    return HarrisResult(keep, response)


def rgb_to_intensity(rgb: jax.Array) -> jax.Array:
    """[N,3] RGB -> [N] luma (Rec.601 weights, PCL's RGB->I conversion)."""
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
            + 0.114 * rgb[..., 2])
