"""SHOT-352 descriptors (Signature of Histograms of OrienTations).

Capability parity with `PCLKeypoints/src/keypoints.cpp:166-235`
(`featureSHOT352(WithNormal)`): per keypoint — a repeatable local reference
frame (LRF) from the distance-weighted neighborhood covariance with sign
disambiguation, a 32-sector spatial partition (8 azimuth x 2 elevation x 2
radial shells), and an 11-bin histogram of cos(angle between the keypoint
LRF z-axis and each neighbor normal) per sector -> 352-D, L2-normalized.

Vectorized: every keypoint's LRF is one closed-form 3x3 eigensolve; the
sector/bin assignment is a one-hot scatter over [K, 32*11].
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.lax import Precision as _P

from pctpu.ops.eigh3 import eigh3
from pctpu.ops.gather import group_points
from pctpu.ops.knn import radius_search
from pctpu.ops.normals import estimate_normals

N_AZIMUTH = 8
N_ELEVATION = 2
N_RADIAL = 2
N_SPATIAL = N_AZIMUTH * N_ELEVATION * N_RADIAL  # 32
N_COS_BINS = 11
DESC_DIM = N_SPATIAL * N_COS_BINS               # 352


def _local_reference_frames(keypoints, db_points, nbrs, radius):
    """Distance-weighted covariance LRF with sign disambiguation.

    keypoints [M,3]; db_points [N,3] (what nbrs.idx indexes into).
    Returns [M,3,3] rows = (x,y,z) LRF axes.
    """
    nbr = group_points(db_points, nbrs.idx)                # [M,K,3]
    d = jnp.sqrt(jnp.maximum(nbrs.dist2, 0.0))
    w = jnp.where(nbrs.valid, radius - d, 0.0)             # SHOT weighting
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    diff = (nbr - keypoints[:, None, :])
    cov = jnp.einsum("mk,mki,mkj->mij", w, diff, diff,
                     precision=_P.HIGHEST) / wsum[:, None, None]
    _, V = eigh3(cov)
    x_axis = V[:, :, 2]                                    # largest eigval
    z_axis = V[:, :, 0]                                    # smallest
    # sign disambiguation: majority of neighbors on positive side
    sx = jnp.sum(jnp.where(nbrs.valid,
                           jnp.sign(jnp.einsum("mki,mi->mk", diff, x_axis,
                                               precision=_P.HIGHEST)),
                           0.0), axis=1)
    x_axis = x_axis * jnp.where(sx < 0, -1.0, 1.0)[:, None]
    sz = jnp.sum(jnp.where(nbrs.valid,
                           jnp.sign(jnp.einsum("mki,mi->mk", diff, z_axis,
                                               precision=_P.HIGHEST)),
                           0.0), axis=1)
    z_axis = z_axis * jnp.where(sz < 0, -1.0, 1.0)[:, None]
    # re-orthogonalize x against z, y = z x x
    x_axis = x_axis - jnp.sum(x_axis * z_axis, axis=1, keepdims=True) * z_axis
    x_axis = x_axis / jnp.maximum(
        jnp.linalg.norm(x_axis, axis=1, keepdims=True), 1e-12)
    y_axis = jnp.cross(z_axis, x_axis)
    return jnp.stack([x_axis, y_axis, z_axis], axis=1)     # [M,3,3]


@partial(jax.jit, static_argnames=("k_cap", "normal_k"))
def shot352(points: jax.Array,
            keypoints: jax.Array,
            mask: Optional[jax.Array] = None,
            normals: Optional[jax.Array] = None,
            radius: float = 1.0,
            k_cap: int = 128,
            normal_k: int = 16) -> jax.Array:
    """points [N,3], keypoints [M,3] -> [M,352] descriptors."""
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    if normals is None:
        # orient to the cloud centroid: a rotation-equivariant sign choice,
        # so the cos(theta) histogram is rotation-invariant
        w = mask.astype(jnp.float32)
        centroid = jnp.sum(points * w[:, None], axis=0) / jnp.maximum(
            jnp.sum(w), 1.0)
        normals = estimate_normals(points, mask=mask, k=normal_k,
                                   viewpoint=centroid)

    nbrs = radius_search(keypoints, points, radius, k_cap, db_mask=mask)
    lrf = _local_reference_frames(keypoints, points, nbrs, radius)  # [M,3,3]

    nbr_p = group_points(points, nbrs.idx)                  # [M,K,3]
    nbr_n = group_points(normals, nbrs.idx)
    local = jnp.einsum("mai,mki->mka", lrf,
                       nbr_p - keypoints[:, None, :],
                       precision=_P.HIGHEST)
    d = jnp.linalg.norm(local, axis=-1)

    azimuth = jnp.arctan2(local[..., 1], local[..., 0])     # [-pi,pi]
    az_bin = jnp.clip(jnp.floor(
        (azimuth + jnp.pi) / (2 * jnp.pi) * N_AZIMUTH).astype(jnp.int32),
        0, N_AZIMUTH - 1)
    el_bin = (local[..., 2] >= 0).astype(jnp.int32)
    rad_bin = (d >= radius * 0.5).astype(jnp.int32)
    sector = (rad_bin * N_ELEVATION + el_bin) * N_AZIMUTH + az_bin

    cos_t = jnp.clip(jnp.einsum("mi,mki->mk", lrf[:, 2], nbr_n,
                                precision=_P.HIGHEST), -1.0, 1.0)
    cos_bin = jnp.clip(jnp.floor(
        (cos_t + 1.0) / 2.0 * N_COS_BINS).astype(jnp.int32), 0, N_COS_BINS - 1)

    flat = sector * N_COS_BINS + cos_bin                    # [M,K]
    valid = nbrs.valid & (d > 1e-9)
    oh = jax.nn.one_hot(flat, DESC_DIM, dtype=jnp.float32) * \
        valid[..., None].astype(jnp.float32)
    desc = jnp.sum(oh, axis=1)                              # [M,352]
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-12)
    return desc / norm
