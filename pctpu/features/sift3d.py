"""SIFT3D keypoints: scale-space density DoG extrema.

Capability parity with the PCL wrapper (`PCLKeypoints/src/keypoints.cpp:87-109`,
pcl::SIFTKeypoint over xyz with (min_scale, n_octaves, n_scales_per_octave,
min_contrast)): the scale-space "intensity" for a bare point cloud is local
density; a Gaussian-weighted density estimate at a geometric ladder of scales
yields a difference-of-Gaussians response, and keypoints are spatial-NMS'd
scale-extrema above min_contrast.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pctpu.ops.knn import radius_search
from pctpu.features.nms import radius_nms


class SIFT3DResult(NamedTuple):
    keypoint_mask: jax.Array   # [N] bool
    response: jax.Array        # [N] best |DoG| across scales
    scale: jax.Array           # [N] scale of the best response


@partial(jax.jit, static_argnames=("n_octaves", "scales_per_octave", "k_cap"))
def sift3d_keypoints(points: jax.Array,
                     mask: Optional[jax.Array] = None,
                     min_scale: float = 0.1,
                     n_octaves: int = 3,
                     scales_per_octave: int = 4,
                     min_contrast: float = 0.05,
                     k_cap: int = 96) -> SIFT3DResult:
    """points [N,3] -> scale-space DoG keypoints."""
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)

    n_scales = n_octaves * scales_per_octave + 1
    scales = min_scale * (2.0 ** (jnp.arange(n_scales) / scales_per_octave))
    max_r = min_scale * (2.0 ** (n_octaves + 0.5))

    # one neighbor list at the largest support radius serves every scale
    nbrs = radius_search(points, points, max_r, k_cap, db_mask=mask)
    d2 = jnp.where(nbrs.valid, nbrs.dist2, jnp.inf)         # [N,K]

    def density(sigma):
        w = jnp.exp(-d2 / (2.0 * sigma * sigma))
        return jnp.sum(jnp.where(nbrs.valid, w, 0.0), axis=1)

    dens = jax.vmap(density)(scales)                        # [S,N]
    # normalize each scale level to zero-mean/unit-std so DoG contrast is
    # comparable across scales
    mu = jnp.mean(dens, axis=1, keepdims=True)
    sd = jnp.maximum(jnp.std(dens, axis=1, keepdims=True), 1e-12)
    dens = (dens - mu) / sd
    dog = dens[1:] - dens[:-1]                              # [S-1,N]

    # scale extremum: |DoG| maximal across adjacent scales
    abs_dog = jnp.abs(dog)
    best_s = jnp.argmax(abs_dog, axis=0)                    # [N]
    response = jnp.max(abs_dog, axis=0)
    best_scale = scales[best_s]

    cand = mask & (response > min_contrast)
    keep = radius_nms(points, response, cand,
                      radius=min_scale * 2.0, k_cap=k_cap)
    return SIFT3DResult(keep, response, best_scale)
