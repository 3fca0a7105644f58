"""ISS (Intrinsic Shape Signature) keypoint detection.

Re-design of the reference's from-scratch Python loop
(`Keypoint_detection_ISS/ISS.py:41-73`) and the PCL wrapper defaults
(`PCLKeypoints/src/keypoints.cpp:243-250`: salient_radius=3.0,
non_max_radius=2.0, gamma21=gamma32=0.975, min_neighbors=5):

  per point i: scatter = sum_j w_j (p_j - p_i)(p_j - p_i)^T / sum_j w_j
  with w_j = 1 / |N_radius(j)| (reference weighting, ISS.py:48-50);
  eigenvalues l1>=l2>=l3; candidate iff l2/l1 < g21 and l3/l2 < g32 and
  enough neighbors; saliency = l3; radius NMS.

Every per-point eigenproblem runs through the closed-form batched 3x3 solver;
the whole detector is two neighbor queries + one fused elementwise program.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.lax import Precision as _P

from pctpu.ops.eigh3 import eigvalsh3
from pctpu.ops.gather import group_points
from pctpu.ops.knn import radius_search
from pctpu.features.nms import radius_nms, top_k_mask


class ISSResult(NamedTuple):
    keypoint_mask: jax.Array   # [N] bool
    saliency: jax.Array        # [N] f32 (lambda3)
    eigvals: jax.Array         # [N,3] descending


@partial(jax.jit, static_argnames=("k_cap", "min_neighbors", "max_keypoints"))
def iss_keypoints(points: jax.Array,
                  mask: Optional[jax.Array] = None,
                  salient_radius: float = 3.0,
                  non_max_radius: float = 2.0,
                  gamma_21: float = 0.975,
                  gamma_32: float = 0.975,
                  min_neighbors: int = 5,
                  k_cap: int = 64,
                  max_keypoints: int = 0) -> ISSResult:
    """points [N,3] -> ISSResult. max_keypoints=0 means uncapped."""
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)

    res = radius_search(points, points, salient_radius, k_cap, db_mask=mask)
    # reference weight: 1 / (radius-neighbor count of the neighbor), ISS.py:49
    w_all = 1.0 / jnp.maximum(res.count.astype(jnp.float32), 1.0)  # [N]
    nbr_w = jnp.where(res.valid, w_all[res.idx], 0.0)              # [N,K]
    nbr = group_points(points, res.idx)                            # [N,K,3]
    diff = (nbr - points[:, None, :]) * jnp.sqrt(nbr_w)[..., None]
    scatter = jnp.einsum("nki,nkj->nij", diff, diff, precision=_P.HIGHEST)
    scatter = scatter / jnp.maximum(
        jnp.sum(nbr_w, axis=1), 1e-12)[:, None, None]

    w = eigvalsh3(scatter)                 # ascending
    l1, l2, l3 = w[:, 2], w[:, 1], w[:, 0]  # descending names
    cand = (mask
            & (res.count >= min_neighbors)
            & (l2 < gamma_21 * l1)
            & (l3 < gamma_32 * l2)
            & (l3 > 0))
    keep = radius_nms(points, l3, cand, non_max_radius, k_cap=k_cap)
    if max_keypoints:
        keep = top_k_mask(l3, keep, max_keypoints)
    return ISSResult(keep, l3, w[:, ::-1])
