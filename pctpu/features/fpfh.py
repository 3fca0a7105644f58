"""FPFH-33 descriptors (two-pass SPFH histograms), fully vectorized.

Re-design of the PCL path used by the registration pipeline
(`Registration/main.py:44-46`: o3d compute_fpfh_feature radius=10 max_nn=100;
`PCLKeypoints/src/keypoints.cpp:112-163`). The per-point Darboux-frame angle
triplets and histogram accumulation (PCL's pair-feature loop) become one
batched gather + one-hot segment reduction; the neighbor-weighted second pass
is a single weighted gather-sum (SURVEY.md §2.1 item 8).

Per neighbor pair (p -> q), with u = n_p, v = normalize(d x u), w = u x v,
d = (q - p)/|q - p|:
    f1 (alpha) = v . n_q               in [-1, 1]
    f2 (phi)   = u . d                 in [-1, 1]
    f3 (theta) = atan2(w . n_q, u . n_q) in [-pi, pi]
11 bins each -> 33-D; FPFH_i = SPFH_i + (1/k) sum_j (1/d_ij) SPFH_j, each
11-bin block renormalized to sum 100 (PCL convention).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from pctpu.ops.gather import group_points
from pctpu.ops.knn import radius_search, NeighborSet
from pctpu.ops.normals import estimate_normals

N_BINS = 11


def _bin(x, lo, hi):
    b = jnp.floor((x - lo) / (hi - lo) * N_BINS).astype(jnp.int32)
    return jnp.clip(b, 0, N_BINS - 1)


def _pair_features(p, n_p, q, n_q):
    """p,n_p [N,3]; q,n_q [N,K,3] -> (f1, f2, f3) each [N,K]."""
    d = q - p[:, None, :]
    dist = jnp.linalg.norm(d, axis=-1)
    dhat = d / jnp.maximum(dist, 1e-12)[..., None]
    u = n_p[:, None, :]
    v = jnp.cross(dhat, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    w = jnp.cross(u, v)
    f1 = jnp.sum(v * n_q, axis=-1)
    f2 = jnp.sum(u * dhat, axis=-1)
    f3 = jnp.arctan2(jnp.sum(w * n_q, axis=-1), jnp.sum(u * n_q, axis=-1))
    return f1, f2, f3, dist


def _histogram(f, valid):
    """f [N,K] binned -> [N, N_BINS] with PCL's 100/nr_neighbors increments."""
    oh = jax.nn.one_hot(f, N_BINS, dtype=jnp.float32)       # [N,K,B]
    oh = oh * valid[..., None]
    cnt = jnp.maximum(jnp.sum(valid, axis=1), 1.0)
    return 100.0 * jnp.sum(oh, axis=1) / cnt[:, None]


@jax.jit
def spfh(points: jax.Array, normals: jax.Array,
         neighbors: NeighborSet) -> jax.Array:
    """Simplified Point Feature Histogram per point -> [N,33]."""
    q = group_points(points, neighbors.idx)
    n_q = group_points(normals, neighbors.idx)
    f1, f2, f3, _ = _pair_features(points, normals, q, n_q)
    rows = jax.lax.broadcasted_iota(jnp.int32, neighbors.idx.shape, 0)
    valid = (neighbors.valid & (neighbors.idx != rows)).astype(jnp.float32)
    h1 = _histogram(_bin(f1, -1.0, 1.0), valid)
    h2 = _histogram(_bin(f2, -1.0, 1.0), valid)
    h3 = _histogram(_bin(f3, -jnp.pi, jnp.pi), valid)
    return jnp.concatenate([h1, h2, h3], axis=-1)


@partial(jax.jit, static_argnames=("k_cap", "normal_k"))
def fpfh(points: jax.Array,
         mask: Optional[jax.Array] = None,
         normals: Optional[jax.Array] = None,
         radius: float = 10.0,
         k_cap: int = 100,
         normal_k: int = 30) -> jax.Array:
    """points [N,3] -> FPFH descriptors [N,33].

    Defaults mirror the reference registration pipeline: descriptor radius
    10, max 100 neighbors (`main.py:44-46`), normals from 30 neighbors
    (`main.py:39-40`).
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    if normals is None:
        normals = estimate_normals(points, mask=mask, k=normal_k)

    nbrs = radius_search(points, points, radius, k_cap, db_mask=mask)
    s = spfh(points, normals, nbrs)                          # [N,33]

    rows = jax.lax.broadcasted_iota(jnp.int32, nbrs.idx.shape, 0)
    not_self = nbrs.valid & (nbrs.idx != rows)
    dist = jnp.sqrt(jnp.maximum(nbrs.dist2, 1e-12))
    wgt = jnp.where(not_self, 1.0 / dist, 0.0)               # [N,K]
    k_eff = jnp.maximum(jnp.sum(not_self, axis=1).astype(jnp.float32), 1.0)
    nbr_spfh = group_points(s, nbrs.idx)                     # [N,K,33]
    f = s + jnp.sum(nbr_spfh * wgt[..., None], axis=1) / k_eff[:, None]

    # renormalize each 11-bin block to sum 100 (PCL convention)
    blocks = f.reshape(n, 3, N_BINS)
    sums = jnp.maximum(jnp.sum(blocks, axis=-1, keepdims=True), 1e-12)
    return (100.0 * blocks / sums).reshape(n, 3 * N_BINS)
