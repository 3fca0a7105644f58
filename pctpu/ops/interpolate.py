"""Three-NN inverse-distance feature interpolation (PointNet++ FP path).

Reference CUDA kernels: `interpolate_gpu.cu:9-154` (brute 3-NN with a running
top-3, then a 3-term weighted gather with atomicAdd gradient). TPU re-design:
tiled distance + `lax.top_k` for the 3-NN; the interpolation is a pure-XLA
weighted gather whose autodiff transpose is a deterministic scatter-add.

Weight parity: w = 1/(sqrt(d2)+1e-8), normalized — the reference's ThreeNN
returns sqrt'd distances (`pointnet2_utils.py:124-125`) and the FP module adds
eps to that L2 distance (`pointnet2_modules.py:185-189`).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from pctpu.ops.knn import knn
from pctpu.ops.gather import group_points


@partial(jax.jit, static_argnames=("query_chunk",))
def three_nn(query: jax.Array, db: jax.Array,
             db_mask: Optional[jax.Array] = None,
             query_chunk: int = 1024):
    """query [M,3], db [N,3] -> (dist2 [M,3], idx [M,3]), ascending."""
    res = knn(query, db, 3, db_mask=db_mask, query_chunk=query_chunk)
    return res.dist2, res.idx


def interpolation_weights(dist2: jax.Array, eps: float = 1e-8) -> jax.Array:
    """[...,3] squared distances -> normalized inverse-L2-distance weights
    (reference formula: 1/(sqrt(d2)+eps), normalized)."""
    recip = 1.0 / (jnp.sqrt(dist2) + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def three_interpolate(features: jax.Array, idx: jax.Array,
                      weights: jax.Array) -> jax.Array:
    """features [..., N, C], idx [..., M, 3], weights [..., M, 3] -> [..., M, C]."""
    gathered = group_points(features, idx)          # [..., M, 3, C]
    return jnp.sum(gathered * weights[..., None], axis=-2)
