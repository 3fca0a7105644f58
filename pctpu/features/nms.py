"""Radius non-maximum suppression over per-point saliency scores."""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from pctpu.ops.knn import radius_search


@partial(jax.jit, static_argnames=("k_cap",))
def radius_nms(points: jax.Array, scores: jax.Array,
               candidate: jax.Array, radius: float,
               k_cap: int = 64) -> jax.Array:
    """Keep candidates whose score is the strict local max among candidates
    within `radius` (PCL ISS/Harris NMS semantics; the reference's Python
    greedy-sorted suppression in `ISS.py:59-72` keeps the same peaks for
    distinct scores). Ties break toward the lower index.

    Returns keep mask [N]."""
    n = points.shape[0]
    res = radius_search(points, points, radius, k_cap, db_mask=candidate)
    nbr_scores = jnp.where(res.valid & candidate[res.idx],
                           scores[res.idx], -jnp.inf)
    best = jnp.max(nbr_scores, axis=1)
    best_idx = jnp.min(
        jnp.where(nbr_scores >= best[:, None], res.idx, 2**31 - 1), axis=1)
    me = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    keep = candidate & (scores >= best) & (best_idx >= me)
    return keep


def top_k_mask(scores: jax.Array, keep: jax.Array, k: int) -> jax.Array:
    """Cap a keep-mask at the k highest scores (the reference's iss_count
    cap, `ISS.py:26,70-72`)."""
    masked = jnp.where(keep, scores, -jnp.inf)
    _, idx = jax.lax.top_k(masked, k)
    out = jnp.zeros_like(keep).at[idx].set(True)
    return out & keep
