"""Radius non-maximum suppression over per-point saliency scores."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pctpu.ops.pairwise import pairwise_sqdist


@partial(jax.jit, static_argnames=("k_cap", "query_chunk"))
def radius_nms(points: jax.Array, scores: jax.Array,
               candidate: jax.Array, radius: float,
               k_cap: int = 64, query_chunk: int = 1024) -> jax.Array:
    """Keep candidates whose score is the strict local max among candidates
    within `radius` (PCL ISS/Harris NMS semantics; the reference's Python
    greedy-sorted suppression in `ISS.py:59-72` keeps the same peaks for
    distinct scores). Ties break toward the lower index.

    EXACT regardless of neighborhood density: the max score within the
    radius is reduced over the full tiled distance pass directly — the same
    O(N^2) tiles a capped radius_search would compute, but with no k_cap
    truncation that could let a non-maximum survive in dense clouds (the
    round-1 NMS compared only the k_cap nearest). `k_cap` is kept for API
    compatibility and ignored.

    Returns keep mask [N].
    """
    del k_cap
    n = points.shape[0]
    r2 = jnp.float32(radius) ** 2
    cand_scores = jnp.where(candidate, scores, -jnp.inf)
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    pad = (-n) % query_chunk
    q = jnp.pad(points, ((0, pad), (0, 0))).reshape(
        -1, query_chunk, points.shape[-1])

    def one_chunk(qc):
        d2 = pairwise_sqdist(qc, points, candidate)        # [q, N]
        within = d2 <= r2
        nbr = jnp.where(within, cand_scores[None, :], -jnp.inf)
        best = jnp.max(nbr, axis=1)
        best_idx = jnp.min(
            jnp.where(nbr >= best[:, None], ids[None, :], 2**31 - 1), axis=1)
        return best, best_idx

    best, best_idx = jax.lax.map(one_chunk, q)
    best = best.reshape(-1)[:n]
    best_idx = best_idx.reshape(-1)[:n]
    keep = candidate & (scores >= best) & (best_idx >= ids)
    return keep


def top_k_mask(scores: jax.Array, keep: jax.Array, k: int) -> jax.Array:
    """Cap a keep-mask at the k highest scores (the reference's iss_count
    cap, `ISS.py:26,70-72`)."""
    masked = jnp.where(keep, scores, -jnp.inf)
    _, idx = jax.lax.top_k(masked, k)
    out = jnp.zeros_like(keep).at[idx].set(True)
    return out & keep
