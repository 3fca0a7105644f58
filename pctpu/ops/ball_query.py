"""Ball query with the reference's exact padding semantics.

Reference kernel (`pointnet2_ops/_ext-src/src/ball_query_gpu.cu:9-44`): for
each center, the first `nsample` db indices (in index order) with
d^2 < radius^2; unfilled slots hold the FIRST hit's index. TPU re-design: a
tiled distance block plus a rank-compaction scatter — no sequential scan.

rank(k) = cumsum of the within-radius mask gives each hit its output slot
directly; a single scatter writes all slots, and a where() fills the padding.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from pctpu.ops.pairwise import pairwise_sqdist


@partial(jax.jit, static_argnames=("radius", "nsample", "query_chunk"))
def ball_query(centers: jax.Array, points: jax.Array,
               radius: float, nsample: int,
               points_mask: Optional[jax.Array] = None,
               query_chunk: int = 512):
    """centers [M,3], points [N,3] -> (idx [M,nsample] int32, valid [M,nsample]).

    `valid[m, j]` is True for the first min(count, nsample) slots; padded
    slots repeat the first hit (reference parity). Centers with zero hits get
    idx 0 and valid all-False (the reference leaves them uninitialized).
    """
    r2 = jnp.float32(radius) ** 2
    m = centers.shape[0]
    pad = (-m) % query_chunk
    cs = jnp.pad(centers, ((0, pad), (0, 0))).reshape(-1, query_chunk, 3)

    def one_chunk(cc):
        d2 = pairwise_sqdist(cc, points, points_mask)  # [q, N]
        within = d2 < r2
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        # first nsample hits in index order = the nsample SMALLEST column
        # indices among hits — one top_k, no scatter (TPU scatters are slow)
        masked_cols = jnp.where(within, cols, jnp.int32(2**30))
        neg_top, _ = jax.lax.top_k(-masked_cols, nsample)
        out = -neg_top                                  # ascending indices
        cnt = jnp.sum(within, axis=1).astype(jnp.int32)
        first_hit = jnp.where(cnt > 0, out[:, 0], 0)
        j = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        filled = j < jnp.minimum(cnt, nsample)[:, None]
        out = jnp.where(filled, out, first_hit[:, None])
        return out, filled

    idx, valid = jax.lax.map(one_chunk, cs)
    return idx.reshape(-1, nsample)[:m], valid.reshape(-1, nsample)[:m]
