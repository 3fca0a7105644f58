"""Descriptor matching: (mutual) nearest neighbor in feature space.

The correspondence source for RANSAC global registration — the TPU-native
counterpart of Open3D's internal feature matching with mutual_filter
(`Registration/main.py:74-77`). Descriptor distance matrices are plain
matmuls (33-D or 352-D features ride the MXU).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Matches(NamedTuple):
    src_idx: jax.Array   # [M] int32 (arange for dense matching)
    dst_idx: jax.Array   # [M] int32 best dst for each src
    dist2: jax.Array     # [M] descriptor distance
    valid: jax.Array     # [M] bool (mutual + mask filters)


def _feat_dist2(a, b, b_mask=None):
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True).T
    cross = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(a2 + b2 - 2.0 * cross, 0.0)
    if b_mask is not None:
        d2 = jnp.where(b_mask[None, :], d2, jnp.float32(1e30))
    return d2


@partial(jax.jit, static_argnames=("mutual",))
def match_features(src_feats: jax.Array, dst_feats: jax.Array,
                   src_mask: Optional[jax.Array] = None,
                   dst_mask: Optional[jax.Array] = None,
                   mutual: bool = True) -> Matches:
    """src_feats [M,C], dst_feats [N,C] -> Matches (one row per src).

    mutual=True keeps only pairs where src->dst and dst->src agree
    (Open3D mutual_filter semantics).
    """
    m = src_feats.shape[0]
    d2 = _feat_dist2(src_feats, dst_feats, dst_mask)      # [M,N]
    best_dst = jnp.argmin(d2, axis=1).astype(jnp.int32)   # [M]
    best_d2 = jnp.min(d2, axis=1)
    valid = jnp.ones((m,), bool) if src_mask is None else src_mask
    if mutual:
        d2b = d2 if src_mask is None else jnp.where(
            src_mask[:, None], d2, jnp.float32(1e30))
        best_src = jnp.argmin(d2b, axis=0).astype(jnp.int32)  # [N]
        rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
        valid = valid & (best_src[best_dst] == rows)
    return Matches(jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0],
                   best_dst, best_d2, valid)
