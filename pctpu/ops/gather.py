"""Gather / group ops (reference CUDA kernels C14/C16, re-cast as XLA gathers).

`gather_points_kernel` / `group_points_kernel`
(`sampling_gpu.cu:8-57`, `group_points_gpu.cu:8-64`) are plain gathers with
scatter-add gradients. XLA's native gather + its transpose (deterministic
scatter-add, no atomics — SURVEY.md §5.2) are already optimal on TPU, so these
are thin, differentiable wrappers establishing the op-layer API.

Layout note: the reference uses channels-first [B,C,N] (CUDA coalescing).
TPU/XLA prefers channels-last [.., N, C] (lane dimension = features); the
whole framework uses channels-last.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _flat_row_gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather with explicit batch dims folded into the index.

    points [*B, N, C], idx [*B, M] int32 -> [*B, M, C].

    XLA's gather-with-batch-dims lowers poorly on TPU (measured 21 ms for
    a [16,2048,33] by [16,2048,100] group on v5e vs 8 ms for the same
    gather with the batch folded into a flat index — tools/probe history,
    r4). Flattening [*B,N,C] -> [B*N, C] and offsetting the indices by
    b*N turns it into the fast single-axis row-gather path.
    """
    bshape = points.shape[:-2]
    n, c = points.shape[-2], points.shape[-1]
    if not bshape:
        return jnp.take(points, idx, axis=0)
    b = 1
    for s in bshape:
        b *= s
    flat_p = points.reshape(b * n, c)
    off = jnp.arange(b, dtype=jnp.int32) * n
    # clip BEFORE the batch offset: a negative / >= N index would
    # otherwise silently read the adjacent batch element's rows
    idx = jnp.clip(idx, 0, n - 1)
    flat_i = (idx.reshape(b, -1) + off[:, None]).reshape(-1)
    out = jnp.take(flat_p, flat_i, axis=0)
    return out.reshape(bshape + idx.shape[len(bshape):] + (c,))


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points [..., N, C], idx [..., M] -> [..., M, C]."""
    return _flat_row_gather(points, idx)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points [..., N, C], idx [..., M, K] -> [..., M, K, C]."""
    b = idx.shape[:-2]
    m, k = idx.shape[-2], idx.shape[-1]
    flat = idx.reshape(b + (m * k,))
    out = _flat_row_gather(points, flat)
    return out.reshape(b + (m, k, points.shape[-1]))


def mask_group(grouped: jax.Array, valid: jax.Array,
               fill: float = 0.0) -> jax.Array:
    """Zero out invalid grouped entries: grouped [...,M,K,C], valid [...,M,K]."""
    return jnp.where(valid[..., None], grouped, jnp.asarray(fill, grouped.dtype))
