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


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points [..., N, C], idx [..., M] -> [..., M, C]."""
    return jnp.take_along_axis(points, idx[..., None], axis=-2)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points [..., N, C], idx [..., M, K] -> [..., M, K, C]."""
    b = idx.shape[:-2]
    m, k = idx.shape[-2], idx.shape[-1]
    flat = idx.reshape(b + (m * k,))
    out = jnp.take_along_axis(points, flat[..., None], axis=-2)
    return out.reshape(b + (m, k, points.shape[-1]))


def mask_group(grouped: jax.Array, valid: jax.Array,
               fill: float = 0.0) -> jax.Array:
    """Zero out invalid grouped entries: grouped [...,M,K,C], valid [...,M,K]."""
    return jnp.where(valid[..., None], grouped, jnp.asarray(fill, grouped.dtype))
