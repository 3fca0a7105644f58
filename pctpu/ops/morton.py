"""Morton (Z-order) codes: spatial sorting for window-based grouping.

Interleaves 10 quantized bits per axis into a 30-bit int32 key; consecutive
points in Morton order are spatially compact, which makes fixed strided
windows behave like neighborhoods (the basis of `grouping='window'` in
`pctpu.models.pointnet2` — the TPU-native replacement for gather-based ball
grouping).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

BITS = 10


def _spread_bits(x: jax.Array) -> jax.Array:
    """Spread the low 10 bits of x so there are two zero bits between each
    (standard Morton bit-twiddling, int32)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_codes(points: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
    """points [..., N, 3] -> int32 Morton codes [..., N]; masked points get
    the maximum code (sort last)."""
    if mask is None:
        mask = jnp.ones(points.shape[:-1], bool)
    big = jnp.float32(1e30)
    lo = jnp.min(jnp.where(mask[..., None], points, big), axis=-2,
                 keepdims=True)
    hi = jnp.max(jnp.where(mask[..., None], points, -big), axis=-2,
                 keepdims=True)
    scale = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip(((points - lo) / scale) * (2 ** BITS - 1), 0,
                 2 ** BITS - 1).astype(jnp.int32)
    code = (_spread_bits(q[..., 0])
            | (_spread_bits(q[..., 1]) << 1)
            | (_spread_bits(q[..., 2]) << 2))
    return jnp.where(mask, code, jnp.int32(2**31 - 1))


def morton_sort(points: jax.Array,
                mask: Optional[jax.Array] = None):
    """Returns the Morton-order permutation [..., N] (argsort of codes)."""
    return jnp.argsort(morton_codes(points, mask), axis=-1).astype(jnp.int32)
