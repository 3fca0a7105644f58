"""Weighted Procrustes / Umeyama rigid alignment.

Capability parity with the reference's centering-matrix SVD solve
(`Registration/main.py:131-141`), generalized to per-correspondence weights —
the masked-correspondence form every fixed-shape ICP iteration needs (invalid
associations get weight 0 instead of being compacted away).

Unlike the reference (plain R = U V^T, which can return a reflection for
degenerate/noisy correspondence sets), the proper det-sign correction is
applied by default.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pctpu.core import se3


def weighted_procrustes(src: jax.Array, dst: jax.Array,
                        weights: Optional[jax.Array] = None,
                        allow_reflection: bool = False):
    """Find (R, t) minimizing sum_i w_i ||R src_i + t - dst_i||^2.

    src, dst: [N,3]; weights: [N] (>=0). Returns (R [3,3], t [3]).
    """
    n = src.shape[0]
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    w = weights.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    src_c = jnp.sum(src * w[:, None], axis=0) / wsum
    dst_c = jnp.sum(dst * w[:, None], axis=0) / wsum
    a = (src - src_c) * w[:, None]
    b = dst - dst_c
    # cross-covariance H = sum w (dst-dc)(src-sc)^T — a 3x3 from one matmul
    H = jax.lax.dot_general(b, a, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    U, _, Vt = jnp.linalg.svd(H)
    if allow_reflection:
        R = U @ Vt
    else:
        d = jnp.linalg.det(U @ Vt)
        S = jnp.diag(jnp.array([1.0, 1.0, 1.0], jnp.float32)).at[2, 2].set(d)
        R = U @ S @ Vt
    t = dst_c - R @ src_c
    return R, t


def procrustes_from_moments(M: jax.Array, allow_reflection: bool = False):
    """Rigid alignment from the homogeneous moment matrix
    M [4,4] = sum_i w_i [p_i;1][q_i;1]^T, i.e. M[:3,:3] = sum w p q^T,
    M[:3,3] = sum w p, M[3,:3] = sum w q, M[3,3] = sum w (p = src, q = dst).
    Algebraically identical to `weighted_procrustes`:
    H = sum w q p^T - Sq Sp^T / Sw. This is the epilogue of the fused banded
    ICP kernel (pctpu.ops.pallas_banded.icp_moments_banded) and the
    psum-reduction form of the point-sharded multi-device ICP.
    """
    sw = jnp.maximum(M[3, 3], 1e-12)
    sp = M[:3, 3]
    sq = M[3, :3]
    spq = M[:3, :3].T  # q-major: sum w q p^T
    src_c = sp / sw
    dst_c = sq / sw
    H = spq - jnp.outer(sq, sp) / sw
    U, _, Vt = jnp.linalg.svd(H)
    if allow_reflection:
        R = U @ Vt
    else:
        d = jnp.linalg.det(U @ Vt)
        S = jnp.diag(jnp.array([1.0, 1.0, 1.0], jnp.float32)).at[2, 2].set(d)
        R = U @ S @ Vt
    t = dst_c - R @ src_c
    return R, t


def procrustes_transform(src: jax.Array, dst: jax.Array,
                         weights: Optional[jax.Array] = None) -> jax.Array:
    """Same, returned as a 4x4 homogeneous transform."""
    R, t = weighted_procrustes(src, dst, weights)
    return se3.make_transform(R, t)
