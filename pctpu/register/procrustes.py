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


def rotation_polar3(H: jax.Array) -> jax.Array:
    """Nearest rotation to a 3x3 H (the Procrustes R) via closed-form polar
    decomposition: H = R (H^T H)^{1/2} with the symmetric square root from
    `pctpu.ops.eigh3` — pure elementwise math, no iterative SVD custom
    call. The proper-rotation (det +1) correction flips the smallest
    singular direction, matching SVD-with-sign-correction.

    Requires H to be well-conditioned (ICP moment matrices over thousands
    of inliers are); `weighted_procrustes` keeps the SVD for the general
    case.
    """
    from pctpu.ops.eigh3 import eigh3
    # scale-normalize first: moment matrices reach ~1e5-1e6 entries and
    # H^T H would hit ~1e11-1e12 where the closed-form f32 eigensolver
    # loses eigenvector accuracy; R is scale-invariant
    H = H / jnp.maximum(jnp.linalg.norm(H), 1e-20)
    HtH = H.T @ H
    w, V = eigh3(HtH)                     # ascending eigenvalues
    s = jnp.sqrt(jnp.maximum(w, 1e-20))   # singular values of H
    # R0 = H V diag(1/s) V^T (orthogonal polar factor, may be a reflection)
    inv_sqrt = (V * (1.0 / s)[None, :]) @ V.T
    R0 = H @ inv_sqrt
    d = jnp.linalg.det(R0)
    # flip along the smallest-singular-value direction when det < 0
    v_min = V[:, 0]
    flip = jnp.eye(3, dtype=H.dtype) - 2.0 * jnp.outer(v_min, v_min)
    return jnp.where(d < 0, R0 @ flip, R0)


def procrustes_from_moments(M: jax.Array, allow_reflection: bool = False,
                            solver: str = "svd"):
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
    if solver == "polar":
        # closed-form (eigh3) polar factor: no iterative SVD in the ICP
        # inner loop; always returns a proper rotation
        R = rotation_polar3(H)
    else:
        U, _, Vt = jnp.linalg.svd(H)
        if allow_reflection:
            R = U @ Vt
        else:
            d = jnp.linalg.det(U @ Vt)
            S = jnp.diag(
                jnp.array([1.0, 1.0, 1.0], jnp.float32)).at[2, 2].set(d)
            R = U @ S @ Vt
    t = dst_c - R @ src_c
    return R, t


def procrustes_transform(src: jax.Array, dst: jax.Array,
                         weights: Optional[jax.Array] = None) -> jax.Array:
    """Same, returned as a 4x4 homogeneous transform."""
    R, t = weighted_procrustes(src, dst, weights)
    return se3.make_transform(R, t)
