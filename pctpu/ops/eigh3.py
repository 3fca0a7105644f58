"""Closed-form symmetric 3x3 eigendecomposition (batched, VPU-friendly).

ISS saliency, PCA normals, and GMM covariances all need eigensystems of huge
batches of 3x3 symmetric matrices (SURVEY.md §7 "Hard parts"). A general
`jnp.linalg.eigh` is iterative and scalar-heavy; the trigonometric closed form
below is pure elementwise math that vectorizes perfectly on the VPU.

Eigenvalues: Smith's trigonometric method for the characteristic cubic.
Eigenvectors: cross products of rows of (A - lam*I) with magnitude pivoting,
with graceful degradation for (near-)degenerate eigenvalues.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def eigvalsh3(A: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric [...,3,3], ascending, [...,3]."""
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.where(p > 0, p, 1.0)
    # det(B/p) / 2 where B = A - q I
    detB = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detB / (2.0 * safe_p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    w = jnp.stack([e_lo, e_mid, e_hi], axis=-1)
    return jnp.where(p2[..., None] > 0, w, jnp.stack([q, q, q], axis=-1))


def _eigvec_for(A: jax.Array, lam: jax.Array) -> jax.Array:
    """Null-space direction of (A - lam I) via row cross products ([...,3])."""
    B = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    # pick the cross product with the largest magnitude (best conditioning)
    best12 = (n12 >= n01) & (n12 >= n02)
    best02 = (~best12) & (n02 >= n01)
    v = jnp.where(best12[..., None], c12,
                  jnp.where(best02[..., None], c02, c01))
    n = jnp.where(best12, n12, jnp.where(best02, n02, n01))
    return v, n


def eigh3(A: jax.Array, degeneracy_eps: float = 1e-20):
    """Full eigendecomposition of symmetric [...,3,3].

    Returns (w [...,3] ascending, V [...,3,3] with eigenvectors as COLUMNS),
    matching the `jnp.linalg.eigh` convention. Degenerate/isotropic matrices
    fall back to orthonormal completion so V is always a valid rotation-ish
    basis (up to sign).
    """
    A = jnp.asarray(A)
    w = eigvalsh3(A)

    v0, n0 = _eigvec_for(A, w[..., 0])
    v2, n2 = _eigvec_for(A, w[..., 2])

    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-1), 1.0) ** 4
    ok0 = n0 > degeneracy_eps * scale
    ok2 = n2 > degeneracy_eps * scale

    # fall back to arbitrary axis when the null space is >1-dimensional
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], A.dtype), v0.shape)
    v0 = jnp.where(ok0[..., None], v0, ex)
    v0 = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True)

    # make v2 orthogonal to v0 (exact for distinct eigvals; enforced otherwise)
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], A.dtype), v2.shape)
    v2 = jnp.where(ok2[..., None], v2, ez)
    v2 = v2 - jnp.sum(v2 * v0, axis=-1, keepdims=True) * v0
    norm2 = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    # if v2 collapsed onto v0, pick any perpendicular direction
    alt = jnp.cross(v0, jnp.where(
        jnp.abs(v0[..., :1]) < 0.9, ex, ez + jnp.array([0.0, 1.0, 0.0], A.dtype)))
    alt = alt / jnp.linalg.norm(alt, axis=-1, keepdims=True)
    v2 = jnp.where(norm2 > 1e-12, v2 / jnp.maximum(norm2, 1e-30), alt)

    v1 = jnp.cross(v2, v0)

    V = jnp.stack([v0, v1, v2], axis=-1)  # columns = eigenvectors
    return w, V
