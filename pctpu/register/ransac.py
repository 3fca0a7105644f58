"""RANSAC global registration from feature correspondences — batched.

Re-design of the reference's Open3D call
(`Registration/main.py:68-84`: RANSAC on FPFH matches, n=3 samples,
edge-length checker 0.9 + distance checker, 100k iterations): the sequential
hypothesis loop becomes one vectorized axis. All hypotheses are sampled,
solved (vmapped 3-point Procrustes), checked, and scored in a single XLA
program — the TPU plays all 100k lottery tickets at once
(SURVEY.md §7 "RANSAC loops").
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pctpu.core import se3
from pctpu.register.procrustes import weighted_procrustes


class RansacResult(NamedTuple):
    T: jax.Array            # [4,4] best transform
    inliers: jax.Array      # int32 inlier count of the best hypothesis
    inlier_mask: jax.Array  # [M] bool correspondence inliers under best T
    fitness: jax.Array      # f32 inliers / valid correspondences


def _triad_rigid(s: jax.Array, d: jax.Array):
    """Batched exact rigid fit to 3-point samples. s,d [H,3,3] (points in
    rows). Returns (R [H,3,3], t [H,3], nondegen [H] bool). R maps src
    frame to dst frame via per-triangle orthonormal triads (e1 = first
    edge, e2 = Gram-Schmidt of second edge, e3 = e1 x e2)."""

    def triad(x):
        a = x[:, 1] - x[:, 0]
        b = x[:, 2] - x[:, 0]
        e1 = a / jnp.maximum(
            jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        b_perp = b - jnp.sum(b * e1, axis=-1, keepdims=True) * e1
        bn = jnp.linalg.norm(b_perp, axis=-1, keepdims=True)
        e2 = b_perp / jnp.maximum(bn, 1e-12)
        e3 = jnp.cross(e1, e2)
        return jnp.stack([e1, e2, e3], axis=-1), bn[:, 0]  # [H,3,3] cols

    Fs, ns = triad(s)
    Fd, nd = triad(d)
    R = Fd @ jnp.swapaxes(Fs, -1, -2)
    cs = jnp.mean(s, axis=1)
    cd = jnp.mean(d, axis=1)
    t = cd - jnp.einsum("hij,hj->hi", R, cs)
    nondegen = (ns > 1e-6) & (nd > 1e-6)
    return R, t, nondegen


@partial(jax.jit, static_argnames=("num_hypotheses", "refine"))
def ransac_registration(src_pts: jax.Array, dst_pts: jax.Array,
                        corr_valid: Optional[jax.Array] = None,
                        key: Optional[jax.Array] = None,
                        dist_thresh: float = 4.0,
                        edge_ratio: float = 0.9,
                        num_hypotheses: int = 8192,
                        refine: bool = True) -> RansacResult:
    """src_pts/dst_pts [M,3]: matched correspondence pairs (row i of src
    corresponds to row i of dst). Returns the best rigid transform src->dst.

    Checkers mirror Open3D's (main.py:74-80): 3-point samples, pairwise
    edge-length ratio >= edge_ratio in both directions, inlier distance
    < dist_thresh.
    """
    m = src_pts.shape[0]
    if corr_valid is None:
        corr_valid = jnp.ones((m,), bool)
    if key is None:
        key = jax.random.PRNGKey(0)
    thresh2 = jnp.float32(dist_thresh) ** 2
    valid_f = corr_valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid_f), 1.0)

    # Sample 3 correspondence indices per hypothesis, biased to valid rows
    # (invalid rows get probability ~0 via gumbel trick on the mask).
    logits = jnp.where(corr_valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (num_hypotheses, m)) + logits[None, :]
    _, samples = jax.lax.top_k(g, 3)                      # [H,3] distinct rows

    s = src_pts[samples]                                   # [H,3,3]
    d = dst_pts[samples]

    def edge_lens(x):
        e01 = jnp.linalg.norm(x[:, 0] - x[:, 1], axis=-1)
        e02 = jnp.linalg.norm(x[:, 0] - x[:, 2], axis=-1)
        e12 = jnp.linalg.norm(x[:, 1] - x[:, 2], axis=-1)
        return jnp.stack([e01, e02, e12], axis=-1)         # [H,3]

    es, ed = edge_lens(s), edge_lens(d)
    ratio_ok = jnp.all((es > edge_ratio * ed) & (ed > edge_ratio * es), axis=-1)
    sample_ok = ratio_ok & jnp.all(corr_valid[samples], axis=-1)

    # Closed-form triad rotation per hypothesis: orthonormal frames from
    # the two triangles, R = frame(d) frame(s)^T. Exact for congruent
    # 3-point samples (what the edge-ratio checker enforces) and SVD-free
    # — 8192 batched 3x3 SVDs measured 56 ms on v5e vs <1 ms for this;
    # the final refine below still solves the full inlier set by SVD.
    # Near-collinear samples (degenerate frames) are rejected.
    Rs, ts, nondegen = _triad_rigid(s, d)                  # [H,3,3], [H,3]
    sample_ok = sample_ok & nondegen

    # Score every hypothesis against all correspondences at once: [H,M]
    transformed = jnp.einsum("hij,mj->hmi", Rs, src_pts) + ts[:, None, :]
    err2 = jnp.sum((transformed - dst_pts[None]) ** 2, axis=-1)
    inl = (err2 < thresh2) & corr_valid[None, :]
    scores = jnp.sum(inl, axis=1) * sample_ok.astype(jnp.int32)

    best = jnp.argmax(scores)
    R, t = Rs[best], ts[best]
    inlier_mask = inl[best]

    if refine:
        R, t = weighted_procrustes(src_pts, dst_pts,
                                   inlier_mask.astype(jnp.float32))
        err2b = jnp.sum((src_pts @ R.T + t - dst_pts) ** 2, axis=-1)
        inlier_mask = (err2b < thresh2) & corr_valid

    T = se3.make_transform(R, t)
    inliers = jnp.sum(inlier_mask).astype(jnp.int32)
    return RansacResult(T, inliers, inlier_mask, inliers / n_valid)
