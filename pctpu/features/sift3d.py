"""SIFT3D keypoints — PCL `SIFTKeypoint` semantics.

Faithful to the reference wrapper (`PCLKeypoints/src/keypoints.cpp:87-109`
+ the custom field selector `keypoints.hpp:167-178`, which makes the
scale-space "intensity" of a bare-XYZ cloud the point's **y coordinate**):

per octave o (base scale = min_scale * 2^o), PCL builds
`scales_per_octave + 3` Gaussian-smoothed fields
L_sigma(i) = sum_j w_ij f(j) / sum_j w_ij with w = exp(-d^2 / (2 sigma^2)),
takes differences of adjacent levels (DoG), and marks point i a keypoint
at interior level s iff |DoG(i,s)| >= min_contrast AND DoG(i,s) is a
strict extremum against (a) its ~25 spatial nearest neighbors at the same
level and (b) its own values at levels s-1 and s+1. All octaves run on
the full cloud (PCL does not decimate between octaves).

Static-shape deviations (documented): spatial smoothing support is capped
at `k_cap` nearest neighbors (PCL uses an uncapped radius search with
r = 3 * sigma) and the extremum neighborhood is exactly the 25 nearest
neighbors (PCL: nearestKSearch 26 including self).

`field` selects the scale-space signal: 'y' (reference parity, default),
'z', 'density', or a precomputed [N] array.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from pctpu.ops.gather import group_points
from pctpu.ops.knn import knn

BIG = 1e30


class SIFT3DResult(NamedTuple):
    keypoint_mask: jax.Array   # [N] bool — keypoint at ANY (octave, level)
    response: jax.Array        # [N] max |DoG| over levels where extremal
    scale: jax.Array           # [N] sigma of the strongest extremal level


def sift3d_keypoints(points: jax.Array,
                     mask: Optional[jax.Array] = None,
                     min_scale: float = 0.1,
                     n_octaves: int = 3,
                     scales_per_octave: int = 4,
                     min_contrast: float = 0.05,
                     k_cap: int = 96,
                     field: Union[str, jax.Array] = "y") -> SIFT3DResult:
    """points [N,3] -> PCL-style scale-space DoG keypoints.

    Thin non-jitted dispatcher: resolves the string/array `field` into a
    concrete [N] signal (or density mode) OUTSIDE jit — a jax.Array field
    must not be a static argname (r4 advisor, medium)."""
    if isinstance(field, str):
        if field == "y":
            f = points[:, 1]
        elif field == "z":
            f = points[:, 2]
        elif field == "density":
            f = None                     # per-scale density handled below
        else:
            raise ValueError(f"unknown field {field!r}")
    else:
        f = jnp.asarray(field)
    return _sift3d_impl(points, mask, f, min_scale, n_octaves,
                        scales_per_octave, min_contrast, k_cap)


@partial(jax.jit, static_argnames=("n_octaves", "scales_per_octave",
                                   "k_cap"))
def _sift3d_impl(points: jax.Array,
                 mask: Optional[jax.Array],
                 f: Optional[jax.Array],
                 min_scale: float,
                 n_octaves: int,
                 scales_per_octave: int,
                 min_contrast: float,
                 k_cap: int) -> SIFT3DResult:
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)

    # one kNN list serves smoothing at every scale (distance-weighted) and
    # the 25-neighbor extremum test
    nbrs = knn(points, points, min(k_cap, n), db_mask=mask)
    d2 = jnp.where(nbrs.valid, nbrs.dist2, BIG)             # [N,K]
    fv = None if f is None else group_points(f[:, None], nbrs.idx)[..., 0]

    # sigma ladder: octave o level i -> min_scale * 2^o * 2^(i/spo),
    # i in [0, spo+2] (PCL's scales_per_octave + 3 gaussians per octave)
    sigmas = []
    level_oct = []
    for o in range(n_octaves):
        base = min_scale * (2.0 ** o)
        for i in range(scales_per_octave + 3):
            sigmas.append(base * (2.0 ** (i / scales_per_octave)))
            level_oct.append(o)
    sigmas = jnp.asarray(sigmas, jnp.float32)               # [L]

    def smooth(sigma):
        w = jnp.where(nbrs.valid, jnp.exp(-d2 / (2.0 * sigma * sigma)), 0.0)
        if fv is None:
            return jnp.sum(w, axis=1)                       # density mode
        return jnp.sum(w * fv, axis=1) / jnp.maximum(
            jnp.sum(w, axis=1), 1e-12)

    L = jax.vmap(smooth)(sigmas)                            # [L, N]

    # DoG within each octave (no differences across octave boundaries)
    spo = scales_per_octave
    per = spo + 3
    keep_mask = jnp.zeros((n,), bool)
    best_resp = jnp.zeros((n,), jnp.float32)
    best_scale = jnp.zeros((n,), jnp.float32)
    nn25 = nbrs.idx[:, 1:26]                                # exclude self
    nn25_valid = nbrs.valid[:, 1:26]

    for o in range(n_octaves):
        lo = o * per
        dog = L[lo + 1:lo + per] - L[lo:lo + per - 1]       # [per-1, N]
        for s in range(1, per - 2):                         # interior levels
            v = dog[s]                                      # [N]
            nb = jnp.where(nn25_valid, v[nn25], jnp.float32(0.0))
            nb_max = jnp.max(jnp.where(nn25_valid, v[nn25], -BIG), axis=1)
            nb_min = jnp.min(jnp.where(nn25_valid, v[nn25], BIG), axis=1)
            is_max = (v > nb_max) & (v > dog[s - 1]) & (v > dog[s + 1])
            is_min = (v < nb_min) & (v < dog[s - 1]) & (v < dog[s + 1])
            extremal = (is_max | is_min) & mask & (
                jnp.abs(v) >= jnp.float32(min_contrast))
            keep_mask = keep_mask | extremal
            better = extremal & (jnp.abs(v) > best_resp)
            best_resp = jnp.where(better, jnp.abs(v), best_resp)
            best_scale = jnp.where(better, sigmas[lo + s], best_scale)
            del nb
    return SIFT3DResult(keep_mask, best_resp, best_scale)
