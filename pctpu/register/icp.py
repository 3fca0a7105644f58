"""ICP refinement — point-to-point and point-to-plane, fully jittable.

TPU re-design of `Registration/main.py:97-156` (and the course skeleton API
`Registration/icp_template.py`): the reference's hottest loop is a Python
`for` over ~1e5 points doing one KDTreeFlann query each
(`main.py:116-121`, SURVEY.md §3.1). Here association is one MXU-tiled 1-NN
over the whole cloud per iteration, correspondences stay fixed-shape with
weight masking (no Python-side compaction), and the whole ICP loop is a
`lax.while_loop` inside jit — zero host round-trips per iteration.

Semantics kept from the reference: distance-threshold outlier rejection
(dist_thresh, `main.py:103,120`), bail-out when associations < 3
(`main.py:125-127`), convergence on increment norms (`main.py:148-154` — but
measured on the *increment* vs identity, fixing the reference's quirk of
comparing successive absolute solves while mutating its source in place).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pctpu.core import se3
from pctpu.ops.knn import nearest
from pctpu.register.procrustes import weighted_procrustes


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    max_iters: int = 100
    dist_thresh: float = 5.0        # association rejection, meters (squared below)
    rot_tol: float = 1e-4           # ||dR - I||_F convergence tolerance
    trans_tol: float = 1e-4         # ||dt|| convergence tolerance
    min_associations: int = 3       # bail-out threshold (main.py:125-127)
    query_chunk: int = 2048
    backend: str = "auto"           # 1-NN backend: auto|pallas|xla


class ICPResult(NamedTuple):
    T: jax.Array            # [4,4] final transform (src -> dst)
    iters: jax.Array        # int32 iterations executed
    num_assoc: jax.Array    # int32 inlier associations at the last iteration
    rmse: jax.Array         # f32 inlier RMSE at the last iteration
    converged: jax.Array    # bool


def _associate(src_t, dst, dst_mask, cfg):
    return nearest(src_t, dst, dst_mask, cfg.query_chunk, backend=cfg.backend)


@partial(jax.jit, static_argnames=("cfg",))
def icp_point_to_point(src: jax.Array, src_mask: jax.Array,
                       dst: jax.Array, dst_mask: jax.Array,
                       init_T: Optional[jax.Array] = None,
                       cfg: ICPConfig = ICPConfig()) -> ICPResult:
    """Point-to-point ICP: src/dst [N,3]/[M,3] padded clouds with masks."""
    if init_T is None:
        init_T = jnp.eye(4, dtype=jnp.float32)
    thresh2 = jnp.float32(cfg.dist_thresh) ** 2

    def cond(state):
        T, it, converged, num, rmse = state
        return (it < cfg.max_iters) & jnp.logical_not(converged)

    def body(state):
        T, it, _, _, _ = state
        src_t = se3.apply_transform(T, src)
        d2, idx = _associate(src_t, dst, dst_mask, cfg)
        w = (src_mask & (d2 < thresh2)).astype(jnp.float32)
        num = jnp.sum(w).astype(jnp.int32)
        matched = dst[idx]
        R, t = weighted_procrustes(src_t, matched, w)
        dT = se3.make_transform(R, t)
        newT = dT @ T
        rot_diff = jnp.linalg.norm(R - jnp.eye(3, dtype=R.dtype))
        t_diff = jnp.linalg.norm(t)
        converged = (rot_diff <= cfg.rot_tol) & (t_diff <= cfg.trans_tol)
        failed = num < cfg.min_associations
        newT = jnp.where(failed, T, newT)
        converged = converged | failed
        rmse = jnp.sqrt(jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1.0))
        return newT, it + 1, converged, num, rmse

    init = (init_T.astype(jnp.float32), jnp.int32(0), jnp.bool_(False),
            jnp.int32(0), jnp.float32(0.0))
    T, iters, converged, num, rmse = jax.lax.while_loop(cond, body, init)
    return ICPResult(T, iters, num, rmse, converged)


@partial(jax.jit, static_argnames=("cfg",))
def icp_point_to_plane(src: jax.Array, src_mask: jax.Array,
                       dst: jax.Array, dst_normals: jax.Array,
                       dst_mask: jax.Array,
                       init_T: Optional[jax.Array] = None,
                       cfg: ICPConfig = ICPConfig()) -> ICPResult:
    """Point-to-plane ICP via small-angle Gauss-Newton.

    Per iteration: minimize sum w ((R p + t - q) . n)^2 linearized with
    xi = (omega, v); J_i = [p' x n_i, n_i]; solve the 6x6 normal equations.
    The 6x6 reduction is a single matmul — and a `psum` away from the
    multi-device point-sharded version (pctpu.parallel).
    """
    if init_T is None:
        init_T = jnp.eye(4, dtype=jnp.float32)
    thresh2 = jnp.float32(cfg.dist_thresh) ** 2

    def cond(state):
        T, it, converged, num, rmse = state
        return (it < cfg.max_iters) & jnp.logical_not(converged)

    def body(state):
        T, it, _, _, _ = state
        src_t = se3.apply_transform(T, src)
        d2, idx = _associate(src_t, dst, dst_mask, cfg)
        w = (src_mask & (d2 < thresh2)).astype(jnp.float32)
        num = jnp.sum(w).astype(jnp.int32)
        q = dst[idx]
        n = dst_normals[idx]
        r = jnp.sum((src_t - q) * n, axis=-1)                  # [N]
        J = jnp.concatenate([jnp.cross(src_t, n), n], axis=-1)  # [N,6]
        Jw = J * w[:, None]
        A = jax.lax.dot_general(Jw, J, (((0,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        b = -(Jw.T @ r)
        A = A + 1e-6 * jnp.eye(6, dtype=jnp.float32)
        xi = jnp.linalg.solve(A, b)
        omega, v = xi[:3], xi[3:]
        dR = _so3_exp(omega)
        dT = se3.make_transform(dR, v)
        newT = dT @ T
        converged = (jnp.linalg.norm(omega) <= cfg.rot_tol) & \
                    (jnp.linalg.norm(v) <= cfg.trans_tol)
        failed = num < cfg.min_associations
        newT = jnp.where(failed, T, newT)
        converged = converged | failed
        rmse = jnp.sqrt(jnp.sum(r * r * w) / jnp.maximum(jnp.sum(w), 1.0))
        return newT, it + 1, converged, num, rmse

    init = (init_T.astype(jnp.float32), jnp.int32(0), jnp.bool_(False),
            jnp.int32(0), jnp.float32(0.0))
    T, iters, converged, num, rmse = jax.lax.while_loop(cond, body, init)
    return ICPResult(T, iters, num, rmse, converged)


@partial(jax.jit, static_argnames=("iters", "dist_thresh", "cell_size",
                                   "cap_per_cell", "query_chunk"))
def icp_fixed_iters_grid(src: jax.Array, src_mask: jax.Array,
                         dst: jax.Array, dst_mask: jax.Array,
                         init_T: Optional[jax.Array] = None,
                         iters: int = 30, dist_thresh: float = 5.0,
                         cell_size: Optional[float] = None,
                         cap_per_cell: int = 64,
                         query_chunk: int = 2048) -> jax.Array:
    """Fixed-iteration ICP with grid-hash association — the O(N) path for
    full-resolution scans (the dst grid is built ONCE; associations are
    exact within min(cell_size, dist_thresh), and anything farther would be
    rejected by the distance threshold regardless)."""
    from pctpu.ops.grid_hash import build_grid, grid_nearest
    if init_T is None:
        init_T = jnp.eye(4, dtype=jnp.float32)
    if cell_size is None:
        cell_size = dist_thresh
    thresh2 = jnp.float32(min(dist_thresh, cell_size)) ** 2
    grid = build_grid(dst, dst_mask, cell_size=cell_size)

    def body(_, T):
        src_t = se3.apply_transform(T, src)
        d2, idx, found = grid_nearest(grid, src_t, cap_per_cell=cap_per_cell,
                                      query_chunk=query_chunk)
        w = (src_mask & found & (d2 < thresh2)).astype(jnp.float32)
        R, t = weighted_procrustes(src_t, dst[idx], w)
        return se3.make_transform(R, t) @ T

    return jax.lax.fori_loop(0, iters, body, init_T.astype(jnp.float32))


@partial(jax.jit, static_argnames=("iters", "dist_thresh", "block",
                                   "window_blocks", "query_tile"))
def icp_fixed_iters_banded(src: jax.Array, src_mask: jax.Array,
                           dst: jax.Array, dst_mask: jax.Array,
                           init_T: Optional[jax.Array] = None,
                           iters: int = 30, dist_thresh: float = 5.0,
                           block: int = 2048, window_blocks: int = 2,
                           query_tile: int = 512) -> jax.Array:
    """Fixed-iteration ICP with the banded sorted Pallas 1-NN
    (`pctpu.ops.pallas_banded`): both clouds sorted once along the widest
    axis; each iteration's association scans only a windowed db slice per
    query tile. O(window) per query instead of O(N) — the full-resolution
    scan path. Associations farther than the window are simply rejected by
    the distance threshold (same as outliers)."""
    from pctpu.ops.pallas_banded import build_banded, nearest_banded
    if init_T is None:
        init_T = jnp.eye(4, dtype=jnp.float32)
    thresh2 = jnp.float32(dist_thresh) ** 2
    bdb = build_banded(dst, dst_mask, block=block)
    # sort src by the same axis once: query tiles stay spatially coherent
    # under the near-rigid per-iteration transforms
    n = src.shape[0]
    svals = jnp.take_along_axis(
        src, jnp.broadcast_to(bdb.axis[None, None], (n, 1)), axis=1)[:, 0]
    svals = jnp.where(src_mask, svals, jnp.float32(1e30))
    sorder = jnp.argsort(svals)
    src_s = src[sorder]
    mask_s = src_mask[sorder]

    def body(_, T):
        src_t = se3.apply_transform(T, src_s)
        d2, idx = nearest_banded(bdb, src_t, block=block,
                                 window_blocks=window_blocks,
                                 query_tile=query_tile)
        w = (mask_s & (d2 < thresh2)).astype(jnp.float32)
        R, t = weighted_procrustes(src_t, dst[idx], w)
        return se3.make_transform(R, t) @ T

    return jax.lax.fori_loop(0, iters, body, init_T.astype(jnp.float32))


@partial(jax.jit, static_argnames=("iters", "dist_thresh", "block",
                                   "window_blocks", "query_tile",
                                   "interpret", "solver",
                                   "tiles_per_step", "unroll"))
def icp_fixed_iters_banded_fused(src: jax.Array, src_mask: jax.Array,
                                 dst: jax.Array, dst_mask: jax.Array,
                                 init_T: Optional[jax.Array] = None,
                                 iters: int = 30, dist_thresh: float = 5.0,
                                 block: int = 2048, window_blocks: int = 2,
                                 query_tile: int = 512,
                                 interpret: bool = False,
                                 solver: str = "polar",
                                 tiles_per_step: int = 4,
                                 unroll: int = 1) -> jax.Array:
    """Fully fused banded ICP: each iteration is ONE Pallas kernel that does
    windowed 1-NN association AND the weighted-Procrustes moment reduction
    (`pctpu.ops.pallas_banded.icp_moments_banded`) — no per-point gather, no
    [N]-sized intermediates in HBM. The only per-iteration XLA work outside
    the kernel is the [N,3]x[3,3] transform apply, the tile-offset LUT
    lookup, and a 3x3 rotation solve. Semantics identical to
    `icp_fixed_iters_banded`.

    solver: 'polar' (default) = closed-form Newton-polar Procrustes
    (`procrustes.rotation_polar3`) — removes the iterative SVD custom call
    from the inner loop; measured 1269 vs 836 iters/s against solver='svd'
    on the 16,384-pt KITTI workload (v5e, 2026-08-20), identical RTE/RRE
    gating. 'svd' = jnp.linalg.svd (`Registration/main.py:131-141` parity).
    """
    from pctpu.ops.pallas_banded import build_banded, icp_moments_banded
    from pctpu.register.procrustes import procrustes_from_moments
    if init_T is None:
        init_T = jnp.eye(4, dtype=jnp.float32)
    bdb = build_banded(dst, dst_mask, block=block)
    n = src.shape[0]
    svals = jnp.take_along_axis(
        src, jnp.broadcast_to(bdb.axis[None, None], (n, 1)), axis=1)[:, 0]
    svals = jnp.where(src_mask, svals, jnp.float32(1e30))
    sorder = jnp.argsort(svals)
    src_s = src[sorder]
    mask_s = src_mask[sorder]

    def body(_, T):
        src_t = se3.apply_transform(T, src_s)
        m16 = icp_moments_banded(bdb, src_t, mask_s,
                                 dist_thresh=dist_thresh, block=block,
                                 window_blocks=window_blocks,
                                 query_tile=query_tile, interpret=interpret,
                                 tiles_per_step=tiles_per_step)
        R, t = procrustes_from_moments(m16, solver=solver)
        return se3.make_transform(R, t) @ T

    # unroll lets XLA fuse the ~60 small glue ops (transform, LUT, 3x3
    # solve) ACROSS iterations — the measured per-iteration cost is op
    # launch overhead, not compute (tools/probe_glue.py)
    return jax.lax.fori_loop(0, iters, body, init_T.astype(jnp.float32),
                             unroll=unroll)


@partial(jax.jit, static_argnames=("iters", "dist_thresh", "block",
                                   "window_blocks", "query_tile",
                                   "interpret", "solver", "unroll"))
def icp_fixed_iters_banded_fused_v2(src: jax.Array, src_mask: jax.Array,
                                    dst: jax.Array, dst_mask: jax.Array,
                                    init_T: Optional[jax.Array] = None,
                                    iters: int = 30,
                                    dist_thresh: float = 5.0,
                                    block: int = 2048,
                                    window_blocks: int = 2,
                                    query_tile: int = 512,
                                    interpret: bool = False,
                                    solver: str = "polar",
                                    unroll: int = 1) -> jax.Array:
    """Fused banded ICP v2: the rigid transform and the window-offset
    lookup also run INSIDE the Pallas kernel (pose passed as 16 SMEM
    scalars), so each iteration's XLA work is just the 3x3 Procrustes
    solve + 4x4 compose. Same association/moment semantics as
    `icp_fixed_iters_banded_fused` (`ops.pallas_banded` v2 notes).
    """
    from pctpu.ops.pallas_banded import build_banded, icp_moments_banded_v2
    from pctpu.register.procrustes import procrustes_from_moments
    if init_T is None:
        init_T = jnp.eye(4, dtype=jnp.float32)
    bdb = build_banded(dst, dst_mask, block=block)
    n = src.shape[0]
    # order source tiles by the INIT-TRANSFORMED band-axis coordinate: a
    # rotated init (e.g. a RANSAC global pose) reshuffles which source
    # points land in which db band; the kernel re-transforms by the
    # CURRENT pose every iteration, only this ordering is fixed
    st = src @ init_T[:3, :3].T + init_T[:3, 3]
    svals = st @ (jnp.arange(3) == bdb.axis).astype(jnp.float32)
    svals = jnp.where(src_mask, svals, jnp.float32(1e30))
    sorder = jnp.argsort(svals)
    src_s = src[sorder].astype(jnp.float32)
    mask_s = src_mask[sorder]

    mp = ((n + query_tile - 1) // query_tile) * query_tile
    src3 = jnp.zeros((3, mp), jnp.float32).at[:, :n].set(src_s.T)
    spen = jnp.full((1, mp), 1e30, jnp.float32).at[0, :n].set(
        jnp.where(mask_s, 0.0, 1e30))
    ntiles = mp // query_tile
    centers = src3[:, query_tile // 2::query_tile]        # [3, ntiles]
    centers = centers.T.reshape(1, 3 * ntiles)
    pen2t = bdb.pen2.T                                     # [Np, 1]

    def body(_, T):
        m16 = icp_moments_banded_v2(bdb, pen2t, src3, spen, centers, T,
                                    dist_thresh=dist_thresh, block=block,
                                    window_blocks=window_blocks,
                                    query_tile=query_tile,
                                    interpret=interpret)
        R, t = procrustes_from_moments(m16, solver=solver)
        return se3.make_transform(R, t) @ T

    return jax.lax.fori_loop(0, iters, body, init_T.astype(jnp.float32),
                             unroll=unroll)


def _pad_pow2(points: jax.Array, mask: jax.Array, axis: int = 0):
    """Pad the point axis up to the next power of two (mask False).

    Mosaic compile time for the mega kernel is pathological at large
    NON-power-of-two point counts (the real 124,668-pt KITTI scan took
    >25 min to compile vs ~20 s padded to 131,072 — r4 probe history);
    the <=2x (typically ~1.05x) masked extra work is noise next to that.
    """
    n = points.shape[axis]
    m = 1 << (n - 1).bit_length()
    if m == n:
        return points, mask
    pad = [(0, 0)] * points.ndim
    pad[axis] = (0, m - n)
    pts = jnp.pad(points, pad, mode="edge")
    mpad = [(0, 0)] * mask.ndim
    mpad[axis] = (0, m - n)
    msk = jnp.pad(mask, mpad, constant_values=False)
    return pts, msk


@partial(jax.jit, static_argnames=("coarse_iters", "polish_iters",
                                   "dist_thresh", "block", "window_blocks",
                                   "query_tile", "interpret",
                                   "newton_iters"))
def icp_fixed_iters_banded_mega(src: jax.Array, src_mask: jax.Array,
                                dst: jax.Array, dst_mask: jax.Array,
                                init_T: Optional[jax.Array] = None,
                                coarse_iters: int = 45,
                                polish_iters: int = 5,
                                dist_thresh: float = 5.0,
                                block: int = 512,
                                window_blocks: int = 4,
                                query_tile: int = 256,
                                interpret: bool = False,
                                newton_iters: int = 6) -> jax.Array:
    """Whole-loop fused ICP: ALL iterations inside Pallas
    (`pctpu.ops.pallas_icp_mega`). Two kernel launches total: `coarse_iters`
    banded-window iterations, then `polish_iters` EXACT brute-force
    iterations (the same kernel with the window spanning the entire db) —
    the hybrid schedule the bench's gated metric uses, with zero
    per-iteration XLA glue. Association/moment semantics identical to
    `icp_fixed_iters_banded_fused`; the Procrustes solve is the scalar-core
    transcription of `procrustes.rotation_polar3`."""
    from pctpu.ops.pallas_banded import build_banded
    from pctpu.ops.pallas_icp_mega import icp_mega
    if init_T is None:
        init_T = jnp.eye(4, dtype=jnp.float32)
    src, src_mask = _pad_pow2(src, src_mask)
    dst, dst_mask = _pad_pow2(dst, dst_mask)
    bdb = build_banded(dst, dst_mask, block=block)
    n = src.shape[0]
    # order source tiles by the INIT-TRANSFORMED band-axis coordinate
    # (see icp_fixed_iters_banded_fused_v2 — same reasoning)
    st = src @ init_T[:3, :3].T + init_T[:3, 3]
    svals = st @ (jnp.arange(3) == bdb.axis).astype(jnp.float32)
    svals = jnp.where(src_mask, svals, jnp.float32(1e30))
    sorder = jnp.argsort(svals)
    src_s = src[sorder].astype(jnp.float32)
    mask_s = src_mask[sorder]

    mp = ((n + query_tile - 1) // query_tile) * query_tile
    src3 = jnp.zeros((3, mp), jnp.float32).at[:, :n].set(src_s.T)
    spen = jnp.full((1, mp), 1e30, jnp.float32).at[0, :n].set(
        jnp.where(mask_s, 0.0, 1e30))
    ntiles = mp // query_tile
    centers = src3[:, query_tile // 2::query_tile]        # [3, ntiles]
    centers = centers.T.reshape(1, 3 * ntiles)
    nb = bdb.dbt4.shape[1] // block

    T = init_T.astype(jnp.float32)
    if coarse_iters > 0:
        T = icp_mega(bdb, src3, spen, centers, T,
                     iters=coarse_iters, dist_thresh=dist_thresh,
                     block=block, window_blocks=window_blocks,
                     query_tile=query_tile, interpret=interpret,
                     newton_iters=newton_iters)
    if polish_iters > 0:
        T = icp_mega(bdb, src3, spen, centers, T,
                     iters=polish_iters, dist_thresh=dist_thresh,
                     block=block, window_blocks=nb,
                     query_tile=query_tile, interpret=interpret,
                     newton_iters=newton_iters)
    return T


@partial(jax.jit, static_argnames=("coarse_iters", "polish_iters",
                                   "dist_thresh", "block", "window_blocks",
                                   "query_tile", "interpret",
                                   "newton_iters"))
def icp_fixed_iters_banded_mega_batch(src: jax.Array, src_mask: jax.Array,
                                      dst: jax.Array, dst_mask: jax.Array,
                                      init_T: Optional[jax.Array] = None,
                                      coarse_iters: int = 45,
                                      polish_iters: int = 5,
                                      dist_thresh: float = 5.0,
                                      block: int = 512,
                                      window_blocks: int = 4,
                                      query_tile: int = 256,
                                      interpret: bool = False,
                                      newton_iters: int = 6) -> jax.Array:
    """Batched whole-loop mega ICP: src/dst [B,N,3]/[B,M,3] -> T [B,4,4].

    The pair sweep runs as ONE Pallas launch per phase with a (B, iters,
    ntiles) grid and per-pair BlockSpec blocking (`ops.pallas_icp_mega.
    icp_mega_batch`) — scales to arbitrary B at full scan resolution where
    `jax.vmap(icp_fixed_iters_banded_mega)` exhausts VMEM. Layout prep
    (banded build + source sort) is vmapped XLA."""
    from pctpu.ops.pallas_banded import build_banded
    from pctpu.ops.pallas_icp_mega import icp_mega_batch
    src, src_mask = _pad_pow2(src, src_mask, axis=1)
    dst, dst_mask = _pad_pow2(dst, dst_mask, axis=1)
    b, n, _ = src.shape
    if init_T is None:
        init_T = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    init_T = init_T.astype(jnp.float32)
    bdb = jax.vmap(partial(build_banded, block=block))(dst, dst_mask)
    mp = ((n + query_tile - 1) // query_tile) * query_tile
    ntiles = mp // query_tile

    def prep(src_i, mask_i, axis_i, T_i):
        # order source tiles by the INIT-TRANSFORMED band-axis coordinate
        # (see icp_fixed_iters_banded_mega)
        st = src_i @ T_i[:3, :3].T + T_i[:3, 3]
        svals = st @ (jnp.arange(3) == axis_i).astype(jnp.float32)
        svals = jnp.where(mask_i, svals, jnp.float32(1e30))
        sorder = jnp.argsort(svals)
        src_s = src_i[sorder].astype(jnp.float32)
        mask_s = mask_i[sorder]
        src3 = jnp.zeros((3, mp), jnp.float32).at[:, :n].set(src_s.T)
        spen = jnp.full((1, mp), 1e30, jnp.float32).at[0, :n].set(
            jnp.where(mask_s, 0.0, 1e30))
        centers = src3[:, query_tile // 2::query_tile]
        centers = centers.T.reshape(1, 3 * ntiles)
        return src3, spen, centers

    src3, spen, centers = jax.vmap(prep)(src, src_mask, bdb.axis, init_T)
    dbt5 = jnp.concatenate(                     # [B, 5, Np] packed db
        [bdb.dbt, bdb.pen2, jnp.ones_like(bdb.pen2)], axis=1)
    lut = bdb.lut[:, None, :]                   # [B, 1, L]
    nb = bdb.dbt4.shape[2] // block

    T = init_T
    if coarse_iters > 0:
        T = icp_mega_batch(dbt5, lut, bdb.lo, bdb.hi, bdb.axis,
                           src3, spen, centers, T,
                           iters=coarse_iters, dist_thresh=dist_thresh,
                           block=block, window_blocks=window_blocks,
                           query_tile=query_tile, interpret=interpret,
                           newton_iters=newton_iters)
    if polish_iters > 0:
        T = icp_mega_batch(dbt5, lut, bdb.lo, bdb.hi, bdb.axis,
                           src3, spen, centers, T,
                           iters=polish_iters, dist_thresh=dist_thresh,
                           block=block, window_blocks=nb,
                           query_tile=query_tile, interpret=interpret,
                           newton_iters=newton_iters)
    return T


@partial(jax.jit, static_argnames=("iters", "dist_thresh", "block",
                                   "query_tile", "interpret",
                                   "newton_iters"))
def icp_refine_exact_mega_batch(src: jax.Array, src_mask: jax.Array,
                                dst: jax.Array, dst_mask: jax.Array,
                                init_T: jax.Array,
                                iters: int = 2, dist_thresh: float = 5.0,
                                block: int = 2048, query_tile: int = 512,
                                interpret: bool = False,
                                newton_iters: int = 6) -> jax.Array:
    """Batched EXACT fixed-iteration refine in one mega-kernel launch —
    zero layout prep. src [B,M,3] (a strided subsample), dst [B,N,3].

    The banded mega kernel's window base is `clip(.., 0, nb - wb)`; with
    window_blocks = nb every query tile scans the whole db, the LUT and
    source sort are dead weight — so this wrapper feeds dummy band
    metadata and UNSORTED operands: association is exact brute 1-NN on
    the MXU (pen2 - 2 b.q contraction), moments + the scalar-register
    Procrustes solve stay in-kernel, and both iterations cost two HBM
    passes over the db total (the per-iteration XLA refine paid gathers,
    Procrustes and pose composes through HBM every iteration)."""
    from pctpu.ops.pallas_banded import LUT_BINS
    from pctpu.ops.pallas_icp_mega import icp_mega_batch
    src, src_mask = _pad_pow2(src, src_mask, axis=1)
    dst, dst_mask = _pad_pow2(dst, dst_mask, axis=1)
    b, m, _ = src.shape
    n = dst.shape[1]
    mp = ((m + query_tile - 1) // query_tile) * query_tile
    np_ = ((n + block - 1) // block) * block

    dstf = jnp.where(dst_mask[..., None], dst, 0.0).astype(jnp.float32)
    pen = jnp.where(dst_mask, 0.0, jnp.float32(1e30))
    pen2 = jnp.sum(dstf * dstf, axis=-1) + pen
    dbt5 = jnp.zeros((b, 5, np_), jnp.float32)
    dbt5 = dbt5.at[:, 0:3, :n].set(jnp.swapaxes(dstf, 1, 2))
    dbt5 = dbt5.at[:, 3, :n].set(pen2)
    dbt5 = dbt5.at[:, 3, n:].set(1e30)
    dbt5 = dbt5.at[:, 4, :n].set(1.0)

    src3 = jnp.zeros((b, 3, mp), jnp.float32).at[:, :, :m].set(
        jnp.swapaxes(src.astype(jnp.float32), 1, 2))
    spen = jnp.full((b, 1, mp), 1e30, jnp.float32).at[:, 0, :m].set(
        jnp.where(src_mask, 0.0, 1e30))
    ntiles = mp // query_tile
    centers = jnp.swapaxes(src3[:, :, query_tile // 2::query_tile],
                           1, 2).reshape(b, 1, 3 * ntiles)
    nb = np_ // block
    return icp_mega_batch(
        dbt5, jnp.zeros((b, 1, LUT_BINS + 1), jnp.int32),
        jnp.zeros((b,), jnp.float32), jnp.ones((b,), jnp.float32),
        jnp.zeros((b,), jnp.int32), src3, spen, centers,
        init_T.astype(jnp.float32), iters=iters, dist_thresh=dist_thresh,
        block=block, window_blocks=nb, query_tile=query_tile,
        interpret=interpret, newton_iters=newton_iters)


def _so3_exp(omega: jax.Array) -> jax.Array:
    """Rodrigues' formula, [3] -> [3,3] (Taylor-safe near zero)."""
    theta = jnp.linalg.norm(omega)
    small = theta < 1e-8
    theta_safe = jnp.where(small, 1.0, theta)
    k = omega / theta_safe
    K = jnp.array([[0.0, -k[2], k[1]],
                   [k[2], 0.0, -k[0]],
                   [-k[1], k[0], 0.0]], jnp.float32)
    R = (jnp.eye(3, dtype=jnp.float32) + jnp.sin(theta_safe) * K
         + (1 - jnp.cos(theta_safe)) * (K @ K))
    K0 = jnp.array([[0.0, -omega[2], omega[1]],
                    [omega[2], 0.0, -omega[0]],
                    [-omega[1], omega[0], 0.0]], jnp.float32)
    return jnp.where(small, jnp.eye(3, dtype=jnp.float32) + K0, R)



def _trim_weights(w: jax.Array, d2: jax.Array, trim: float,
                  active=None) -> jax.Array:
    """Trimmed ICP: keep only the best `trim` fraction of currently-valid
    associations (by distance). The standard partial-overlap fix — points
    visible to one scan but not the other otherwise attract to the overlap
    edge and bias the solve toward a stable wrong optimum. Trimming also
    SHRINKS the convergence basin, so callers anneal it: `active` gates
    the trim on (the fixed-iter ICPs enable it for the second half of
    their schedule only)."""
    if trim >= 1.0:
        return w
    n = d2.shape[0]
    ds = jnp.sort(jnp.where(w > 0, d2, jnp.float32(1e30)))
    k = jnp.clip((trim * jnp.sum(w)).astype(jnp.int32), 1, n - 1)
    cutoff = ds[k - 1]   # ds[k-1] = k-th smallest -> keeps exactly k
    wt = w * (d2 <= cutoff).astype(jnp.float32)
    if active is None:
        return wt
    return jnp.where(active, wt, w)


@partial(jax.jit, static_argnames=("iters", "dist_thresh", "query_chunk",
                                   "backend", "trim"))
def icp_fixed_iters_p2pl(src: jax.Array, src_mask: jax.Array,
                         dst: jax.Array, dst_normals: jax.Array,
                         dst_mask: jax.Array,
                         init_T: Optional[jax.Array] = None,
                         iters: int = 25, dist_thresh: float = 2.0,
                         query_chunk: int = 2048,
                         backend: str = "auto",
                         trim: float = 1.0) -> jax.Array:
    """Fixed-iteration POINT-TO-PLANE ICP (vmap/scan-friendly, no early
    exit): per iteration, 1-NN association + small-angle Gauss-Newton on
    sum w ((R p + t - q) . n)^2. On planar-dominated scenes (ground,
    walls) this converges far past point-to-point's partial-overlap bias
    floor — the odometry front end's default (`pipelines.odometry`)."""
    if init_T is None:
        init_T = jnp.eye(4, dtype=jnp.float32)
    thresh2 = jnp.float32(dist_thresh) ** 2
    cfg = ICPConfig(dist_thresh=dist_thresh, query_chunk=query_chunk,
                    backend=backend)

    def body(i, T):
        src_t = se3.apply_transform(T, src)
        d2, idx = _associate(src_t, dst, dst_mask, cfg)
        w = (src_mask & (d2 < thresh2)).astype(jnp.float32)
        w = _trim_weights(w, d2, trim, active=i >= iters // 2)
        q = dst[idx]
        n = dst_normals[idx]
        r = jnp.sum((src_t - q) * n, axis=-1)
        J = jnp.concatenate([jnp.cross(src_t, n), n], axis=-1)
        Jw = J * w[:, None]
        A = jax.lax.dot_general(Jw, J, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        b = -(jnp.matmul(Jw.T, r,
                         precision=jax.lax.Precision.HIGHEST))
        A = A + 1e-6 * jnp.eye(6, dtype=jnp.float32)
        xi = jnp.linalg.solve(A, b)
        dT = se3.make_transform(_so3_exp(xi[:3]), xi[3:])
        return dT @ T

    return jax.lax.fori_loop(0, iters, body, init_T.astype(jnp.float32))


@partial(jax.jit, static_argnames=("iters", "dist_thresh", "query_chunk",
                                   "backend", "trim"))
def icp_fixed_iters(src: jax.Array, src_mask: jax.Array,
                    dst: jax.Array, dst_mask: jax.Array,
                    init_T: Optional[jax.Array] = None,
                    iters: int = 30, dist_thresh: float = 5.0,
                    query_chunk: int = 2048, backend: str = "auto",
                    trim: float = 1.0) -> jax.Array:
    """Unrolled-count point-to-point ICP via `lax.fori_loop` — the
    benchmarking / batched (vmap-friendly) variant with no early exit, so a
    whole batch of pairs runs in lockstep (pair-parallel sweeps)."""
    if init_T is None:
        init_T = jnp.eye(4, dtype=jnp.float32)
    thresh2 = jnp.float32(dist_thresh) ** 2
    cfg = ICPConfig(dist_thresh=dist_thresh, query_chunk=query_chunk,
                    backend=backend)

    def body(i, T):
        src_t = se3.apply_transform(T, src)
        d2, idx = _associate(src_t, dst, dst_mask, cfg)
        w = (src_mask & (d2 < thresh2)).astype(jnp.float32)
        w = _trim_weights(w, d2, trim, active=i >= iters // 2)
        R, t = weighted_procrustes(src_t, dst[idx], w)
        return se3.make_transform(R, t) @ T

    return jax.lax.fori_loop(0, iters, body, init_T.astype(jnp.float32))


@partial(jax.jit, static_argnames=("iters", "subsample", "dist_thresh",
                                   "query_chunk", "backend"))
def icp_refine_exact(src: jax.Array, src_mask: jax.Array,
                     dst: jax.Array, dst_mask: jax.Array,
                     T: jax.Array, iters: int = 2,
                     subsample: int = 16384, dist_thresh: float = 5.0,
                     query_chunk: int = 2048,
                     backend: str = "auto") -> jax.Array:
    """EXACT point-to-point polish from an already-coarse-converged pose:
    `iters` iterations of a uniform-strided source subsample against the
    FULL target via exact brute 1-NN + weighted Procrustes. The
    full-resolution accuracy floor of the banded mega kernel is its
    approximate windowed association (r4: RTE 0.131 m at 124,668 points
    vs 0.012 on the 16k pair); a couple of exact iterations move the
    pose the last centimeters at a tiny fraction of an exact full-ICP's
    cost (reference full-res ICP workload: Registration/main.py:107-154).
    """
    from pctpu.ops.knn import nearest
    n = src.shape[0]
    stride = max(1, n // subsample)
    q = src[::stride][:subsample]
    qm = src_mask[::stride][:subsample]
    thresh2 = jnp.float32(dist_thresh) ** 2

    def body(_, T):
        qt = se3.apply_transform(T, q)
        d2, idx = nearest(qt, dst, dst_mask, query_chunk, backend=backend)
        w = (qm & (d2 < thresh2)).astype(jnp.float32)
        R, t = weighted_procrustes(qt, dst[idx], w)
        return se3.make_transform(R, t) @ T

    return jax.lax.fori_loop(0, iters, body, T.astype(jnp.float32))
