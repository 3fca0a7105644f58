"""Fused Pallas FPFH-33 — single-pass SPFH + neighbor-weighted sum in VMEM.

Same descriptor as `features.fpfh_dense` (PCL FPFH semantics, the
registration front end's feature stage — `Registration/main.py:44-46`,
`PCLKeypoints/src/keypoints.cpp:112-163`) but with the whole Darboux
angle + histogram computation fused into one kernel per pass:

The XLA dense path (`fpfh_dense`) materializes ~40 [B,Q,N] intermediates
(d2, within, f1/f2/f3, 33 histogram select-reduce passes) to HBM — at a
16x2048 batch that's dozens of round-trips over 64 MB arrays. Here each
[TQ,TN] tile lives only in VMEM and only the [B,N,33] result touches
HBM: traffic is O(N*C), not O(N^2 * passes).

Two TPU-first moves beyond the fusion:

* **MXU offload.** Every pairwise dot the Darboux frame needs factors
  into products of per-POINT vectors: with d = p - q, u = n_q, v = n_p,
      u.d        = u.p - u.q
      v.d        = p.v - q.v          (p.v is a per-db scalar)
      d.(u x v)  = det(p,u,v) - det(q,u,v)
                 = u.(v x p) - (q x u).v
  so six [TQ,3]x[3,TN] MXU dots (q,u,qxu against p,v,vxp) replace ~40
  row-x-column VPU broadcast passes per tile. In-kernel dots are exact
  f32 (Mosaic does not silently drop to bf16).

* **Exact x-band pruning.** Voxel-downsampled clouds arrive lexsorted by
  cell (x-major, `ops.voxel`): a query tile spanning x in [a,b] can only
  have radius-r neighbors in the contiguous db range x in [a-r, b+r].
  Per-tile [base, count) tables from one searchsorted ride scalar
  prefetch (pattern of `ops.pallas_banded`), and each query tile loops
  only its in-band db tiles. EXACT, not approximate: any skipped column
  has |dx| > r and therefore d2 > r^2 — it could never enter the
  histogram. (`x_banded=False`, the safe default for unsorted input,
  degenerates the tables to the full range — same kernel.)

Pass 1 (`_spfh_kernel`): per query tile, loop in-band db tiles;
accumulate the 3x11-bin SPFH histogram and the neighbor count.
Pass 2 (`_wsum_kernel`): recompute the distance tile, accumulate the
1/dist-weighted neighbor SPFH sum as [TQ,TN]x[TN,33] MXU dots.

Matches `fpfh_dense` to histogram-bin boundary noise given the same
normals (tests/test_features.py::test_fpfh_pallas_matches_dense).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BINS = 11
BIG = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _atan2f(y, x):
    """Polynomial atan2 (Mosaic has no atan2 lowering). Cephes atanf
    4-term minimax on [0,1] + octant reduction; |err| ~1e-7 rad — three
    orders below a histogram bin width (2*pi/11 ~ 0.57 rad)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    a = jnp.minimum(ax, ay) / jnp.maximum(hi, 1e-30)
    z = a * a
    p = ((((8.05374449538e-2 * z - 1.38776856032e-1) * z
           + 1.99777106478e-1) * z - 3.33329491539e-1) * z * a + a)
    r = jnp.where(ay > ax, jnp.float32(jnp.pi / 2) - p, p)
    r = jnp.where(x < 0, jnp.float32(jnp.pi) - r, r)
    return jnp.where(y < 0, -r, r)


# db-side packed matrix rows (built once per cloud, [B, 12, Np]):
#   0:3  p (points, transposed)     6:9  v x p
#   3:6  v (normals, transposed)    9 |p|^2   10 p.v   11 mask penalty
_P, _V, _W, _P2, _PV, _PEN = slice(0, 3), slice(3, 6), slice(6, 9), 9, 10, 11
# query-side packed columns ([B, Np, 11]):
#   0:3 q   3:6 u   6:9 q x u   9 |q|^2   10 u.q
_DOT = partial(jax.lax.dot_general,
               dimension_numbers=(((1,), (0,)), ((), ())),
               preferred_element_type=jnp.float32)


def _spfh_kernel(base_ref, nt_ref, a_ref, db_ref, hist_ref, cnt_ref,
                 *, db_tile: int, r2: float):
    tq = a_ref.shape[1]
    bi, i = pl.program_id(0), pl.program_id(1)
    A = a_ref[0]                                   # [TQ,11]
    Aq, Au, Ax = A[:, 0:3], A[:, 3:6], A[:, 6:9]
    q2, uq = A[:, 9:10], A[:, 10:11]
    rows = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    base = base_ref[bi, i]

    def body(j, carry):
        hist, cnt = carry
        start = (base + j) * db_tile
        db = db_ref[0, :, pl.ds(start, db_tile)]   # [12,TN]
        qp = _DOT(Aq, db[_P])                      # [TQ,TN] q.p
        up = _DOT(Au, db[_P])                      # u.p
        qv = _DOT(Aq, db[_V])                      # q.v
        un = _DOT(Au, db[_V])                      # u.v
        xv = _DOT(Ax, db[_V])                      # (q x u).v = det(q,u,v)
        uw = _DOT(Au, db[_W])                      # u.(v x p) = det(p,u,v)
        d2 = q2 + db[_P2:_P2 + 1] - 2.0 * qp
        cols = (start
                + jax.lax.broadcasted_iota(jnp.int32, (tq, db_tile), 1))
        within = ((d2 + db[_PEN:_PEN + 1] <= r2) & (rows != cols))
        wf = within.astype(jnp.float32)
        inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))

        f2 = (up - uq) * inv_d
        s = jnp.sqrt(jnp.maximum(1.0 - f2 * f2, 0.0))
        inv_s = 1.0 / jnp.maximum(s, 1e-12)
        f1 = (uw - xv) * inv_d * inv_s
        dn = (db[_PV:_PV + 1] - qv) * inv_d
        f3 = _atan2f((dn - f2 * un) * inv_s, un)

        two_pi_inv = jnp.float32(N_BINS / (2.0 * jnp.pi))
        b1 = jnp.clip(jnp.floor((f1 + 1.0) * (N_BINS / 2.0)).astype(
            jnp.int32), 0, N_BINS - 1)
        b2 = jnp.clip(jnp.floor((f2 + 1.0) * (N_BINS / 2.0)).astype(
            jnp.int32), 0, N_BINS - 1)
        b3 = jnp.clip(jnp.floor((f3 + jnp.pi) * two_pi_inv).astype(
            jnp.int32), 0, N_BINS - 1)

        cols_33 = []
        for b in (b1, b2, b3):
            for k in range(N_BINS):
                cols_33.append(jnp.sum(jnp.where(b == k, wf, 0.0),
                                       axis=1, keepdims=True))
        tile_hist = jnp.concatenate(cols_33, axis=1)      # [TQ,33]
        return (hist + tile_hist,
                cnt + jnp.sum(wf, axis=1, keepdims=True))

    hist0 = jnp.zeros((tq, 3 * N_BINS), jnp.float32)
    cnt0 = jnp.zeros((tq, 1), jnp.float32)
    hist, cnt = jax.lax.fori_loop(0, nt_ref[bi, i], body, (hist0, cnt0))
    cnt = jnp.maximum(cnt, 1.0)
    hist_ref[0] = hist * (100.0 / cnt)
    cnt_ref[0] = cnt


def _wsum_kernel(base_ref, nt_ref, a_ref, db_ref, s33_ref, out_ref,
                 *, db_tile: int, r2: float):
    tq = a_ref.shape[1]
    bi, i = pl.program_id(0), pl.program_id(1)
    A = a_ref[0]
    Aq, q2 = A[:, 0:3], A[:, 9:10]
    rows = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    base = base_ref[bi, i]

    def body(j, carry):
        acc, k_eff = carry
        start = (base + j) * db_tile
        db = db_ref[0, :, pl.ds(start, db_tile)]
        qp = _DOT(Aq, db[_P])
        d2 = q2 + db[_P2:_P2 + 1] - 2.0 * qp
        cols = (start
                + jax.lax.broadcasted_iota(jnp.int32, (tq, db_tile), 1))
        within = ((d2 + db[_PEN:_PEN + 1] <= r2) & (rows != cols))
        wf = within.astype(jnp.float32)
        wd = wf * jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
        s33 = s33_ref[0, pl.ds(start, db_tile), :]        # [TN,33]
        acc = acc + _DOT(wd, s33)
        return acc, k_eff + jnp.sum(wf, axis=1, keepdims=True)

    acc0 = jnp.zeros((tq, 3 * N_BINS), jnp.float32)
    k0 = jnp.zeros((tq, 1), jnp.float32)
    acc, k_eff = jax.lax.fori_loop(0, nt_ref[bi, i], body, (acc0, k0))
    out_ref[0] = acc / jnp.maximum(k_eff, 1.0)


def _moments_kernel(base_ref, nt_ref, cent_ref, a_ref, db_ref, out_ref,
                    *, db_tile: int, r2: float):
    """Radius-neighborhood moment accumulation (the normals pass):
    out[q] = sum over db cols within r of [x,y,z,x2,y2,z2,xy,xz,yz,1]
    of coordinates SHIFTED by the query tile's center (cent_ref
    [B,nq,3], SMEM). The shift is what makes this MORE accurate than the
    XLA dense path: second moments of raw LiDAR coordinates lose ~eps *
    |p|^2 (~2e-5 m^2) to cancellation in E[xx^T] - mu mu^T — on
    degenerate neighborhoods (near-equal small eigenvalues) that noise
    decides the least eigenvector; shifted moments keep |x'| ~ radius so
    the error shrinks by (extent/radius)^2. Binary weights, self
    INCLUDED — `normals_radius_dense` semantics (covariance is
    translation-invariant). a_ref [1,TQ,4] = (q, |q|^2);
    db_ref [1,5,Np] = (p^T, |p|^2, pen)."""
    tq = a_ref.shape[1]
    bi, i = pl.program_id(0), pl.program_id(1)
    A = a_ref[0]
    Aq, q2 = A[:, 0:3], A[:, 3:4]
    base = base_ref[bi, i]
    cx = cent_ref[bi, i, 0]
    cy = cent_ref[bi, i, 1]
    cz = cent_ref[bi, i, 2]

    def body(j, acc):
        start = (base + j) * db_tile
        db = db_ref[0, :, pl.ds(start, db_tile)]           # [5,TN]
        qp = _DOT(Aq, db[0:3])
        d2 = q2 + db[3:4] - 2.0 * qp
        w = ((d2 + db[4:5]) <= r2).astype(jnp.float32)     # [TQ,TN]
        x = db[0:1] - cx                                   # [1,TN] shifted
        y = db[1:2] - cy
        z = db[2:3] - cz
        dead = db[4:5] > 1.0                               # pen row: invalid
        one = jnp.where(dead, 0.0, 1.0)
        x = jnp.where(dead, 0.0, x)
        y = jnp.where(dead, 0.0, y)
        z = jnp.where(dead, 0.0, z)
        feat10 = jnp.concatenate([
            x, y, z, x * x, y * y, z * z, x * y, x * z, y * z, one],
            axis=0)                                        # [10,TN]
        return acc + jax.lax.dot_general(
            w, feat10, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc0 = jnp.zeros((tq, 10), jnp.float32)
    out_ref[0] = jax.lax.fori_loop(0, nt_ref[bi, i], body, acc0)


@partial(jax.jit, static_argnames=("radius", "q_tile", "db_tile",
                                  "x_banded", "x_slack", "interpret"))
def normals_radius_fused(points: jax.Array, mask: jax.Array,
                         radius: float = 4.0,
                         q_tile: int = 256, db_tile: int = 512,
                         x_banded: bool = False, x_slack: float = 0.0,
                         interpret: bool = False) -> jax.Array:
    """Radius-covariance normals with the moment pass in ONE Pallas
    kernel (optionally x-band pruned) — drop-in for
    `fpfh_dense.normals_radius_dense` ([B,N,3]+[B,N] -> [B,N,3] unit
    normals, least covariance eigenvector via `ops.eigh3`)."""
    from pctpu.ops.eigh3 import eigh3
    b, n, _ = points.shape
    np_ = _round_up(n, max(q_tile, db_tile))
    r2 = float(radius) ** 2

    pts = jnp.where(mask[..., None], points, 0.0).astype(jnp.float32)
    p = jnp.pad(pts, ((0, 0), (0, np_ - n), (0, 0)))
    p2 = jnp.sum(p * p, axis=-1)
    amat = jnp.concatenate([p, p2[..., None]], axis=-1)     # [B,Np,4]
    col_valid = ((jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1) < n)
                 & jnp.pad(mask, ((0, 0), (0, np_ - n))))
    dbmat = jnp.concatenate([
        jnp.swapaxes(p, 1, 2), p2[:, None, :],
        jnp.where(col_valid, 0.0, BIG)[:, None, :]], axis=1)  # [B,5,Np]

    n_tiles = np_ // db_tile
    nq = np_ // q_tile
    # per-query-tile moment origin: mean of the tile's valid points
    vt = col_valid.reshape(b, nq, q_tile).astype(jnp.float32)
    cent = (jnp.sum(p.reshape(b, nq, q_tile, 3) * vt[..., None], axis=2)
            / jnp.maximum(jnp.sum(vt, axis=2), 1.0)[..., None])  # [B,nq,3]
    if x_banded:
        base, nt = _band_tables(p[..., 0], col_valid, float(radius),
                                q_tile, db_tile, slack=x_slack)
    else:
        base = jnp.zeros((b, nq), jnp.int32)
        nt = jnp.full((b, nq), n_tiles, jnp.int32)

    ms = pl.ANY if interpret else pltpu.VMEM

    def qspec(c):
        return pl.BlockSpec((1, q_tile, c),
                            lambda bi, i, base, nt, cent: (bi, i, 0),
                            memory_space=ms)

    def dbspec(r, c):
        return pl.BlockSpec((1, r, c),
                            lambda bi, i, base, nt, cent: (bi, 0, 0),
                            memory_space=ms)

    mom = pl.pallas_call(
        partial(_moments_kernel, db_tile=db_tile, r2=r2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, nq),
            in_specs=[qspec(4), dbspec(5, np_)],
            out_specs=qspec(10),
        ),
        out_shape=jax.ShapeDtypeStruct((b, np_, 10), jnp.float32),
        interpret=interpret,
    )(base, nt, cent, amat, dbmat)[:, :n]

    cnt = jnp.maximum(mom[..., 9], 1.0)
    mu = mom[..., 0:3] / cnt[..., None]
    exx = mom[..., 3:9] / cnt[..., None]
    c00 = exx[..., 0] - mu[..., 0] * mu[..., 0]
    c11 = exx[..., 1] - mu[..., 1] * mu[..., 1]
    c22 = exx[..., 2] - mu[..., 2] * mu[..., 2]
    c01 = exx[..., 3] - mu[..., 0] * mu[..., 1]
    c02 = exx[..., 4] - mu[..., 0] * mu[..., 2]
    c12 = exx[..., 5] - mu[..., 1] * mu[..., 2]
    C = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c01, c11, c12], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1)], axis=-2)
    _, vecs = eigh3(C)
    nrm = vecs[..., :, 0]
    return nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)


def _band_tables(xs, valid, radius: float, q_tile: int, db_tile: int,
                 slack: float = 0.0):
    """Per-(batch, query-tile) [base db-tile, db-tile count) covering all
    VALID columns with x within `radius` of the tile's x-range.

    xs [B,Np] x per column, valid [B,Np]. The VALID columns must be
    nondecreasing in x up to local inversions of at most `slack` (voxel
    clouds are CELL-lexsorted: monotone up to one leaf — pass
    slack=leaf); invalid/pad columns may sit anywhere with any value —
    they are band-NEUTRAL (the distance-kernel penalty already excludes
    them, so wrongly visiting or skipping one is harmless). Binary
    search runs on M = cummax(valid ? x : -BIG) (exactly nondecreasing):
    for i < lo every valid j <= i has x[j] <= M[i] < tmin - r, and for
    valid i >= hi, x[i] >= M[i] - slack > tmax + r — no true neighbor is
    ever skipped."""
    b, np_ = xs.shape
    n_tiles = np_ // db_tile
    xt = xs.reshape(b, -1, q_tile)
    vt = valid.reshape(b, -1, q_tile)
    tmin = jnp.min(jnp.where(vt, xt, BIG), axis=2)
    tmax = jnp.max(jnp.where(vt, xt, -BIG), axis=2)
    m = jax.lax.cummax(jnp.where(valid, xs, -BIG), axis=1)
    lo = jax.vmap(jnp.searchsorted)(m, tmin - radius).astype(jnp.int32)
    hi = jax.vmap(partial(jnp.searchsorted, side="right"))(
        m, tmax + radius + slack).astype(jnp.int32)
    base = lo // db_tile
    nt = -(-(hi - base * db_tile) // db_tile)
    nt = jnp.clip(nt, 0, n_tiles - base)
    nt = jnp.where(jnp.any(vt, axis=2), nt, 0)
    return base.astype(jnp.int32), nt.astype(jnp.int32)


@partial(jax.jit,
         static_argnames=("radius", "q_tile", "db_tile", "x_banded",
                          "x_slack", "interpret"))
def _fpfh_fused_impl(points, mask, normals, radius: float,
                     q_tile: int, db_tile: int, x_banded: bool,
                     x_slack: float, interpret: bool):
    b, n, _ = points.shape
    np_ = _round_up(n, max(q_tile, db_tile))
    r2 = float(radius) ** 2

    pts = jnp.where(mask[..., None], points, 0.0).astype(jnp.float32)
    nrm = normals.astype(jnp.float32)
    pad = ((0, 0), (0, np_ - n), (0, 0))
    p = jnp.pad(pts, pad)
    v = jnp.pad(nrm, pad)
    qxu = jnp.cross(p, v)
    amat = jnp.concatenate([
        p, v, qxu,
        jnp.sum(p * p, axis=-1, keepdims=True),
        jnp.sum(p * v, axis=-1, keepdims=True)], axis=-1)   # [B,Np,11]
    col_valid = ((jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1) < n)
                 & jnp.pad(mask, ((0, 0), (0, np_ - n))))
    dbmat = jnp.concatenate([
        jnp.swapaxes(p, 1, 2),
        jnp.swapaxes(v, 1, 2),
        jnp.swapaxes(jnp.cross(v, p), 1, 2),
        jnp.sum(p * p, axis=-1)[:, None, :],
        jnp.sum(p * v, axis=-1)[:, None, :],
        jnp.where(col_valid, 0.0, BIG)[:, None, :]], axis=1)  # [B,12,Np]

    n_tiles = np_ // db_tile
    nq = np_ // q_tile
    if x_banded:
        base, nt = _band_tables(p[..., 0], col_valid, float(radius),
                                q_tile, db_tile, slack=x_slack)
    else:
        base = jnp.zeros((b, nq), jnp.int32)
        nt = jnp.full((b, nq), n_tiles, jnp.int32)

    ms = pl.ANY if interpret else pltpu.VMEM

    def qspec(c):
        return pl.BlockSpec((1, q_tile, c),
                            lambda bi, i, base, nt: (bi, i, 0),
                            memory_space=ms)

    def dbspec(r, c):
        return pl.BlockSpec((1, r, c), lambda bi, i, base, nt: (bi, 0, 0),
                            memory_space=ms)

    grid = (b, nq)
    s33, _cnt = pl.pallas_call(
        partial(_spfh_kernel, db_tile=db_tile, r2=r2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[qspec(11), dbspec(12, np_)],
            out_specs=[qspec(3 * N_BINS), qspec(1)],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, np_, 3 * N_BINS), jnp.float32),
                   jax.ShapeDtypeStruct((b, np_, 1), jnp.float32)],
        interpret=interpret,
    )(base, nt, amat, dbmat)

    nbr = pl.pallas_call(
        partial(_wsum_kernel, db_tile=db_tile, r2=r2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[qspec(11), dbspec(12, np_),
                      dbspec(np_, 3 * N_BINS)],
            out_specs=qspec(3 * N_BINS),
        ),
        out_shape=jax.ShapeDtypeStruct((b, np_, 3 * N_BINS), jnp.float32),
        interpret=interpret,
    )(base, nt, amat, dbmat, s33)

    f = (s33 + nbr)[:, :n]
    blocks = f.reshape(b, n, 3, N_BINS)
    sums = jnp.maximum(jnp.sum(blocks, axis=-1, keepdims=True), 1e-12)
    out = (100.0 * blocks / sums).reshape(b, n, 3 * N_BINS)
    return jnp.where(mask[..., None], out, 0.0)


def fpfh_fused(points: jax.Array,
               mask: Optional[jax.Array] = None,
               normals: Optional[jax.Array] = None,
               radius: float = 10.0,
               normal_radius: float = 4.0,
               q_tile: int = 256, db_tile: int = 512,
               x_banded: bool = False, x_slack: float = 0.0,
               interpret: bool = False) -> jax.Array:
    """points [B,N,3] (or [N,3]) -> FPFH [B,N,33] (or [N,33]), fused.

    Drop-in for `fpfh_dense` (same defaults, same normals source); the
    descriptor math itself runs in two Pallas kernels with no [Q,N] HBM
    intermediates. Set `x_banded=True` ONLY when each cloud's valid
    prefix is sorted by x up to local inversions of at most `x_slack`
    (voxel_downsample output is cell-lexsorted: pass x_slack=leaf):
    query tiles then skip db tiles provably outside the radius along x —
    exact, ~2-4x fewer tile passes on LiDAR extents.
    """
    squeeze = points.ndim == 2
    if squeeze:
        points = points[None]
        mask = None if mask is None else mask[None]
        normals = None if normals is None else normals[None]
    b, n, _ = points.shape
    if mask is None:
        mask = jnp.ones((b, n), bool)
    if normals is None:
        # default normals stay on the XLA dense path. The Pallas
        # shifted-moments kernel (`normals_radius_fused`) is MORE
        # accurate on well-conditioned neighborhoods (tile-center
        # shifted second moments kill the E[xx^T]-mu mu^T cancellation)
        # and +30 pairs/s, but on DEGENERATE neighborhoods (near-equal
        # small covariance eigenvalues — thin cylinders) the least
        # eigenvector is mathematically ill-defined and the two
        # implementations resolve it differently; SLAM closure FPFH
        # matching measurably depends on the dense path's specific
        # resolution (8 accepted closures vs 2-3 with either fused
        # variant). Pass normals=normals_radius_fused(...) explicitly
        # when neighborhoods are known well-conditioned.
        from pctpu.features.fpfh_dense import normals_radius_dense
        normals = normals_radius_dense(points, mask,
                                       radius=float(normal_radius))
    out = _fpfh_fused_impl(points, mask, normals, float(radius),
                           q_tile, db_tile, x_banded, float(x_slack),
                           interpret)
    return out[0] if squeeze else out
