"""Banded 1-NN Pallas kernel: sorted-axis windowing for big clouds.

The TPU-native answer to tree pruning (and to gather-bound grid hashing —
dynamic gathers are slow on TPU): sort the db along its widest axis; sort
queries by the same axis so each query TILE is spatially coherent; per tile,
a scalar-prefetched block offset selects a contiguous db window, and the
kernel scans only that window (streaming [3, block] slabs through VMEM).
Work per query drops from O(N) to O(window), with fully sequential memory
access — no gathers anywhere.

Approximation: a query whose true NN falls outside its tile's window gets a
farther neighbor (reported distance is still a true distance to a db point).
With LiDAR clouds, window >= a few thousand points spans several meters of
the sort axis, so thresholded ICP associations are essentially exact; the
`found`-style check is the ICP distance threshold itself.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
INT_BIG = 2**31 - 1


class BandedDB(NamedTuple):
    dbt: jax.Array        # [3, Np] coords sorted by axis (padded)
    penalty: jax.Array    # [1, Np] 0 valid / BIG masked or pad
    coords: jax.Array     # [Np] sorted axis coordinate (pad -> +BIG)
    order: jax.Array      # [Np] original index per sorted slot
    axis: jax.Array       # scalar int32 sort axis
    n: int                # true db size
    lut: jax.Array        # [LUT_BINS+1] axis coord -> approx sorted position
    lo: jax.Array         # scalar axis range low
    hi: jax.Array         # scalar axis range high
    dbt4: jax.Array       # [4, Np] coords + ones row (moment-extract matmul)
    pen2: jax.Array       # [1, Np] |b|^2 + penalty (MXU distance epilogue)


LUT_BINS = 1024


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("block",))
def build_banded(db: jax.Array, db_mask: Optional[jax.Array] = None,
                 block: int = 2048) -> BandedDB:
    """Sort db along its widest extent axis and lay out for the kernel."""
    n = db.shape[0]
    if db_mask is None:
        db_mask = jnp.ones((n,), bool)
    lo = jnp.min(jnp.where(db_mask[:, None], db, BIG), axis=0)
    hi = jnp.max(jnp.where(db_mask[:, None], db, -BIG), axis=0)
    axis = jnp.argmax(hi - lo).astype(jnp.int32)
    vals = jnp.take_along_axis(db, axis[None, None].repeat(n, 0),
                               axis=1)[:, 0]
    vals = jnp.where(db_mask, vals, BIG)  # masked points sort last
    order = jnp.argsort(vals).astype(jnp.int32)
    np_ = _round_up(n, block)
    pad = np_ - n
    dbt = jnp.zeros((3, np_), jnp.float32).at[:, :n].set(
        db[order].astype(jnp.float32).T)
    pen_valid = db_mask[order]
    penalty = jnp.full((1, np_), BIG, jnp.float32).at[0, :n].set(
        jnp.where(pen_valid, 0.0, BIG))
    coords = jnp.full((np_,), BIG, jnp.float32).at[:n].set(vals[order])
    order_p = jnp.zeros((np_,), jnp.int32).at[:n].set(order)
    # bucket LUT: one searchsorted at build time replaces the per-iteration
    # binary search (gather-heavy on TPU); positions are approximate within
    # one bucket, dwarfed by the window width
    ax_lo = jnp.take(lo, axis)
    ax_hi = jnp.take(hi, axis)
    grid_vals = ax_lo + (ax_hi - ax_lo) * jnp.arange(LUT_BINS + 1) / LUT_BINS
    lut = jnp.searchsorted(coords, grid_vals).astype(jnp.int32)
    dbt4 = jnp.concatenate([dbt, jnp.ones((1, np_), jnp.float32)], axis=0)
    pen2 = jnp.sum(dbt * dbt, axis=0, keepdims=True) + penalty
    return BandedDB(dbt, penalty, coords, order_p, axis, n, lut, ax_lo,
                    ax_hi, dbt4, pen2)


def _tile_offsets(bdb: BandedDB, qvals: jax.Array, query_tile: int,
                  block: int, window_blocks: int) -> jax.Array:
    """Per-query-tile first-window-block offsets via the bucket LUT.

    qvals: [Mp] sort-axis coordinate per (padded) query; only tile CENTERS
    matter, so one query per tile is sampled.
    """
    nb = bdb.dbt.shape[1] // block
    centers_val = qvals.reshape(-1, query_tile)[:, query_tile // 2]
    bins = jnp.clip(((centers_val - bdb.lo) / jnp.maximum(
        bdb.hi - bdb.lo, 1e-12) * LUT_BINS).astype(jnp.int32), 0, LUT_BINS)
    center = bdb.lut[bins]
    first = center // block - (window_blocks // 2)
    return jnp.clip(first, 0, nb - window_blocks).astype(jnp.int32)


def _banded_kernel(off_ref, q_ref, dbt_ref, pen_ref, d2_ref, idx_ref,
                   *, block: int, window_blocks: int):
    i = pl.program_id(0)
    q = q_ref[:]                                   # [TQ,3]
    qx = q[:, 0:1]
    qy = q[:, 1:2]
    qz = q[:, 2:3]
    tq = q.shape[0]
    base = off_ref[i]                              # first db block index

    def body(j, carry):
        minv, mini = carry
        start = (base + j) * block
        dx = qx - dbt_ref[0:1, pl.ds(start, block)]
        dy = qy - dbt_ref[1:2, pl.ds(start, block)]
        dz = qz - dbt_ref[2:3, pl.ds(start, block)]
        d2 = dx * dx + dy * dy + dz * dz + pen_ref[0:1, pl.ds(start, block)]
        tmin = jnp.min(d2, axis=1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, block), 1) + start
        tidx = jnp.min(jnp.where(d2 <= tmin, cols, INT_BIG),
                       axis=1, keepdims=True)
        better = tmin < minv
        return (jnp.where(better, tmin, minv),
                jnp.where(better, tidx, mini))

    init = (jnp.full((tq, 1), BIG), jnp.zeros((tq, 1), jnp.int32))
    minv, mini = jax.lax.fori_loop(0, window_blocks, body, init)
    d2_ref[:] = minv
    idx_ref[:] = mini


@partial(jax.jit, static_argnames=("block", "window_blocks", "query_tile",
                                   "interpret"))
def nearest_banded(bdb: BandedDB, query: jax.Array,
                   block: int = 2048, window_blocks: int = 2,
                   query_tile: int = 512, interpret: bool = False):
    """query [M,3] (tiles should be sorted by bdb.axis for coherence) ->
    (d2 [M], idx [M] into the ORIGINAL db order)."""
    m = query.shape[0]
    mp = _round_up(m, query_tile)
    q = jnp.zeros((mp, 3), jnp.float32).at[:m].set(query.astype(jnp.float32))

    qvals = q @ (jnp.arange(3) == bdb.axis).astype(jnp.float32)
    # approximate sorted position via the bucket LUT (no per-query binary
    # search); only tile CENTERS matter, so sample one query per tile
    offsets = _tile_offsets(bdb, qvals, query_tile, block, window_blocks)

    mem = pl.ANY if interpret else pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // query_tile,),
        in_specs=[
            pl.BlockSpec((query_tile, 3), lambda i, off: (i, 0)),
            pl.BlockSpec(memory_space=mem),
            pl.BlockSpec(memory_space=mem),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, 1), lambda i, off: (i, 0)),
            pl.BlockSpec((query_tile, 1), lambda i, off: (i, 0)),
        ],
    )
    d2, sidx = pl.pallas_call(
        partial(_banded_kernel, block=block, window_blocks=window_blocks),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(offsets, q, bdb.dbt, bdb.penalty)
    d2 = d2[:m, 0]
    sidx = sidx[:m, 0]
    return d2, bdb.order[sidx]


def _moments_kernel(off_ref, q_ref, qpen_ref, dbt_ref, pen_ref, out_ref,
                    *, block: int, window_blocks: int, thresh2: float,
                    tiles_per_step: int, query_tile: int):
    """Fused ICP iteration epilogue: banded 1-NN association AND the
    weighted-Procrustes moment reduction in ONE kernel.

    Instead of writing per-query (d2, idx) to HBM and gathering dst[idx]
    afterwards (a 16k dynamic gather per iteration — slow on TPU), the
    argmin's db COORDINATES are tracked in-register via a one-hot select,
    and the tile reduces directly to the homogeneous moment matrix
    M = sum_i w_i [p_i;1][q_i;1]^T (p = transformed src, q = matched db
    point, w = 1[d2 < thresh2 and valid]) — all 16 sufficient statistics of
    the rigid alignment in one [TQ,4]x[TQ,4] contraction. The TPU grid is
    sequential, so tiles accumulate into the single (4,4) output block.

    `tiles_per_step` query tiles are processed per grid step (statically
    unrolled, each with its own prefetched window offset) to amortize the
    fixed per-grid-step latency that bounded the round-2 kernel.
    """
    i = pl.program_id(0)
    qall = q_ref[:]                                # [T*TQ,3] transformed src
    qpen_all = qpen_ref[:]                         # [T*TQ,1] 0 valid / BIG
    tq = query_tile
    m44_acc = jnp.zeros((4, 4), jnp.float32)

    for t in range(tiles_per_step):
        q = qall[t * tq:(t + 1) * tq, :]
        qpen = qpen_all[t * tq:(t + 1) * tq, :]
        base = off_ref[i * tiles_per_step + t]
        qn = jnp.sum(q * q, axis=1, keepdims=True)     # [TQ,1] |p|^2

        def body(j, carry):
            minv, mxyz1 = carry
            start = (base + j) * block
            win4 = dbt_ref[:, pl.ds(start, block)]  # [4,block] coords + ones
            # shifted distance d2' = -2 p.b + |b|^2 (+ mask penalty); |p|^2
            # is per-row constant so the argmin is unchanged — MXU does the
            # heavy lifting instead of 9 VPU passes of explicit (p-b)^2
            cross = jax.lax.dot_general(
                q, win4[0:3, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # [TQ,block]
            d2 = pen_ref[0:1, pl.ds(start, block)] - 2.0 * cross
            tmin = jnp.min(d2, axis=1, keepdims=True)
            # one-hot select of the argmin row(s); ties average out through
            # the count column of the extract matmul below
            sel = (d2 <= tmin).astype(jnp.float32)     # [TQ,block]
            ext = jax.lax.dot_general(
                sel, win4, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # [TQ,4] cx,cy,cz,cnt
            better = tmin < minv
            return (jnp.where(better, tmin, minv),
                    jnp.where(better, ext, mxyz1))

        init = (jnp.full((tq, 1), BIG),
                jnp.concatenate([jnp.zeros((tq, 3), jnp.float32),
                                 jnp.ones((tq, 1), jnp.float32)], axis=1))
        minv, mxyz1 = jax.lax.fori_loop(0, window_blocks, body, init)

        cnt = jnp.maximum(mxyz1[:, 3:4], 1.0)
        matched = mxyz1[:, 0:3] / cnt                  # tie-averaged coords
        w = ((minv + qn + qpen) < jnp.float32(thresh2)).astype(jnp.float32)
        ones = jnp.ones((tq, 1), jnp.float32)
        hp = jnp.concatenate([q, ones], axis=1) * w                  # [TQ,4]
        hq = jnp.concatenate([matched, ones], axis=1)                # [TQ,4]
        m44_acc = m44_acc + jax.lax.dot_general(
            hp, hq, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [4,4]

    @pl.when(i == 0)
    def _():
        out_ref[:] = m44_acc

    @pl.when(i > 0)
    def _():
        out_ref[:] = out_ref[:] + m44_acc


@partial(jax.jit, static_argnames=("block", "window_blocks", "query_tile",
                                   "dist_thresh", "interpret",
                                   "tiles_per_step"))
def icp_moments_banded(bdb: BandedDB, query: jax.Array,
                       query_mask: jax.Array,
                       dist_thresh: float = 5.0,
                       block: int = 2048, window_blocks: int = 2,
                       query_tile: int = 512, interpret: bool = False,
                       tiles_per_step: int = 4):
    """One fused ICP-association + moment-reduction pass.

    query [M,3] = transformed, SORTED src points; query_mask [M] validity.
    Returns the homogeneous moment matrix M [4,4] = sum w [p;1][q;1]^T
    summed over all tiles (q = matched db point in ORIGINAL coordinates).
    tiles_per_step batches that many query tiles into each sequential grid
    step (fewer grid steps -> less fixed per-step latency).
    """
    m = query.shape[0]
    step_q = query_tile * tiles_per_step
    mp = _round_up(m, step_q)
    q = jnp.zeros((mp, 3), jnp.float32).at[:m].set(query.astype(jnp.float32))
    qpen = jnp.full((mp, 1), BIG, jnp.float32).at[:m, 0].set(
        jnp.where(query_mask, 0.0, BIG))

    # axis-coordinate extraction as a 3-wide matvec: this runs EVERY ICP
    # iteration, and a take_along_axis gather is disproportionately slow
    # on TPU vs one fused multiply-add pass
    axis_onehot = (jnp.arange(3) == bdb.axis).astype(jnp.float32)
    qvals = q @ axis_onehot
    offsets = _tile_offsets(bdb, qvals, query_tile, block, window_blocks)

    mem = pl.ANY if interpret else pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // step_q,),
        in_specs=[
            pl.BlockSpec((step_q, 3), lambda i, off: (i, 0)),
            pl.BlockSpec((step_q, 1), lambda i, off: (i, 0)),
            pl.BlockSpec(memory_space=mem),
            pl.BlockSpec(memory_space=mem),
        ],
        out_specs=pl.BlockSpec((4, 4), lambda i, off: (0, 0)),
    )
    return pl.pallas_call(
        partial(_moments_kernel, block=block, window_blocks=window_blocks,
                thresh2=float(dist_thresh) ** 2,
                tiles_per_step=tiles_per_step, query_tile=query_tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, 4), jnp.float32),
        interpret=interpret,
    )(offsets, q, qpen, bdb.dbt4, bdb.pen2)


# -- v2: transform + window offsets fused INTO the kernel --------------------
#
# probe_glue/probe_unroll showed the fused-ICP per-iteration cost is
# dominated by the XLA glue ops around the kernel (transform apply, LUT
# offsets, padding), not by window compute. v2 passes the current pose as
# 16 SMEM scalars and does the rigid transform + per-tile window-offset
# lookup inside the kernel; per ICP iteration XLA retains only the 3x3
# Procrustes solve and the 4x4 compose. The layout flips to [block, TQ]
# so every reduction is a (cheap) sublane reduction and both matmuls
# contract without materialized transposes.


def _moments_kernel_v2(scal_ref, lut_ref, cent_ref, src_ref, spen_ref,
                       dbt_ref, pen_ref, out_ref, *, block: int,
                       window_blocks: int, thresh2: float,
                       query_tile: int, nb: int):
    i = pl.program_id(0)
    r00, r01, r02 = scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2]
    r10, r11, r12 = scal_ref[0, 3], scal_ref[0, 4], scal_ref[0, 5]
    r20, r21, r22 = scal_ref[0, 6], scal_ref[0, 7], scal_ref[0, 8]
    t0, t1, t2 = scal_ref[0, 9], scal_ref[0, 10], scal_ref[0, 11]
    lo, hi, axf = scal_ref[0, 12], scal_ref[0, 13], scal_ref[0, 14]

    # window offset from the tile's TRANSFORMED center (scalar math)
    c0 = cent_ref[0, 3 * i]
    c1 = cent_ref[0, 3 * i + 1]
    c2 = cent_ref[0, 3 * i + 2]
    cx = r00 * c0 + r01 * c1 + r02 * c2 + t0
    cy = r10 * c0 + r11 * c1 + r12 * c2 + t1
    cz = r20 * c0 + r21 * c1 + r22 * c2 + t2
    val = jnp.where(axf < 0.5, cx, jnp.where(axf < 1.5, cy, cz))
    binf = (val - lo) / jnp.maximum(hi - lo, 1e-12) * LUT_BINS
    bin_ = jnp.clip(binf.astype(jnp.int32), 0, LUT_BINS)
    base = jnp.clip(lut_ref[0, bin_] // block - window_blocks // 2,
                    0, nb - window_blocks)

    tq = query_tile
    q3 = src_ref[:, pl.ds(i * tq, tq)]                 # [3, TQ] source pts
    xt = r00 * q3[0:1] + r01 * q3[1:2] + r02 * q3[2:3] + t0
    yt = r10 * q3[0:1] + r11 * q3[1:2] + r12 * q3[2:3] + t1
    zt = r20 * q3[0:1] + r21 * q3[1:2] + r22 * q3[2:3] + t2
    qt3 = jnp.concatenate([xt, yt, zt], axis=0)        # [3, TQ] transformed
    qn = xt * xt + yt * yt + zt * zt                   # [1, TQ]
    qpen = spen_ref[0:1, pl.ds(i * tq, tq)]            # [1, TQ]

    def body(j, carry):
        minv, macc = carry                             # [1,TQ], [4,TQ]
        start = (base + j) * block
        win4 = dbt_ref[:, pl.ds(start, block)]         # [4, blk]
        cross = jax.lax.dot_general(
            win4[0:3, :], qt3, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [blk, TQ]
        d2 = pen_ref[pl.ds(start, block), 0:1] - 2.0 * cross
        tmin = jnp.min(d2, axis=0, keepdims=True)      # [1, TQ]
        sel = (d2 <= tmin).astype(jnp.float32)         # [blk, TQ]
        ext = jax.lax.dot_general(
            win4, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [4, TQ] cx cy cz cnt
        better = tmin < minv
        return (jnp.where(better, tmin, minv),
                jnp.where(better, ext, macc))

    init = (jnp.full((1, tq), BIG),
            jnp.concatenate([jnp.zeros((3, tq), jnp.float32),
                             jnp.ones((1, tq), jnp.float32)], axis=0))
    minv, macc = jax.lax.fori_loop(0, window_blocks, body, init)

    cnt = jnp.maximum(macc[3:4, :], 1.0)
    matched = macc[0:3, :] / cnt                       # tie-averaged coords
    w = ((minv + qn + qpen) < jnp.float32(thresh2)).astype(jnp.float32)
    ones = jnp.ones((1, tq), jnp.float32)
    hp = jnp.concatenate([qt3, ones], axis=0) * w      # [4, TQ]
    hq = jnp.concatenate([matched, ones], axis=0)      # [4, TQ]
    m44 = jax.lax.dot_general(hp, hq, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        out_ref[:] = m44

    @pl.when(i > 0)
    def _():
        out_ref[:] = out_ref[:] + m44


@partial(jax.jit, static_argnames=("block", "window_blocks", "query_tile",
                                   "dist_thresh", "interpret"))
def icp_moments_banded_v2(bdb: BandedDB, pen2t: jax.Array,
                          src3: jax.Array, spen: jax.Array,
                          centers: jax.Array, T: jax.Array,
                          dist_thresh: float = 5.0,
                          block: int = 2048, window_blocks: int = 2,
                          query_tile: int = 512,
                          interpret: bool = False) -> jax.Array:
    """One fused transform+association+moment pass given pose T [4,4].

    src3 [3, Mp]: SORTED source points (pre-transform, padded);
    spen [1, Mp]: 0 valid / BIG; centers [1, 3*ntiles]: per-tile center
    source coords; pen2t [Np, 1] = bdb.pen2 transposed. Returns M [4,4]
    = sum w [p;1][q;1]^T with p = T*src. All layout prep is once-per-ICP;
    the per-iteration XLA cost is just packing 16 scalars.
    """
    mp = src3.shape[1]
    nb = bdb.dbt4.shape[1] // block
    axf = bdb.axis.astype(jnp.float32)
    scal = jnp.concatenate([
        T[:3, :3].reshape(9), T[:3, 3], bdb.lo[None], bdb.hi[None],
        axf[None], jnp.zeros((1,), jnp.float32)]).reshape(1, 16)

    mem = pl.ANY if interpret else pltpu.VMEM
    smem = pl.ANY if interpret else pltpu.SMEM
    grid_spec = pl.GridSpec(
        grid=(mp // query_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=smem),   # scal
            pl.BlockSpec(memory_space=smem),   # lut
            pl.BlockSpec(memory_space=smem),   # centers
            pl.BlockSpec(memory_space=mem),    # src3
            pl.BlockSpec(memory_space=mem),    # spen
            pl.BlockSpec(memory_space=mem),    # dbt4
            pl.BlockSpec(memory_space=mem),    # pen2t
        ],
        out_specs=pl.BlockSpec((4, 4), lambda i: (0, 0)),
    )
    return pl.pallas_call(
        partial(_moments_kernel_v2, block=block,
                window_blocks=window_blocks,
                thresh2=float(dist_thresh) ** 2,
                query_tile=query_tile, nb=nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, 4), jnp.float32),
        interpret=interpret,
    )(scal, bdb.lut[None, :], centers, src3, spen, bdb.dbt4, pen2t)
