"""Fused Pallas FPFH-33 — single-pass SPFH + neighbor-weighted sum in VMEM.

Same descriptor as `features.fpfh_dense` (PCL FPFH semantics, the
registration front end's feature stage — `Registration/main.py:44-46`,
`PCLKeypoints/src/keypoints.cpp:112-163`) but with the whole Darboux
angle + histogram computation fused into one kernel per pass:

The XLA dense path (`fpfh_dense`) materializes ~40 [B,Q,N] intermediates
(d2, within, f1/f2/f3, 33 histogram select-reduce passes) to HBM — at a
16x2048 batch that's dozens of round-trips over 64 MB arrays, and the
stage measures ~6.4 ms/cloud-batch. Here each [TQ,TN] distance tile is
computed ON-CHIP (squared differences on the VPU — exact f32, no
|a|^2+|b|^2-2ab cancellation), the three Darboux angle features and
their 33 histogram accumulations happen while the tile is live in VMEM,
and only the [B,N,33] result ever touches HBM: traffic is O(N*C), not
O(N^2 * passes).

Pass 1 (`_spfh_kernel`): per query tile, loop db tiles; accumulate the
3x11-bin SPFH histogram and the neighbor count.
Pass 2 (`_wsum_kernel`): recompute the distance tile, accumulate the
1/dist-weighted neighbor SPFH sum as [TQ,TN]x[TN,33] MXU dots.

Matches `fpfh_dense` to float tolerance given the same normals
(tests/test_features.py::test_fpfh_pallas_matches_dense).
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


def _dist_tile(q, qx, qy, qz, dbt_ref, pen_ref, start, tn):
    """[TQ,TN] squared distances (+BIG on masked/pad cols) for one db tile."""
    px = dbt_ref[0, 0:1, pl.ds(start, tn)]
    py = dbt_ref[0, 1:2, pl.ds(start, tn)]
    pz = dbt_ref[0, 2:3, pl.ds(start, tn)]
    dx = px - qx
    dy = py - qy
    dz = pz - qz
    d2 = dx * dx + dy * dy + dz * dz
    pen = pen_ref[0, 0:1, pl.ds(start, tn)]
    return dx, dy, dz, d2, pen


def _spfh_kernel(q_ref, qn_ref, dbt_ref, dbnt_ref, pen_ref,
                 hist_ref, cnt_ref, *, db_tile: int, r2: float):
    tq = q_ref.shape[1]
    n = dbt_ref.shape[2]
    n_tiles = n // db_tile
    i = pl.program_id(1)

    q = q_ref[0]                                   # [TQ,3]
    nq = qn_ref[0]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    ux, uy, uz = nq[:, 0:1], nq[:, 1:2], nq[:, 2:3]
    rows = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)

    def body(j, carry):
        hist, cnt = carry
        start = j * db_tile
        dx, dy, dz, d2, pen = _dist_tile(q, qx, qy, qz, dbt_ref, pen_ref,
                                         start, db_tile)
        cols = (start
                + jax.lax.broadcasted_iota(jnp.int32, (tq, db_tile), 1))
        within = ((d2 + pen <= r2) & (rows != cols))
        wf = within.astype(jnp.float32)            # [TQ,TN]
        inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))

        vx = dbnt_ref[0, 0:1, pl.ds(start, db_tile)]
        vy = dbnt_ref[0, 1:2, pl.ds(start, db_tile)]
        vz = dbnt_ref[0, 2:3, pl.ds(start, db_tile)]
        # u = n_row; f2 = u . dhat (d = p_col - q_row)
        f2 = (ux * dx + uy * dy + uz * dz) * inv_d
        # g = u x n_col
        gx = uy * vz - uz * vy
        gy = uz * vx - ux * vz
        gz = ux * vy - uy * vx
        s = jnp.sqrt(jnp.maximum(1.0 - f2 * f2, 0.0))
        inv_s = 1.0 / jnp.maximum(s, 1e-12)
        f1 = (dx * gx + dy * gy + dz * gz) * inv_d * inv_s
        un = ux * vx + uy * vy + uz * vz
        dn = (dx * vx + dy * vy + dz * vz) * inv_d
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
    hist, cnt = jax.lax.fori_loop(0, n_tiles, body, (hist0, cnt0))
    cnt = jnp.maximum(cnt, 1.0)
    hist_ref[0] = hist * (100.0 / cnt)
    cnt_ref[0] = cnt


def _wsum_kernel(q_ref, dbt_ref, pen_ref, s33_ref, out_ref,
                 *, db_tile: int, r2: float):
    tq = q_ref.shape[1]
    n = dbt_ref.shape[2]
    n_tiles = n // db_tile
    i = pl.program_id(1)

    q = q_ref[0]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    rows = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)

    def body(j, carry):
        acc, k_eff = carry
        start = j * db_tile
        _, _, _, d2, pen = _dist_tile(q, qx, qy, qz, dbt_ref, pen_ref,
                                      start, db_tile)
        cols = (start
                + jax.lax.broadcasted_iota(jnp.int32, (tq, db_tile), 1))
        within = ((d2 + pen <= r2) & (rows != cols))
        wf = within.astype(jnp.float32)
        wd = wf * jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
        s33 = s33_ref[0, pl.ds(start, db_tile), :]        # [TN,33]
        acc = acc + jax.lax.dot_general(
            wd, s33, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, k_eff + jnp.sum(wf, axis=1, keepdims=True)

    acc0 = jnp.zeros((tq, 3 * N_BINS), jnp.float32)
    k0 = jnp.zeros((tq, 1), jnp.float32)
    acc, k_eff = jax.lax.fori_loop(0, n_tiles, body, (acc0, k0))
    out_ref[0] = acc / jnp.maximum(k_eff, 1.0)


@partial(jax.jit,
         static_argnames=("radius", "q_tile", "db_tile", "interpret"))
def _fpfh_fused_impl(points, mask, normals, radius: float,
                     q_tile: int, db_tile: int, interpret: bool):
    b, n, _ = points.shape
    np_ = _round_up(n, max(q_tile, db_tile))
    r2 = float(radius) ** 2

    pts = jnp.where(mask[..., None], points, 0.0).astype(jnp.float32)
    qpad = jnp.zeros((b, np_, 3), jnp.float32).at[:, :n].set(pts)
    qnpad = jnp.zeros((b, np_, 3), jnp.float32).at[:, :n].set(
        normals.astype(jnp.float32))
    dbt = jnp.swapaxes(qpad, 1, 2)                        # [B,3,Np]
    dbnt = jnp.swapaxes(qnpad, 1, 2)
    col_valid = (jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1) < n)
    pen = jnp.where(col_valid & jnp.pad(mask, ((0, 0), (0, np_ - n))),
                    0.0, BIG)[:, None, :]                 # [B,1,Np]

    grid = (b, np_ // q_tile)
    ms = pl.ANY if interpret else pltpu.VMEM

    def qspec(c):
        return pl.BlockSpec((1, q_tile, c), lambda bi, i: (bi, i, 0),
                            memory_space=ms)

    def dbspec(r, c):
        return pl.BlockSpec((1, r, c), lambda bi, i: (bi, 0, 0),
                            memory_space=ms)

    s33, _cnt = pl.pallas_call(
        partial(_spfh_kernel, db_tile=db_tile, r2=r2),
        grid=grid,
        in_specs=[qspec(3), qspec(3), dbspec(3, np_), dbspec(3, np_),
                  dbspec(1, np_)],
        out_specs=[qspec(3 * N_BINS), qspec(1)],
        out_shape=[jax.ShapeDtypeStruct((b, np_, 3 * N_BINS), jnp.float32),
                   jax.ShapeDtypeStruct((b, np_, 1), jnp.float32)],
        interpret=interpret,
    )(qpad, qnpad, dbt, dbnt, pen)

    nbr = pl.pallas_call(
        partial(_wsum_kernel, db_tile=db_tile, r2=r2),
        grid=grid,
        in_specs=[qspec(3), dbspec(3, np_), dbspec(1, np_),
                  dbspec(np_, 3 * N_BINS)],
        out_specs=qspec(3 * N_BINS),
        out_shape=jax.ShapeDtypeStruct((b, np_, 3 * N_BINS), jnp.float32),
        interpret=interpret,
    )(qpad, dbt, pen, s33)

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
               interpret: bool = False) -> jax.Array:
    """points [B,N,3] (or [N,3]) -> FPFH [B,N,33] (or [N,33]), fused.

    Drop-in for `fpfh_dense` (same defaults, same normals source); the
    descriptor math itself runs in two Pallas kernels with no [Q,N] HBM
    intermediates.
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
        from pctpu.features.fpfh_dense import normals_radius_dense
        normals = normals_radius_dense(points, mask, radius=normal_radius)
    out = _fpfh_fused_impl(points, mask, normals, float(radius),
                           q_tile, db_tile, interpret)
    return out[0] if squeeze else out
