"""Fused ball-query + grouping Pallas kernel (VERDICT r2 #5).

The XLA ball path pays twice per SA scale: `jax.lax.top_k` over the full
point axis to pick the first-nsample within-radius hits, then a [B,M,K,C]
dynamic HBM gather to group them. This kernel keeps the whole (packed,
channels-last) cloud resident in VMEM and, per center tile, runs the
selection as K sequential min-extractions over the candidate axis — each
extraction emits its point's full channel row via ONE one-hot MXU matmul,
so the grouped tensor is produced directly, in order, with zero gathers.

Semantics are the reference CUDA kernel's exactly
(`ball_query_gpu.cu:9-44` + `group_points_gpu.cu:8-28`): hits taken in
ORIGINAL index order (no spatial sort needed — the scan covers the full
axis), d^2 < radius^2 strict, unfilled slots repeat the FIRST hit, and the
relative-xyz subtraction (`pointnet2_utils.py:312-316`) is applied to the
leading 3 channels in-kernel. The backward pass is the reference's
gather-only gradient (`group_points_gpu.cu:43-64`, atomicAdd) as a
deterministic segment-sum scatter over the emitted indices.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
INT_BIG = 2**30


def _ballgroup_kernel(c3_ref, packed_ref, b2_ref, out_ref, idx_ref, *,
                      radius: float, nsample: int, tile: int,
                      sub_xyz: bool):
    cp = packed_ref.shape[0]                               # C'8 (padded)
    n = packed_ref.shape[1]
    i = pl.program_id(0)
    c3 = c3_ref[:, pl.ds(i * tile, tile)]                  # [3, TQ] centers
    slab = packed_ref[:]                                   # [C', N]
    cross = jax.lax.dot_general(
        slab[0:3, :], c3, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [N, TQ]
    c2 = jnp.sum(c3 * c3, axis=0, keepdims=True)           # [1, TQ]
    d2 = b2_ref[:] + c2 - 2.0 * cross                      # [N, TQ]
    within = d2 < jnp.float32(radius) ** 2
    rowidx = jax.lax.broadcasted_iota(jnp.int32, (n, tile), 0)
    mval0 = jnp.where(within, rowidx, INT_BIG)             # [N, TQ]

    # first hit (k=0) — also the pad row for unfilled slots
    m0 = jnp.min(mval0, axis=0, keepdims=True)             # [1, TQ]
    i0 = jnp.where(m0 < INT_BIG, m0, 0)
    sel0 = (mval0 == m0).astype(jnp.float32)               # one-hot or zero
    row0 = jax.lax.dot_general(
        slab, sel0, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [C', TQ]
    if sub_xyz:
        out0 = jnp.concatenate([row0[0:3, :] - c3, row0[3:, :]], axis=0)
    else:
        out0 = row0
    out_ref[pl.ds(0, cp), :] = out0
    kidx = jax.lax.broadcasted_iota(jnp.int32, (nsample, tile), 0)
    idx_acc = jnp.broadcast_to(i0, (nsample, tile))

    def body(k, carry):
        mval, idx_acc = carry
        mval = jnp.where(mval == jnp.min(mval, axis=0, keepdims=True),
                         INT_BIG, mval)
        mk = jnp.min(mval, axis=0, keepdims=True)          # [1, TQ]
        found = mk < INT_BIG
        sel = (mval == mk).astype(jnp.float32)
        row = jax.lax.dot_general(
            slab, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [C', TQ]
        row = jnp.where(found, row, row0)                  # pad-with-first
        if sub_xyz:
            row = jnp.concatenate([row[0:3, :] - c3, row[3:, :]], axis=0)
        out_ref[pl.ds(k * cp, cp), :] = row
        idx_acc = jnp.where(kidx == k, jnp.where(found, mk, i0), idx_acc)
        return mval, idx_acc

    _, idx_acc = jax.lax.fori_loop(1, nsample, body, (mval0, idx_acc))
    idx_ref[:] = idx_acc


@partial(jax.jit, static_argnames=("radius", "nsample", "tile", "sub_xyz",
                                   "interpret"))
def _ball_group_fwd_impl(centers: jax.Array, packed: jax.Array,
                         points_mask: Optional[jax.Array],
                         radius: float, nsample: int,
                         tile: int, sub_xyz: bool, interpret: bool):
    m, _ = centers.shape
    n, cp = packed.shape
    if points_mask is None:
        points_mask = jnp.ones((n,), bool)
    mp = ((m + tile - 1) // tile) * tile
    cp8 = ((cp + 7) // 8) * 8    # dynamic sublane stores need 8-alignment
    c3 = jnp.zeros((3, mp), jnp.float32).at[:, :m].set(
        centers.astype(jnp.float32).T)
    packed_t = jnp.zeros((cp8, n), jnp.float32).at[:cp].set(
        packed.astype(jnp.float32).T)                      # [C'8, N]
    b2 = jnp.sum(packed_t[0:3, :] ** 2, axis=0)[:, None]   # [N, 1]
    b2 = jnp.where(points_mask[:, None], b2, BIG)

    mem = pl.ANY if interpret else pltpu.VMEM
    grid_spec = pl.GridSpec(
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=mem),    # c3
            pl.BlockSpec(memory_space=mem),    # packed_t
            pl.BlockSpec(memory_space=mem),    # b2
        ],
        out_specs=[
            pl.BlockSpec((nsample * cp8, tile), lambda i: (0, i)),
            pl.BlockSpec((nsample, tile), lambda i: (0, i)),
        ],
    )
    out, idx = pl.pallas_call(
        partial(_ballgroup_kernel, radius=radius, nsample=nsample,
                tile=tile, sub_xyz=sub_xyz),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nsample * cp8, mp), jnp.float32),
            jax.ShapeDtypeStruct((nsample, mp), jnp.int32),
        ],
        interpret=interpret,
    )(c3, packed_t, b2)
    # [K*C'8, Mp] -> [M, K, C']; idx [K, Mp] -> [M, K]
    grouped = out.reshape(nsample, cp8, mp).transpose(2, 0, 1)[:m, :, :cp]
    return grouped, idx.T[:m]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def ball_group_pallas(centers: jax.Array, packed: jax.Array,
                      radius: float = 1.0, nsample: int = 32,
                      tile: int = 128, sub_xyz: bool = True,
                      interpret: bool = False) -> jax.Array:
    """centers [M,3], packed [N, 3+C] (xyz first) -> grouped [M, nsample,
    3+C] with grouped[..., :3] center-relative when sub_xyz.

    Equivalent to group_points(packed, ball_query(...)[0]) with the
    rel-xyz subtraction, in one kernel without top_k or gathers.
    Differentiable w.r.t. packed and centers (selection treated as
    constant, like the reference autograd layer)."""
    grouped, _ = _ball_group_fwd_impl(centers, packed, None, radius,
                                      nsample, tile, sub_xyz, interpret)
    return grouped


def _bg_fwd(centers, packed, radius, nsample, tile, sub_xyz, interpret):
    grouped, idx = _ball_group_fwd_impl(centers, packed, None, radius,
                                        nsample, tile, sub_xyz, interpret)
    return grouped, (idx, packed.shape[0])


def _bg_bwd(radius, nsample, tile, sub_xyz, interpret, res, ct):
    idx, n = res                                  # idx [M, K]
    m, k, cp = ct.shape
    flat = ct.reshape(m * k, cp)
    d_packed = jax.ops.segment_sum(flat, idx.reshape(-1), num_segments=n)
    if sub_xyz:
        d_centers = -jnp.sum(ct[..., :3], axis=1)
    else:
        d_centers = jnp.zeros((m, 3), ct.dtype)
    return d_centers, d_packed


ball_group_pallas.defvjp(_bg_fwd, _bg_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def ball_group_pallas_batched(centers: jax.Array, packed: jax.Array,
                              radius: float, nsample: int,
                              tile: int = 128, sub_xyz: bool = True,
                              interpret: bool = False):
    """[B,M,3] x [B,N,3+C] -> [B,M,nsample,3+C].

    Has its OWN custom VJP (rather than vmapping the single-cloud one):
    the backward folds the batch into the segment ids and runs ONE flat
    deterministic segment-sum — a scatter-add with a leading batch dim
    lowers poorly on TPU, the flat single-axis scatter is the fast path
    (same finding as `ops.gather._flat_row_gather`). This is the
    deterministic counterpart of the reference's atomicAdd grad
    (`group_points_gpu.cu:43-64`)."""
    grouped, _ = jax.vmap(
        lambda c, p: _ball_group_fwd_impl(c, p, None, radius, nsample,
                                          tile, sub_xyz, interpret)
    )(centers, packed)
    return grouped


def _bgb_fwd(centers, packed, radius, nsample, tile, sub_xyz, interpret):
    grouped, idx = jax.vmap(
        lambda c, p: _ball_group_fwd_impl(c, p, None, radius, nsample,
                                          tile, sub_xyz, interpret)
    )(centers, packed)
    return grouped, (idx, packed.shape[1])


def _bgb_bwd(radius, nsample, tile, sub_xyz, interpret, res, ct):
    idx, n = res                                  # idx [B, M, K]
    b, m, k, cp = ct.shape
    flat_ct = ct.reshape(b * m * k, cp)
    off = jnp.arange(b, dtype=jnp.int32) * n
    flat_idx = (idx.reshape(b, m * k) + off[:, None]).reshape(-1)
    d_packed = jax.ops.segment_sum(
        flat_ct, flat_idx, num_segments=b * n).reshape(b, n, cp)
    if sub_xyz:
        d_centers = -jnp.sum(ct[..., :3], axis=2)
    else:
        d_centers = jnp.zeros((b, m, 3), ct.dtype)
    return d_centers, d_packed


ball_group_pallas_batched.defvjp(_bgb_fwd, _bgb_bwd)
