"""Rotated 3D-box ops: BEV/3D IoU, rotated NMS, ROI point pooling.

TPU-native equivalent of the reference's PointRCNN CUDA ops (SURVEY.md C47:
`ObjectDetection_Kitti/` submodule's `iou3d` and `roipool3d` kernels, named
in `build_and_install.sh:5-9` — the submodule itself is empty upstream).
The CUDA versions loop polygon clipping per thread; here every pairwise
intersection is a fixed-shape masked Sutherland-Hodgman clip, vmapped over
the N x M pair grid so XLA vectorizes it onto the VPU — no data-dependent
shapes anywhere.

Box convention (PointRCNN/lidar style): ``(x, y, z, dx, dy, dz, yaw)`` —
center, full extents, rotation about +z. The KITTI camera-frame evaluator
(`pctpu.pipelines.kitti_eval`) keeps its own NumPy geometry; its
polygon-clip is the test oracle for this module.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_MAX_VERTS = 8  # a convex quad clipped by 4 half-planes has <= 8 vertices


def bev_corners(boxes: jax.Array) -> jax.Array:
    """(...,7) boxes -> (...,4,2) CCW BEV corners (x-y plane)."""
    cx, cy = boxes[..., 0], boxes[..., 1]
    hx, hy = boxes[..., 3] * 0.5, boxes[..., 4] * 0.5
    yaw = boxes[..., 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # CCW local order: (+,+), (-,+), (-,-), (+,-)
    lx = jnp.stack([hx, -hx, -hx, hx], -1)
    ly = jnp.stack([hy, hy, -hy, -hy], -1)
    px = cx[..., None] + c[..., None] * lx - s[..., None] * ly
    py = cy[..., None] + s[..., None] * lx + c[..., None] * ly
    return jnp.stack([px, py], -1)


def corners3d(boxes: jax.Array) -> jax.Array:
    """(...,7) boxes -> (...,8,3) corners (bottom 4 CCW, then top 4)."""
    bev = bev_corners(boxes)  # (...,4,2)
    z0 = boxes[..., 2] - boxes[..., 5] * 0.5
    z1 = boxes[..., 2] + boxes[..., 5] * 0.5
    bot = jnp.concatenate([bev, jnp.broadcast_to(z0[..., None, None],
                                                 bev.shape[:-1] + (1,))], -1)
    top = jnp.concatenate([bev, jnp.broadcast_to(z1[..., None, None],
                                                 bev.shape[:-1] + (1,))], -1)
    return jnp.concatenate([bot, top], -2)


def _clip_halfplane(verts, count, n, c):
    """Clip polygon (verts[MAX,2] valid up to count) by half-plane n.x>=c.

    Masked Sutherland-Hodgman step: every slot emits (kept vertex,
    crossing intersection) candidates in cyclic order; a cumsum compaction
    packs the valid ones back into the fixed buffer.
    """
    idx = jnp.arange(_MAX_VERTS)
    valid = idx < count
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    p = verts
    q = verts[nxt]
    dp = p @ n - c
    dq = dp[nxt]
    p_in = dp >= 0
    q_in = dq >= 0
    denom = dp - dq
    t = dp / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    inter = p + t[:, None] * (q - p)
    cand = jnp.stack([p, inter], 1).reshape(2 * _MAX_VERTS, 2)
    cvalid = jnp.stack([p_in & valid, (p_in ^ q_in) & valid],
                       1).reshape(2 * _MAX_VERTS)
    pos = jnp.where(cvalid, jnp.cumsum(cvalid) - 1, 2 * _MAX_VERTS)
    out = jnp.zeros((_MAX_VERTS, 2), verts.dtype).at[pos].set(
        cand, mode="drop")
    return out, jnp.minimum(cvalid.sum(), _MAX_VERTS)


def _poly_area(verts, count):
    """Shoelace area of the first `count` vertices (CCW positive)."""
    idx = jnp.arange(_MAX_VERTS)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    p, q = verts, verts[nxt]
    cross = p[:, 0] * q[:, 1] - q[:, 0] * p[:, 1]
    return 0.5 * jnp.where(idx < count, cross, 0.0).sum()


def _rect_intersection_area(ca, cb):
    """Intersection area of two CCW quads (each (4,2))."""
    verts = jnp.zeros((_MAX_VERTS, 2), ca.dtype).at[:4].set(ca)
    count = jnp.asarray(4, jnp.int32)

    def clip_edge(carry, i):
        verts, count = carry
        a = cb[i]
        b = cb[(i + 1) % 4]
        e = b - a
        n = jnp.stack([-e[1], e[0]])  # inside of CCW polygon = left of edge
        verts, count = _clip_halfplane(verts, count, n, n @ a)
        return (verts, count), None

    (verts, count), _ = jax.lax.scan(clip_edge, (verts, count),
                                     jnp.arange(4))
    return jnp.where(count >= 3, _poly_area(verts, count), 0.0)


@jax.jit
def iou_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Rotated bird's-eye-view IoU matrix. (N,7),(M,7) -> (N,M)."""
    ca = bev_corners(boxes_a)
    cb = bev_corners(boxes_b)
    inter = jax.vmap(lambda a: jax.vmap(
        lambda b: _rect_intersection_area(a, b))(cb))(ca)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)


@jax.jit
def iou3d(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Rotated 3D IoU matrix (BEV intersection x z-overlap). -> (N,M)."""
    ca = bev_corners(boxes_a)
    cb = bev_corners(boxes_b)
    inter_bev = jax.vmap(lambda a: jax.vmap(
        lambda b: _rect_intersection_area(a, b))(cb))(ca)
    za0 = boxes_a[:, 2] - boxes_a[:, 5] * 0.5
    za1 = boxes_a[:, 2] + boxes_a[:, 5] * 0.5
    zb0 = boxes_b[:, 2] - boxes_b[:, 5] * 0.5
    zb1 = boxes_b[:, 2] + boxes_b[:, 5] * 0.5
    ih = jnp.maximum(
        jnp.minimum(za1[:, None], zb1[None, :])
        - jnp.maximum(za0[:, None], zb0[None, :]), 0.0)
    inter = inter_bev * ih
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.maximum(vol_a + vol_b - inter, 1e-9)


@partial(jax.jit, static_argnames=("max_out", "bev"))
def nms_rotated(boxes: jax.Array, scores: jax.Array, iou_thresh: float,
                max_out: int, bev: bool = True):
    """Greedy rotated NMS (the PointRCNN `iou3d` kernel's consumer).

    Returns (idx [max_out] into `boxes` in descending-score order,
    valid [max_out]). Suppression uses BEV IoU by default (`bev=False`
    switches to full 3D IoU).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sb = boxes[order]
    mat = iou_bev(sb, sb) if bev else iou3d(sb, sb)

    def body(i, keep):
        sup = (mat[i] > iou_thresh) & (jnp.arange(n) > i) & keep[i]
        return keep & ~sup

    keep = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    # top_k on the keep mask: equal values tie-break by ascending index,
    # i.e. kept entries come out in descending-score order, pads after.
    # Pad the mask up to max_out so a fixed output budget larger than the
    # candidate count is legal (common in detection post-processing).
    pad = max(0, max_out - n)
    keep_f = jnp.pad(keep.astype(jnp.float32), (0, pad))
    order_p = jnp.pad(order, (0, pad), constant_values=-1)
    vals, kidx = jax.lax.top_k(keep_f, max_out)
    valid = vals > 0
    return jnp.where(valid, order_p[kidx], -1), valid


@jax.jit
def points_in_boxes(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """(N,3) points, (M,7) boxes -> bool (M,N) membership mask."""
    rel = points[None, :, :] - boxes[:, None, :3]
    yaw = boxes[:, 6]
    c, s = jnp.cos(yaw)[:, None], jnp.sin(yaw)[:, None]
    lx = c * rel[..., 0] + s * rel[..., 1]
    ly = -s * rel[..., 0] + c * rel[..., 1]
    lz = rel[..., 2]
    return ((jnp.abs(lx) <= boxes[:, None, 3] * 0.5)
            & (jnp.abs(ly) <= boxes[:, None, 4] * 0.5)
            & (jnp.abs(lz) <= boxes[:, None, 5] * 0.5))


@partial(jax.jit, static_argnames=("cap",))
def roipool3d(points: jax.Array, feats: jax.Array, boxes: jax.Array,
              cap: int = 512):
    """Pool the first `cap` in-box points per ROI (PointRCNN `roipool3d`).

    Returns (xyz [M,cap,3] in box-local frame, feats [M,cap,C],
    valid [M,cap], count [M] — true in-box count, may exceed cap).
    Selection order is point order, like the CUDA kernel's first-k scan.
    """
    inside = points_in_boxes(points, boxes)  # (M,N)
    count = inside.sum(-1)
    # top_k on the mask: ties broken by lowest index = first-k semantics.
    # Pad the point axis up to cap so clouds smaller than the pool budget
    # (filtered/sparse ROIs) are legal; padded slots come out valid=False.
    pad = max(0, cap - inside.shape[1])
    inside_f = jnp.pad(inside.astype(jnp.float32), ((0, 0), (0, pad)))
    vals, idx = jax.lax.top_k(inside_f, cap)
    idx = jnp.minimum(idx, points.shape[0] - 1)  # clamp padded gathers
    valid = vals > 0
    sel = jnp.take(points, idx, axis=0)  # (M,cap,3)
    rel = sel - boxes[:, None, :3]
    yaw = boxes[:, 6]
    c, s = jnp.cos(yaw)[:, None], jnp.sin(yaw)[:, None]
    local = jnp.stack([c * rel[..., 0] + s * rel[..., 1],
                       -s * rel[..., 0] + c * rel[..., 1],
                       rel[..., 2]], -1)
    pooled_f = jnp.take(feats, idx, axis=0)
    mask3 = valid[..., None]
    return (jnp.where(mask3, local, 0.0),
            jnp.where(mask3, pooled_f, 0.0), valid, count)
