"""Minimal PointRCNN-style detector over `ops.box3d` (SURVEY.md C47).

The reference's `ObjectDetection_Kitti/` vendors PointRCNN as an (empty)
submodule whose CUDA ops (`iou3d`, `roipool3d`) are named in
`build_and_install.sh:5-9`; `pctpu.ops.box3d` re-implements those ops
TPU-natively. This module closes the loop with the minimal two-stage
detector that CONSUMES them, PointRCNN-shaped (arXiv:1812.04244):

Stage 1 (`ProposalNet`): a window-grouping PointNet++ encoder/decoder
(the semseg trunk shape) emits per-point foreground logits and a
bin-free box residual (center offset, log-extent ratios vs an anchor,
yaw as sin/cos). `decode_proposals` turns every point into a candidate
box; `extract_proposals` keeps the top-K by score and prunes with
`nms_rotated` — the iou3d kernel's consumer.

Stage 2 (`RefineNet`): `roipool3d` pools canonical in-box points per
proposal; a PointNet (shared MLP + masked max) regresses a residual and
a confidence — the canonical-refinement stage, minimal form.

All compute is batched fixed-shape JAX; grouping is the gather-free
window path, so the whole forward jits onto the MXU/VPU without
data-dependent shapes.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pctpu.models.pointnet2 import (FeaturePropagation, SetAbstraction,
                                    SharedMLP, split_pointcloud)
from pctpu.ops.box3d import nms_rotated, points_in_boxes, roipool3d

# anchor extents (l, w, h) — PointRCNN's car anchor
CAR_ANCHOR = (3.9, 1.6, 1.56)


class ProposalNet(nn.Module):
    """Stage-1 RPN: per-point foreground score + box residual.

    Inputs must be Morton-sorted (`pointnet2.morton_sort_packed`) — the
    window grouping path's contract; outputs stay in sorted point order.
    Output: (scores [B,N], reg [B,N,8]) with reg =
    (dx, dy, dz, dlog_l, dlog_w, dlog_h, sin_yaw, cos_yaw)."""
    npoints: Sequence[int] = (1024, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pc, train: bool = False, bn_momentum=0.1):
        xyz, features = split_pointcloud(pc)
        l_xyz, l_feats = [xyz], [features]
        for i, (np_, ch) in enumerate(zip(
                self.npoints, ((64, 64, 128), (128, 128, 256)))):
            sa = SetAbstraction(npoint=np_, radii=[None], nsamples=[32],
                                mlps=[ch], grouping="window",
                                dtype=self.dtype)
            nxyz, nfeat = sa(l_xyz[-1], l_feats[-1], train, bn_momentum)
            l_xyz.append(nxyz)
            l_feats.append(nfeat)
        for i in range(len(self.npoints), 0, -1):
            fp = FeaturePropagation(
                mlp=(128, 128), grouping="window", dtype=self.dtype)
            l_feats[i - 1] = fp(l_xyz[i - 1], l_xyz[i], l_feats[i - 1],
                                l_feats[i], train, bn_momentum)
        h = l_feats[0]                                     # [B,N,128]
        score = nn.Dense(1, dtype=jnp.float32)(h)[..., 0]  # fg logit
        reg = nn.Dense(8, dtype=jnp.float32)(h)
        return score, reg


def decode_proposals(xyz: jax.Array, reg: jax.Array,
                     anchor=CAR_ANCHOR) -> jax.Array:
    """Per-point box decode: [.. ,N,3] xyz + [..,N,8] residuals ->
    [..,N,7] (x,y,z,l,w,h,yaw) boxes in the `ops.box3d` convention."""
    a = jnp.asarray(anchor, jnp.float32)
    center = xyz + reg[..., 0:3]
    ext = a * jnp.exp(jnp.clip(reg[..., 3:6], -3.0, 3.0))
    yaw = jnp.arctan2(reg[..., 6], reg[..., 7])
    return jnp.concatenate([center, ext, yaw[..., None]], axis=-1)


def extract_proposals(boxes: jax.Array, scores: jax.Array,
                      pre_nms_top: int = 256, post_nms: int = 32,
                      iou_thresh: float = 0.7):
    """[N,7] candidate boxes + [N] logits -> (boxes [post_nms,7],
    scores [post_nms], valid [post_nms]) after top-K + rotated NMS."""
    k = min(pre_nms_top, scores.shape[0])
    top_s, top_i = jax.lax.top_k(scores, k)
    cand = boxes[top_i]
    idx, valid = nms_rotated(cand, top_s, iou_thresh, post_nms)
    safe = jnp.maximum(idx, 0)
    return (jnp.where(valid[:, None], cand[safe], 0.0),
            jnp.where(valid, top_s[safe], -jnp.inf), valid)


class RefineNet(nn.Module):
    """Stage-2 canonical refinement: roipool3d -> PointNet -> residual +
    confidence. Boxes/points are per-scene (vmap over scenes outside)."""
    cap: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, feats, boxes, train: bool = False,
                 bn_momentum=0.1):
        """points [N,3], feats [N,C], boxes [M,7] ->
        (residual [M,8], confidence [M])."""
        local, pooled, valid, _ = roipool3d(points, feats, boxes,
                                            cap=self.cap)
        g = jnp.concatenate([local, pooled], axis=-1)      # [M,cap,3+C]
        h = SharedMLP((128, 128), dtype=self.dtype)(
            g[None], train, bn_momentum)[0]                # [M,cap,128]
        h = jnp.where(valid[..., None], h, -jnp.inf)
        h = jnp.max(h, axis=1)
        h = jnp.where(jnp.any(valid, axis=1)[:, None], h, 0.0)
        res = nn.Dense(8, dtype=jnp.float32)(h)
        conf = nn.Dense(1, dtype=jnp.float32)(h)[..., 0]
        return res, conf


def proposal_targets(xyz: jax.Array, gt_boxes: jax.Array,
                     anchor=CAR_ANCHOR):
    """Per-point RPN targets from ground-truth boxes (one scene).

    xyz [N,3], gt_boxes [G,7] (rows may be all-zero padding) ->
    (fg [N] bool, reg_target [N,8]): a point is foreground iff inside a
    (non-degenerate) gt box; its regression target points at that box."""
    a = jnp.asarray(anchor, jnp.float32)
    real = gt_boxes[:, 3] > 0                               # [G]
    inside = points_in_boxes(xyz, gt_boxes) & real[:, None]  # [G,N]
    fg = jnp.any(inside, axis=0)
    owner = jnp.argmax(inside, axis=0)                      # [N]
    ob = gt_boxes[owner]                                    # [N,7]
    reg = jnp.concatenate([
        ob[:, :3] - xyz,
        jnp.log(jnp.maximum(ob[:, 3:6], 1e-3) / a),
        jnp.sin(ob[:, 6:7]), jnp.cos(ob[:, 6:7])], axis=-1)
    return fg, reg


def rpn_loss(score, reg, fg, reg_target, fg_weight: float = 1.0):
    """Binary focal-free RPN loss: balanced BCE on fg + smooth-L1 on the
    residuals of foreground points. All fixed-shape."""
    p = jax.nn.log_sigmoid(score)
    q = jax.nn.log_sigmoid(-score)
    nf = jnp.maximum(jnp.sum(fg), 1.0)
    nb = jnp.maximum(jnp.sum(~fg), 1.0)
    cls = -(fg_weight * jnp.sum(jnp.where(fg, p, 0.0)) / nf
            + jnp.sum(jnp.where(~fg, q, 0.0)) / nb)
    d = reg - reg_target
    ad = jnp.abs(d)
    sl1 = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
    regl = jnp.sum(jnp.where(fg[..., None], sl1, 0.0)) / nf
    return cls + regl, {"cls": cls, "reg": regl}
