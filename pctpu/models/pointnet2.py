"""PointNet++ building blocks and model families (flax.linen, channels-last).

TPU-first re-design of the reference's torch modules
(`pointnet2_ops/pointnet2_modules.py`, models in `pointnet2/models/`):

  * layouts are channels-last ([B, N, C]) so the feature axis rides the TPU
    lane dimension; the reference's [B, C, N] is a CUDA-coalescing choice.
  * the sampling/grouping ops come from pctpu.ops (FPS, reference-semantics
    ball query, three-NN interpolation) vmapped over the batch.
  * shared MLPs are 1x1-conv-equivalent Dense+BN+ReLU stacks whose matmuls
    land on the MXU for the whole [B, npoint, nsample] block at once.
  * BatchNorm carries a *runtime* momentum argument so the reference's
    BN-momentum schedule (`pointnet2_ssg_cls.py:22-48,177-186`) works under
    jit without rebuilding modules.

Layer specs match the reference exactly:
  SSG cls:  `pointnet2_ssg_cls.py:63-98`; MSG cls: `pointnet2_msg_cls.py:11-45`
  SSG sem:  `pointnet2_ssg_sem.py:12-63`;  MSG sem: `pointnet2_msg_sem.py:12-75`
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pctpu.ops.ball_query import ball_query
from pctpu.ops.fps import fps_batched
from pctpu.ops.gather import gather_points, group_points
from pctpu.ops.interpolate import (interpolation_weights, three_nn)
from pctpu.ops.morton import morton_codes


def morton_sort_packed(pc: jax.Array) -> jax.Array:
    """Sort a [B,N,C>=3] cloud by Morton code of its xyz — via multi-operand
    lax.sort (payload rides the sorting network; no gather, no backward
    scatter). The entry point of the gather-free 'window' grouping path."""
    codes = morton_codes(pc[..., :3])
    operands = (codes,) + tuple(pc[..., c] for c in range(pc.shape[-1]))
    sorted_ops = jax.lax.sort(operands, dimension=-1, num_keys=1)
    return jnp.stack(sorted_ops[1:], axis=-1)


def strided_windows(x: jax.Array, npoint: int, nsample: int) -> jax.Array:
    """[B,N,C] (Morton-sorted) -> [B,npoint,nsample,C] of overlapping
    contiguous windows: window[i, o] = x[i*stride + o] with stride =
    N/npoint (wrap at the end) — the TPU-native replacement for
    gather-based grouping, built from static reshapes/rolls only.
    """
    b, n, c = x.shape
    stride = n // npoint
    if nsample <= stride:
        return x.reshape(b, npoint, stride, c)[:, :, :nsample, :]
    # logarithmic doubling: window width doubles per step via
    # concat(w, roll(w)) — O(log(nsample/stride)) tensors, each at most
    # output-sized (a per-offset stack pads singleton dims 100x and OOMs)
    w = x.reshape(b, npoint, stride, c)
    shift = 1
    while w.shape[2] < nsample:
        w = jnp.concatenate([w, jnp.roll(w, -shift, axis=1)], axis=2)
        shift *= 2
    return w[:, :, :nsample, :]


class RuntimeBN(nn.Module):
    """BatchNorm with torch-convention runtime momentum.

    running <- (1 - momentum) * running + momentum * batch   (torch semantics,
    so the reference's schedule values apply verbatim: start 0.5, x0.5 every
    `bn_decay_step` epochs, floor 0.01).
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool, momentum: jax.Array | float = 0.1):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (c,))
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (c,))
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class FoldedDenseBNRelu(nn.Module):
    """Dense + BatchNorm(train) + ReLU as ONE matmul — the moment fold.

    The naive chain materializes the pre-BN activation tensor and walks
    it ~3 more times (stat reduce, normalize, relu) — at window-SA scale
    that's hundreds of MB of pure VPU/HBM traffic per layer and the
    measured train-step bottleneck (README roofline). But every BN batch
    statistic of y = xW is computable from INPUT moments:

        mu_y  = mu_x W                (exact)
        var_y = diag(W^T Cov(x) W),   Cov = E[xx^T] - mu_x mu_x^T

    so the whole layer collapses to relu(x @ (W k s) + (beta - mu_y k s))
    with k = rsqrt(var_y + eps): one bf16 MXU matmul whose epilogue XLA
    fuses, plus an [Cin,N]x[N,Cin] moment matmul over CENTERED rows (Cov
    from uncentered E[xx^T] - mu mu^T cancels catastrophically in bf16).
    The pre-BN tensor never exists; the backward differentiates through
    the fold automatically (true BN gradients also flow through batch
    statistics). Matches `RuntimeBN` semantics: biased variance,
    torch-convention runtime momentum on the running stats
    (`pointnet2_modules.py:9-19` + `pytorch_utils.BatchNorm2d`).

    STATUS — opt-in, default OFF (`SharedMLP(fold_bn=True)` to enable):
    measured on v5e at the bench shapes the fold is a net LOSS (cls-ssg
    window 20 -> 39-46 ms/step; semseg 8.9 -> 16-21): the f32
    upcast+centering copies of the million-row activation tensor plus
    the moment matmul's backward (all doubled again by the WindowScale
    remat) cost more than the ~2 BN/relu VPU traversals they remove, and
    ghost-batch strided subsampling (stat_stride>1) makes it worse still
    (strided million-row slices lower poorly, 87 ms). Kept as a tested,
    semantics-equivalent building block for inference folding and for
    architectures without remat; the README roofline section carries the
    full measurement story."""
    features: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    stat_stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool, momentum: jax.Array | float = 0.1):
        cin, cout = x.shape[-1], self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (cin, cout))
        scale = self.param("scale", nn.initializers.ones, (cout,))
        bias = self.param("bias", nn.initializers.zeros, (cout,))
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (cout,))
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (cout,))
        if train:
            rows = x.reshape(-1, cin)
            if self.stat_stride > 1 and rows.shape[0] >= 64 * self.stat_stride:
                # ghost-batch statistics: a strided row subsample is an
                # unbiased mean/cov estimator at 1/stride the moment cost
                # and, crucially, 1/stride the f32 upcast+centering HBM
                # traffic (the full-row f32 copies were the measured
                # regression)
                rows = rows[::self.stat_stride]
            rows = rows.astype(jnp.float32)
            n = jnp.float32(rows.shape[0])
            mu_x = jnp.mean(rows, axis=0)
            # center BEFORE the moment matmul: Cov(x) = E[cc^T] directly,
            # so the fast default-precision MXU pass suffices (uncentered
            # E[xx^T] - mu mu^T loses low-variance channels to
            # cancellation and needs 6-pass HIGHEST — measured 2x step
            # regression); one cheap traversal of x buys a single-pass
            # [Cin,N]x[N,Cin]
            cen = rows - mu_x
            cov = jax.lax.dot_general(
                cen, cen, (((0,), (0,)), ((), ()))) / n
            mu_y = mu_x @ kernel
            var_y = jnp.maximum(
                jnp.sum(kernel * (cov @ kernel), axis=0), 0.0)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mu_y
                ra_var.value = (1.0 - m) * ra_var.value + m * var_y
        else:
            mu_y, var_y = ra_mean.value, ra_var.value
        k = jax.lax.rsqrt(var_y + self.epsilon) * scale
        weff = (kernel * k[None, :]).astype(self.dtype)
        beff = (bias - mu_y * k).astype(self.dtype)
        return nn.relu(x.astype(self.dtype) @ weff + beff)


class SharedMLP(nn.Module):
    """The reference's build_shared_mlp (`pointnet2_modules.py:9-19`):
    per-point Dense (1x1 conv) + BN + ReLU per layer.

    dtype: computation dtype for the matmuls (bfloat16 doubles MXU
    throughput; parameters and BN statistics stay float32).
    fold_bn: collapse each Dense+BN+ReLU into one folded matmul
    (`FoldedDenseBNRelu`); fold_bn=False keeps the unfolded chain
    (explicit Dense + RuntimeBN) for debugging/parity checks."""
    channels: Sequence[int]
    bn: bool = True
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum=0.1):
        for c in self.channels:
            if self.bn and self.fold_bn:
                x = FoldedDenseBNRelu(c, dtype=self.dtype)(
                    x, train, bn_momentum)
                continue
            x = nn.Dense(c, use_bias=not self.bn, dtype=self.dtype)(x)
            if self.bn:
                # BN stays f32; casting its output back to bf16 measured
                # step-time NEUTRAL (r5: 20.7/8.8 vs 20.0/8.9 ms — XLA
                # already fuses the f32 intermediate), so keep f32
                # inter-layer precision
                x = RuntimeBN()(x.astype(jnp.float32), train, bn_momentum)
            x = nn.relu(x)
        return x.astype(jnp.float32)


class SetAbstraction(nn.Module):
    """SA module (single or multi-scale grouping).

    npoint=None -> GroupAll (global abstraction), matching
    `_PointnetSAModuleBase.forward` + `GroupAll` semantics.
    mlps channels EXCLUDE the input dim (the torch spec's leading entry);
    use_xyz adds relative xyz to each scale's input, as in the reference.

    grouping:
      'ball'   — reference semantics: FPS centers + ball query + gathers.
      'window' — TPU-native gather-free path: inputs must be Morton-sorted;
                 centers are central-block centroids and each center's
                 neighbor set is a contiguous strided window, masked by the
                 scale radius. Grouping/backward are pure reshapes (XLA TPU
                 gathers/scatter-adds run at ~1e8 elem/s and dominate the
                 train step otherwise).
    """
    npoint: Optional[int]
    radii: Sequence[Optional[float]]
    nsamples: Sequence[Optional[int]]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    grouping: str = "ball"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, train: bool, bn_momentum=0.1):
        """xyz [B,N,3]; features [B,N,C] or None ->
        (new_xyz [B,npoint,3] or None, new_features [B,npoint,sum(C_out)])."""
        if self.npoint is None:
            return self._group_all(xyz, features, train, bn_momentum)
        if self.grouping == "window":
            return self._window(xyz, features, train, bn_momentum)
        return self._ball(xyz, features, train, bn_momentum)

    def _group_all(self, xyz, features, train, bn_momentum):
        grouped_xyz = xyz[:, None, :, :]
        if features is not None:
            gf = features[:, None, :, :]
            g = (jnp.concatenate([grouped_xyz, gf], axis=-1)
                 if self.use_xyz else gf)
        else:
            g = grouped_xyz
        h = SharedMLP(self.mlps[0], dtype=self.dtype)(g, train, bn_momentum)
        return None, jnp.max(h, axis=2)

    def _ball(self, xyz, features, train, bn_momentum):
        # XLA gather, measured FASTER than the VMEM Pallas row-copy kernel
        # for these table shapes (cls-ssg bf16 step: 88 ms XLA vs 122 ms
        # pallas_gather on v5e) — the sequential per-row loop loses to
        # XLA's pipelined gather; ops.pallas_gather remains available for
        # latency-bound small-table cases
        _group = group_points

        # backend='auto': single-kernel Pallas greedy loop on TPU (13 ms
        # -> ~1 ms at SA1 scale), bit-identical XLA fori_loop elsewhere
        centers_idx = fps_batched(xyz, self.npoint)
        new_xyz = gather_points(xyz, centers_idx)
        on_tpu = jax.default_backend() == "tpu"
        packed = (xyz if features is None
                  else jnp.concatenate([xyz, features], axis=-1))
        cp8 = ((packed.shape[-1] + 7) // 8) * 8
        outs = []
        for i, mlp_spec in enumerate(self.mlps):
            radius, nsample = self.radii[i], self.nsamples[i]
            # fused Pallas ball-query+group (no top_k, no HBM gather) when
            # its per-tile output block fits VMEM comfortably; exact
            # reference semantics either way
            fused_ok = (on_tpu and nsample % 8 == 0
                        and nsample * cp8 * 128 * 4 <= 6 * 2**20)
            if fused_ok:
                from pctpu.ops.pallas_ballgroup import (
                    ball_group_pallas_batched)
                g = ball_group_pallas_batched(new_xyz, packed,
                                              radius, nsample)
                if not self.use_xyz and features is not None:
                    g = g[..., 3:]
            else:
                idx, _ = jax.vmap(
                    lambda c, p: ball_query(c, p, radius, nsample)
                )(new_xyz, xyz)
                grouped_xyz = _group(xyz, idx) - new_xyz[:, :, None, :]
                if features is not None:
                    grouped_feats = _group(features, idx)
                    g = (jnp.concatenate([grouped_xyz, grouped_feats],
                                         axis=-1)
                         if self.use_xyz else grouped_feats)
                else:
                    g = grouped_xyz
            # h: [B, npoint, nsample, C]
            h = SharedMLP(mlp_spec, dtype=self.dtype)(g, train, bn_momentum)
            outs.append(jnp.max(h, axis=2))                 # max over nsample
        return new_xyz, jnp.concatenate(outs, axis=-1)

    def _window(self, xyz, features, train, bn_momentum):
        b, n, _ = xyz.shape
        if n < self.npoint:
            raise ValueError(
                f"window grouping needs N >= npoint (got N={n}, "
                f"npoint={self.npoint})")
        stride = n // self.npoint
        # centers = centroid of each stride block (Morton-local)
        new_xyz = jnp.mean(xyz.reshape(b, self.npoint, stride, 3), axis=2)
        packed = (xyz if features is None
                  else jnp.concatenate([xyz, features], axis=-1))
        has_features = features is not None
        outs = []
        # remat: the [B,npoint,nsample,C] window tensor and MLP activations
        # are recomputed in the backward pass from the compact [B,N,C] input
        # — without this, MSG-scale windows (nsample >> stride) exceed HBM
        Scale = nn.remat(WindowScale, static_argnums=(3, 5))
        for i, mlp_spec in enumerate(self.mlps):
            pooled = Scale(self.npoint, self.nsamples[i], self.radii[i],
                           tuple(mlp_spec), self.use_xyz, self.dtype)(
                packed, new_xyz, train, bn_momentum, has_features)
            outs.append(pooled)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class WindowScale(nn.Module):
    """One window-grouping scale: windows + rel-xyz + MLP + masked max."""
    npoint: int
    nsample: int
    radius: Optional[float]
    mlp: Sequence[int]
    use_xyz: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, packed, new_xyz, train: bool, bn_momentum,
                 has_features: bool):
        win = strided_windows(packed, self.npoint, self.nsample)
        rel = win[..., :3] - new_xyz[:, :, None, :]
        if has_features:
            g = (jnp.concatenate([rel, win[..., 3:]], axis=-1)
                 if self.use_xyz else win[..., 3:])
        else:
            g = rel
        h = SharedMLP(self.mlp, dtype=self.dtype)(g, train, bn_momentum)
        if self.radius is not None:
            d2 = jnp.sum(rel * rel, axis=-1)
            inside = d2 < self.radius * self.radius      # [B,np,ns]
            h = jnp.where(inside[..., None], h, -jnp.inf)
            pooled = jnp.max(h, axis=2)
            any_in = jnp.any(inside, axis=2)[..., None]
            pooled = jnp.where(any_in, pooled, 0.0)
        else:
            pooled = jnp.max(h, axis=2)
        return pooled


class FeaturePropagation(nn.Module):
    """FP module: 3-NN inverse-distance interpolation + skip concat + MLP
    (`pointnet2_modules.py:149-209`).

    grouping='window': the coarse level was produced by window SA, so each
    fine point's parent block is known by construction — propagation is
    block-parent unpooling (a reshape-broadcast; no three-NN, no gathers),
    the TPU-native inverse of the stride-block mapping."""
    mlp: Sequence[int]
    grouping: str = "ball"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 train: bool, bn_momentum=0.1):
        """unknown [B,n,3], known [B,m,3] or None, unknown_feats [B,n,C1] or
        None, known_feats [B,m,C2] -> [B,n,mlp[-1]]."""
        if known is None:
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1],
                              known_feats.shape[-1]))
        elif self.grouping == "window":
            b, m, c2 = known_feats.shape
            n = unknown.shape[1]
            stride = n // m
            interp = jnp.broadcast_to(
                known_feats[:, :, None, :], (b, m, stride, c2)
            ).reshape(b, n, c2)
        else:
            d2, idx = jax.vmap(lambda u, k: three_nn(u, k))(unknown, known)
            w = interpolation_weights(d2)
            gathered = group_points(known_feats, idx)         # [B,n,3,C2]
            interp = jnp.sum(gathered * w[..., None], axis=-2)
        x = (jnp.concatenate([interp, unknown_feats], axis=-1)
             if unknown_feats is not None else interp)
        return SharedMLP(self.mlp, dtype=self.dtype)(x, train, bn_momentum)


def split_pointcloud(pc):
    """[B,N,3+C] -> (xyz [B,N,3], features [B,N,C] or None) — the reference's
    `_break_up_pc` (`pointnet2_ssg_cls.py:100-104`), channels-last."""
    xyz = pc[..., :3]
    features = pc[..., 3:] if pc.shape[-1] > 3 else None
    return xyz, features


class PointNet2ClsSSG(nn.Module):
    """Single-scale-grouping classifier (`pointnet2_ssg_cls.py:63-98`)."""
    num_classes: int = 40
    use_xyz: bool = True
    grouping: str = "ball"   # 'window' = gather-free TPU fast path
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pc, train: bool = False, bn_momentum=0.1):
        if self.grouping == "window":
            pc = morton_sort_packed(pc)
        xyz, features = split_pointcloud(pc)
        sa1 = SetAbstraction(512, [0.2], [64], [[64, 64, 128]],
                             use_xyz=self.use_xyz, grouping=self.grouping,
                             dtype=self.dtype)
        sa2 = SetAbstraction(128, [0.4], [64], [[128, 128, 256]],
                             use_xyz=self.use_xyz, grouping=self.grouping,
                             dtype=self.dtype)
        sa3 = SetAbstraction(None, [None], [None], [[256, 512, 1024]],
                             use_xyz=self.use_xyz, dtype=self.dtype)
        xyz, features = sa1(xyz, features, train, bn_momentum)
        xyz, features = sa2(xyz, features, train, bn_momentum)
        _, features = sa3(xyz, features, train, bn_momentum)
        x = features[:, 0, :]                                  # [B,1024]
        x = nn.Dense(512, use_bias=False, dtype=self.dtype)(x)
        x = RuntimeBN()(x.astype(jnp.float32), train, bn_momentum)
        x = nn.relu(x)
        x = nn.Dense(256, use_bias=False, dtype=self.dtype)(x)
        x = RuntimeBN()(x.astype(jnp.float32), train, bn_momentum)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)


class PointNet2ClsMSG(nn.Module):
    """Multi-scale-grouping classifier (`pointnet2_msg_cls.py:11-45`)."""
    num_classes: int = 40
    use_xyz: bool = True
    grouping: str = "ball"   # 'window' = gather-free TPU fast path
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pc, train: bool = False, bn_momentum=0.1):
        if self.grouping == "window":
            pc = morton_sort_packed(pc)
        xyz, features = split_pointcloud(pc)
        sa1 = SetAbstraction(
            512, [0.1, 0.2, 0.4], [16, 32, 128],
            [[32, 32, 64], [64, 64, 128], [64, 96, 128]],
            use_xyz=self.use_xyz, grouping=self.grouping, dtype=self.dtype)
        sa2 = SetAbstraction(
            128, [0.2, 0.4, 0.8], [32, 64, 128],
            [[64, 64, 128], [128, 128, 256], [128, 128, 256]],
            use_xyz=self.use_xyz, grouping=self.grouping, dtype=self.dtype)
        sa3 = SetAbstraction(None, [None], [None], [[256, 512, 1024]],
                             use_xyz=self.use_xyz, dtype=self.dtype)
        xyz, features = sa1(xyz, features, train, bn_momentum)
        xyz, features = sa2(xyz, features, train, bn_momentum)
        _, features = sa3(xyz, features, train, bn_momentum)
        x = features[:, 0, :]
        x = nn.Dense(512, use_bias=False, dtype=self.dtype)(x)
        x = RuntimeBN()(x.astype(jnp.float32), train, bn_momentum)
        x = nn.relu(x)
        x = nn.Dense(256, use_bias=False, dtype=self.dtype)(x)
        x = RuntimeBN()(x.astype(jnp.float32), train, bn_momentum)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)


class PointNet2SemSegSSG(nn.Module):
    """U-Net-style semantic segmentation, SSG (`pointnet2_ssg_sem.py:12-94`).

    grouping='window': gather-free end-to-end; NOTE inputs must then be
    Morton-sorted together with their labels (use morton_sort_packed on
    [pc | labels]) — logits come back in sorted order."""
    num_classes: int = 13
    use_xyz: bool = True
    grouping: str = "ball"

    @nn.compact
    def __call__(self, pc, train: bool = False, bn_momentum=0.1):
        xyz, features = split_pointcloud(pc)
        g = self.grouping
        sas = [
            SetAbstraction(1024, [0.1], [32], [[32, 32, 64]], self.use_xyz,
                           grouping=g),
            SetAbstraction(256, [0.2], [32], [[64, 64, 128]], self.use_xyz,
                           grouping=g),
            SetAbstraction(64, [0.4], [32], [[128, 128, 256]], self.use_xyz,
                           grouping=g),
            SetAbstraction(16, [0.8], [32], [[256, 256, 512]], self.use_xyz,
                           grouping=g),
        ]
        fps_ = [
            FeaturePropagation([128, 128, 128], grouping=g),
            FeaturePropagation([256, 128], grouping=g),
            FeaturePropagation([256, 256], grouping=g),
            FeaturePropagation([256, 256], grouping=g),
        ]
        l_xyz, l_feats = [xyz], [features]
        for sa in sas:
            nx, nf = sa(l_xyz[-1], l_feats[-1], train, bn_momentum)
            l_xyz.append(nx)
            l_feats.append(nf)
        for i in range(-1, -len(fps_) - 1, -1):
            l_feats[i - 1] = fps_[i](
                l_xyz[i - 1], l_xyz[i], l_feats[i - 1], l_feats[i],
                train, bn_momentum)
        x = l_feats[0]
        x = nn.Dense(128, use_bias=False)(x)
        x = RuntimeBN()(x, train, bn_momentum)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)          # [B,N,num_classes]


class PointNet2SemSegMSG(nn.Module):
    """U-Net-style semantic segmentation, MSG (`pointnet2_msg_sem.py:12-75`).
    See PointNet2SemSegSSG for grouping='window' notes."""
    num_classes: int = 13
    use_xyz: bool = True
    grouping: str = "ball"

    @nn.compact
    def __call__(self, pc, train: bool = False, bn_momentum=0.1):
        xyz, features = split_pointcloud(pc)
        g = self.grouping
        sas = [
            SetAbstraction(1024, [0.05, 0.1], [16, 32],
                           [[16, 16, 32], [32, 32, 64]], self.use_xyz,
                           grouping=g),
            SetAbstraction(256, [0.1, 0.2], [16, 32],
                           [[64, 64, 128], [64, 96, 128]], self.use_xyz,
                           grouping=g),
            SetAbstraction(64, [0.2, 0.4], [16, 32],
                           [[128, 196, 256], [128, 196, 256]], self.use_xyz,
                           grouping=g),
            SetAbstraction(16, [0.4, 0.8], [16, 32],
                           [[256, 256, 512], [256, 384, 512]], self.use_xyz,
                           grouping=g),
        ]
        fps_ = [
            FeaturePropagation([128, 128], grouping=g),
            FeaturePropagation([256, 256], grouping=g),
            FeaturePropagation([512, 512], grouping=g),
            FeaturePropagation([512, 512], grouping=g),
        ]
        l_xyz, l_feats = [xyz], [features]
        for sa in sas:
            nx, nf = sa(l_xyz[-1], l_feats[-1], train, bn_momentum)
            l_xyz.append(nx)
            l_feats.append(nf)
        for i in range(-1, -len(fps_) - 1, -1):
            l_feats[i - 1] = fps_[i](
                l_xyz[i - 1], l_xyz[i], l_feats[i - 1], l_feats[i],
                train, bn_momentum)
        x = l_feats[0]
        x = nn.Dense(128, use_bias=False)(x)
        x = RuntimeBN()(x, train, bn_momentum)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes)(x)


MODEL_REGISTRY = {
    "cls-ssg": PointNet2ClsSSG,
    "cls-msg": PointNet2ClsMSG,
    "semseg-ssg": PointNet2SemSegSSG,
    "semseg-msg": PointNet2SemSegMSG,
}
