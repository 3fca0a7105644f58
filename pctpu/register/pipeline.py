"""Coarse-to-fine registration pipeline: the reference's north-star workload.

End-to-end re-design of `Registration/main.py:183-222`:
  read pair -> voxel downsample (2.0 m) -> normals (r=4, nn30-equivalent) ->
  FPFH (r=10, nn100) -> mutual-NN matching + RANSAC global init ->
  point-to-point ICP refine -> (t, q_wxyz) result row.

Everything between the file reads and the result row is one jitted program
per pair — and the whole chain is vmappable: `register_pairs` runs a BATCH
of pairs through voxel->FPFH->matching->RANSAC->mega-ICP as one program
(the reference loops its 342 pairs one at a time, `main.py:190`).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pctpu.core import se3
from pctpu.core.cloud import PointCloud
from pctpu.features.fpfh import fpfh
from pctpu.features.matching import match_features
from pctpu.ops.voxel import voxel_downsample
from pctpu.register.icp import ICPConfig, icp_point_to_point
from pctpu.register.ransac import ransac_registration


@dataclasses.dataclass(frozen=True)
class RegistrationConfig:
    """Defaults = the reference pipeline's numbers (main.py:33-47,68-84)."""
    voxel_size: float = 2.0
    normal_k: int = 30              # ~ max_nn 30 at radius 2*voxel
    feature_radius: float = 10.0    # 5 * voxel_size
    feature_k_cap: int = 100        # max_nn 100
    ransac_dist: float = 4.0        # 1.5 * voxel? o3d uses voxel*1.5; ref 4.0
    # 1024 batched lottery tickets; at mutual-NN inlier ratios (>=0.25)
    # the 0.999-confidence requirement is ~450 draws (see
    # ransac_registration_adaptive), so this is ~2.3x margin; raise it
    # (or use ransac_registration_adaptive) for low-overlap data
    ransac_hypotheses: int = 1024
    # batched path: compact mutual-NN-valid correspondences to the front
    # and score/refine only the first `ransac_m_cap` (M is the 2048-site
    # capacity but matching marks only a few hundred valid rows)
    ransac_m_cap: int = 512
    icp_dist_thresh: float = 5.0
    icp_max_iters: int = 100
    icp_query_chunk: int = 2048
    # static capacity for the downsampled feature cloud: voxel_downsample
    # compacts valid voxels to the front, so slicing to a tight capacity
    # removes dead padding from every downstream stage (a 16k KITTI scan
    # at 2.0 m leaves ~1k voxels — the full-capacity FPFH was 16x dead
    # work). When the cap binds, voxels are subsampled with a UNIFORM
    # STRIDE over the lexsorted valid voxels (not a prefix slice, which
    # would drop one spatially contiguous end of the scene); telemetry:
    # RegistrationOutput.src_voxels / dst_voxels carry the pre-cap counts.
    downsample_capacity: int = 2048
    # 'mega' = whole-loop Pallas fixed-iteration kernel (TPU; ~5 ms for
    # 50 iterations on a 16k pair), 'while' = XLA while-loop with
    # convergence test (any backend), 'auto' = mega on TPU else while
    icp_backend: str = "auto"
    icp_fixed_coarse: int = 47      # mega schedule: banded-window iters
    icp_fixed_polish: int = 3       # + exact full-window polish iters
    # batched-path (register_pairs) multiscale ICP schedule: run most
    # iterations on the ALREADY-COMPUTED voxel clouds (2k pts, exact
    # windows), then a couple of EXACT refine iterations of a strided
    # full-res source subsample against the full target — Open3D-style
    # coarse-to-fine. (A banded full-res stage was tried and its cost was
    # ~90% layout prep — batched argsort + gathers — not iterations.)
    normal_radius: float = 4.0      # dense-normals radius (main.py:39-40)
    icp_voxel_iters: int = 14
    icp_refine_iters: int = 2
    refine_subsample: int = 2048
    stats_subsample: int = 1024     # src subsample for inlier/rmse stats
    # matching-site selection (BASELINE config #3: "ISS keypoints + FPFH
    # matching + RANSAC coarse-to-fine ICP"; keypoint->descriptor->match
    # chain of /root/reference/Registration/main.py:44-84 with the PCL
    # wrapper's ISS, PCLKeypoints/src/keypoints.cpp:7-62):
    #   'all' (default) = every capped voxel point is a matching site
    #   'iss'           = only ISS keypoints of the voxel cloud are
    #                     matching sites (FPFH is still computed on the
    #                     full voxel cloud so descriptors see the full
    #                     neighborhood; matching + RANSAC correspondences
    #                     are restricted to keypoint rows)
    keypoints: str = "all"
    iss_salient_radius: float = 3.0   # PCL wrapper defaults
    iss_nonmax_radius: float = 2.0
    iss_min_neighbors: int = 5
    iss_k_cap: int = 64
    # FPFH backend for the batched path: 'fused' = Pallas two-kernel FPFH
    # (features/pallas_fpfh.py — no [Q,N] HBM intermediates), 'dense' =
    # XLA chunked matmul path, 'auto' = fused on TPU else dense
    feature_backend: str = "auto"


class RegistrationOutput(NamedTuple):
    T: jax.Array                # src -> dst
    ransac_T: jax.Array
    ransac_fitness: jax.Array
    icp_iters: jax.Array
    icp_rmse: jax.Array
    num_matches: jax.Array
    src_voxels: jax.Array       # pre-cap valid-voxel count (telemetry)
    dst_voxels: jax.Array


def _cap_uniform(down: PointCloud, cap: int):
    """Slice a front-compacted voxel cloud to `cap` points. When the valid
    count exceeds the cap, stride uniformly over the valid prefix (the
    voxels are lexsorted by cell, so a stride samples the scene evenly)
    instead of taking the spatially-biased lexicographic prefix."""
    n = down.points.shape[0]
    nv = jnp.sum(down.mask).astype(jnp.int32)
    if cap >= n:
        return down, nv
    i = jnp.arange(cap, dtype=jnp.int32)
    idx = jnp.where(nv > cap, (i * nv) // cap, i)
    return PointCloud(points=down.points[idx], mask=down.mask[idx]), nv


def _iss_sites(down: PointCloud, cfg: RegistrationConfig) -> jax.Array:
    """[N] bool: ISS-keypoint matching sites of a (single) voxel cloud."""
    from pctpu.features.iss import iss_keypoints
    res = iss_keypoints(down.points, mask=down.mask,
                        salient_radius=cfg.iss_salient_radius,
                        non_max_radius=cfg.iss_nonmax_radius,
                        min_neighbors=cfg.iss_min_neighbors,
                        k_cap=cfg.iss_k_cap)
    return res.keypoint_mask & down.mask


def _front_end(src: PointCloud, dst: PointCloud, key: jax.Array,
               cfg: RegistrationConfig):
    """voxel -> FPFH -> mutual matching -> RANSAC global init. Vmappable."""

    def preprocess(pc: PointCloud):
        down = voxel_downsample(pc.points, pc.mask, cfg.voxel_size)
        down, nv = _cap_uniform(down, cfg.downsample_capacity)
        feats = fpfh(down.points, mask=down.mask,
                     radius=cfg.feature_radius, k_cap=cfg.feature_k_cap,
                     normal_k=cfg.normal_k)
        sites = down.mask if cfg.keypoints == "all" else _iss_sites(down, cfg)
        return down, feats, sites, nv

    sdown, sfeat, s_sites, s_nv = preprocess(src)
    ddown, dfeat, d_sites, d_nv = preprocess(dst)

    matches = match_features(sfeat, dfeat, src_mask=s_sites,
                             dst_mask=d_sites, mutual=True)
    src_kp = sdown.points
    dst_kp = ddown.points[matches.dst_idx]
    rr = ransac_registration(
        src_kp, dst_kp, corr_valid=matches.valid, key=key,
        dist_thresh=cfg.ransac_dist,
        num_hypotheses=cfg.ransac_hypotheses)
    return rr, jnp.sum(matches.valid).astype(jnp.int32), s_nv, d_nv


def _icp_stats(T, src: PointCloud, dst: PointCloud,
               cfg: RegistrationConfig, backend: str = "auto"):
    """One exact association pass at the final pose: inlier count + RMSE
    (the reference-parity statistics)."""
    from pctpu.ops.knn import nearest
    d2, _ = nearest(se3.apply_transform(T, src.points), dst.points,
                    dst.mask, cfg.icp_query_chunk, backend=backend)
    inl = (d2 <= jnp.float32(cfg.icp_dist_thresh) ** 2) & src.mask
    num = jnp.sum(inl).astype(jnp.int32)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d2, 0.0))
                    / jnp.maximum(num.astype(jnp.float32), 1.0))
    return num, rmse


def _refine_exact_batch(T, src: PointCloud, dst: PointCloud,
                        cfg: RegistrationConfig, backend: str = "xla"):
    """Batched exact point-to-point refine: `icp_refine_iters` iterations
    of a strided full-res source subsample against the FULL target via
    brute 1-NN + weighted Procrustes. The cheap way to move a
    voxel-converged pose the last millimeters.

    backend='mega' (TPU): both iterations run inside ONE mega-kernel
    launch (`icp.icp_refine_exact_mega_batch`) — MXU association,
    in-kernel Procrustes, no per-iteration HBM round trips.
    backend='xla': per-iteration Pallas 1-NN + XLA Procrustes (any
    device)."""
    n = src.points.shape[1]
    stride = max(1, n // cfg.refine_subsample)
    q = src.points[:, ::stride][:, :cfg.refine_subsample]
    qm = src.mask[:, ::stride][:, :cfg.refine_subsample]
    if backend == "mega":
        from pctpu.register.icp import icp_refine_exact_mega_batch
        return icp_refine_exact_mega_batch(
            q, qm, dst.points, dst.mask, T,
            iters=cfg.icp_refine_iters, dist_thresh=cfg.icp_dist_thresh)

    from pctpu.ops.gather import gather_points
    from pctpu.ops.knn import nearest
    from pctpu.register.procrustes import weighted_procrustes
    thresh2 = jnp.float32(cfg.icp_dist_thresh) ** 2

    for _ in range(cfg.icp_refine_iters):
        qt = jnp.einsum("bij,bnj->bni", T[:, :3, :3], q,
                        precision=jax.lax.Precision.HIGHEST) + T[:, None, :3, 3]
        # 1-NN backend 'auto' = the Pallas VMEM kernel on TPU: exact f32
        # AND 3.3x faster than the HIGHEST-precision XLA brute tiles at
        # these shapes (vmap of the kernel is correct and fast here — the
        # whole per-pair db is only ~200 KB of VMEM)
        d2, idx = jax.vmap(
            lambda a, d, m: nearest(a, d, m, 2048, backend="auto"))(
                qt, dst.points, dst.mask)
        w = (qm & (d2 < thresh2)).astype(jnp.float32)
        matched = gather_points(dst.points, idx)
        R, t = jax.vmap(weighted_procrustes)(qt, matched, w)
        dT = jnp.tile(jnp.eye(4, dtype=jnp.float32), (T.shape[0], 1, 1))
        dT = dT.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
        T = dT @ T
    return T


def _icp_stats_subsampled(T, src: PointCloud, dst: PointCloud,
                          cfg: RegistrationConfig):
    """Inlier fraction + RMSE at the final pose on a uniform source
    subsample (`stats_subsample` points): telemetry-grade statistics at a
    fraction of the full exact pass. `num` is scaled back to full-cloud
    counts."""
    from pctpu.ops.knn import nearest
    n = src.points.shape[0]
    stride = max(1, n // cfg.stats_subsample)
    q = src.points[::stride][:cfg.stats_subsample]
    qm = src.mask[::stride][:cfg.stats_subsample]
    d2, _ = nearest(se3.apply_transform(T, q), dst.points, dst.mask,
                    cfg.icp_query_chunk, backend="auto")
    inl = (d2 <= jnp.float32(cfg.icp_dist_thresh) ** 2) & qm
    num = jnp.sum(inl).astype(jnp.int32)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d2, 0.0))
                    / jnp.maximum(num.astype(jnp.float32), 1.0))
    return num * jnp.int32(stride), rmse


def _register_pair_impl(src: PointCloud, dst: PointCloud, key: jax.Array,
                        cfg: RegistrationConfig) -> RegistrationOutput:
    """The full coarse-to-fine chain for ONE pair."""
    rr, num_matches, s_nv, d_nv = _front_end(src, dst, key, cfg)

    backend = cfg.icp_backend
    if backend == "auto":
        backend = "mega" if jax.default_backend() == "tpu" else "while"
    if backend == "mega":
        from pctpu.register.icp import icp_fixed_iters_banded_mega
        T = icp_fixed_iters_banded_mega(
            src.points, src.mask, dst.points, dst.mask, init_T=rr.T,
            coarse_iters=cfg.icp_fixed_coarse,
            polish_iters=cfg.icp_fixed_polish,
            dist_thresh=cfg.icp_dist_thresh, block=1024,
            window_blocks=1, query_tile=1024)
        num, rmse = _icp_stats(T, src, dst, cfg)
        icp_T, icp_iters, icp_rmse = T, jnp.int32(
            cfg.icp_fixed_coarse + cfg.icp_fixed_polish), rmse
    else:
        icp_cfg = ICPConfig(max_iters=cfg.icp_max_iters,
                            dist_thresh=cfg.icp_dist_thresh,
                            query_chunk=cfg.icp_query_chunk)
        icp = icp_point_to_point(src.points, src.mask, dst.points, dst.mask,
                                 init_T=rr.T, cfg=icp_cfg)
        icp_T, icp_iters, icp_rmse = icp.T, icp.iters, icp.rmse
    return RegistrationOutput(icp_T, rr.T, rr.fitness, icp_iters, icp_rmse,
                              num_matches, s_nv, d_nv)


@partial(jax.jit, static_argnames=("cfg",))
def register_pair(src: PointCloud, dst: PointCloud,
                  key: Optional[jax.Array] = None,
                  cfg: RegistrationConfig = RegistrationConfig()
                  ) -> RegistrationOutput:
    """Full coarse-to-fine registration of two padded clouds."""
    if key is None:
        key = jax.random.PRNGKey(0)
    return _register_pair_impl(src, dst, key, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def register_pairs(src: PointCloud, dst: PointCloud,
                   keys: Optional[jax.Array] = None,
                   cfg: RegistrationConfig = RegistrationConfig()
                   ) -> RegistrationOutput:
    """Batched full pipeline: clouds with a leading pair axis [B,N,3]/[B,N].

    The entire chain (voxel downsample -> FPFH -> mutual matching -> RANSAC
    -> mega ICP) is vmapped over the pair batch — one compiled program, a
    handful of kernel launches for the whole sweep, instead of the
    reference's per-pair Python loop (`Registration/main.py:183-222`).
    """
    b = src.points.shape[0]
    if keys is None:
        keys = jax.random.split(jax.random.PRNGKey(0), b)

    # ---- batched front end: every stage batch-NATIVE, not vmapped.
    # Batched sorts/gathers/scatters under vmap are 2-3x off on TPU; the
    # batch-aware voxel filter (flat segments), the dense gather-free FPFH
    # (matmul + VPU), and matmul-heavy matching/RANSAC (vmap is fine for
    # those) recover the lost factor (r4 probe history).
    from pctpu.features.fpfh_dense import fpfh_dense
    from pctpu.ops.gather import gather_points
    from pctpu.ops.voxel import voxel_downsample_capped

    fb = cfg.feature_backend
    if fb == "auto":
        fb = "fused" if jax.default_backend() == "tpu" else "dense"
    if fb == "fused":
        from pctpu.features.pallas_fpfh import fpfh_fused
        # the capped voxel clouds are cell-lexsorted (valid prefix x-sorted
        # up to one leaf), so the exact x-band pruning applies
        _fpfh = partial(fpfh_fused, x_banded=True, x_slack=cfg.voxel_size)
    else:
        _fpfh = fpfh_dense

    # (measured r5: fusing src+dst preprocess into one [2B] batch is
    # slightly WORSE — the concat/split copies outweigh the saved
    # kernel launches; keep two calls)
    def preprocess(pc: PointCloud):
        down, nv = voxel_downsample_capped(pc.points, pc.mask,
                                           cfg.voxel_size,
                                           cfg.downsample_capacity)
        feats = _fpfh(down.points, mask=down.mask,
                      radius=cfg.feature_radius,
                      normal_radius=cfg.normal_radius)
        return down, feats, nv

    sdown, sfeat, s_nv = preprocess(src)
    ddown, dfeat, d_nv = preprocess(dst)
    if cfg.keypoints == "iss":
        s_sites = jax.vmap(lambda p, m: _iss_sites(
            PointCloud(points=p, mask=m), cfg))(sdown.points, sdown.mask)
        d_sites = jax.vmap(lambda p, m: _iss_sites(
            PointCloud(points=p, mask=m), cfg))(ddown.points, ddown.mask)
    else:
        s_sites, d_sites = sdown.mask, ddown.mask
    matches = jax.vmap(
        lambda a, c, ma, mb: match_features(a, c, src_mask=ma, dst_mask=mb,
                                            mutual=True))(
        sfeat, dfeat, s_sites, d_sites)
    dst_kp = gather_points(ddown.points, matches.dst_idx)
    from pctpu.register.ransac import ransac_registration_batch
    rr = ransac_registration_batch(
        sdown.points, dst_kp, matches.valid, keys,
        dist_thresh=cfg.ransac_dist,
        num_hypotheses=cfg.ransac_hypotheses,
        m_cap=cfg.ransac_m_cap)
    num_matches = jnp.sum(matches.valid, axis=1).astype(jnp.int32)

    backend = cfg.icp_backend
    if backend == "auto":
        backend = "mega" if jax.default_backend() == "tpu" else "while"
    if backend == "mega":
        # multiscale refine: `icp_voxel_iters` exact-window iterations on
        # the already-computed 2k voxel clouds via the explicitly-batched
        # mega kernel (VMEM stays at one pair's working set for any B),
        # then `icp_refine_iters` exact strided full-res refine iterations
        # (_refine_exact_batch) — no banded full-res stage (tried; its
        # cost was ~90% layout prep, not iterations)
        from pctpu.register.icp import icp_fixed_iters_banded_mega_batch
        T = icp_fixed_iters_banded_mega_batch(
            sdown.points, sdown.mask, ddown.points, ddown.mask,
            init_T=rr.T, coarse_iters=cfg.icp_voxel_iters, polish_iters=0,
            dist_thresh=cfg.icp_dist_thresh, block=2048,
            window_blocks=1, query_tile=2048)
        if cfg.icp_refine_iters > 0:
            T = _refine_exact_batch(T, src, dst, cfg, backend="mega")
        num, rmse = jax.vmap(
            lambda t, s, d: _icp_stats_subsampled(t, s, d, cfg))(
                T, src, dst)
        iters = jnp.full((b,), cfg.icp_voxel_iters + cfg.icp_refine_iters,
                         jnp.int32)
        return RegistrationOutput(T, rr.T, rr.fitness, iters, rmse,
                                  num_matches, s_nv, d_nv)

    icp_cfg = ICPConfig(max_iters=cfg.icp_max_iters,
                        dist_thresh=cfg.icp_dist_thresh,
                        query_chunk=cfg.icp_query_chunk,
                        backend="xla")
    icp = jax.vmap(lambda s, d, t: icp_point_to_point(
        s.points, s.mask, d.points, d.mask, init_T=t, cfg=icp_cfg))(
            src, dst, rr.T)
    return RegistrationOutput(icp.T, rr.T, rr.fitness, icp.iters, icp.rmse,
                              num_matches, s_nv, d_nv)


def result_row(idx1: int, idx2: int, T) -> tuple:
    """Format one output row like the reference (`main.py:213-218`): the
    row stores dst->src... The reference writes homo2tq of the INVERSE
    mapping convention used by evaluate_rt (P maps cloud idx2 onto idx1);
    we emit (t, q) of the given T directly — pass the appropriately
    directed transform."""
    import numpy as np
    t, q = se3.transform_to_tq(jnp.asarray(T))
    return idx1, idx2, np.asarray(t), np.asarray(q)
