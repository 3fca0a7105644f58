"""Coarse-to-fine registration pipeline: the reference's north-star workload.

End-to-end re-design of `Registration/main.py:183-222`:
  read pair -> voxel downsample (2.0 m) -> normals (r=4, nn30-equivalent) ->
  FPFH (r=10, nn100) -> mutual-NN matching + RANSAC global init ->
  point-to-point ICP refine -> (t, q_wxyz) result row.

Everything between the file reads and the result row is one jitted program
per pair; pairs batch/shard across devices via `pctpu.parallel`.
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
    ransac_hypotheses: int = 8192
    icp_dist_thresh: float = 5.0
    icp_max_iters: int = 100
    icp_query_chunk: int = 2048


class RegistrationOutput(NamedTuple):
    T: jax.Array                # src -> dst
    ransac_T: jax.Array
    ransac_fitness: jax.Array
    icp_iters: jax.Array
    icp_rmse: jax.Array
    num_matches: jax.Array


@partial(jax.jit, static_argnames=("cfg",))
def register_pair(src: PointCloud, dst: PointCloud,
                  key: Optional[jax.Array] = None,
                  cfg: RegistrationConfig = RegistrationConfig()
                  ) -> RegistrationOutput:
    """Full coarse-to-fine registration of two padded clouds."""
    if key is None:
        key = jax.random.PRNGKey(0)

    def preprocess(pc: PointCloud):
        down = voxel_downsample(pc.points, pc.mask, cfg.voxel_size)
        feats = fpfh(down.points, mask=down.mask,
                     radius=cfg.feature_radius, k_cap=cfg.feature_k_cap,
                     normal_k=cfg.normal_k)
        return down, feats

    sdown, sfeat = preprocess(src)
    ddown, dfeat = preprocess(dst)

    matches = match_features(sfeat, dfeat, src_mask=sdown.mask,
                             dst_mask=ddown.mask, mutual=True)
    src_kp = sdown.points
    dst_kp = ddown.points[matches.dst_idx]
    rr = ransac_registration(
        src_kp, dst_kp, corr_valid=matches.valid, key=key,
        dist_thresh=cfg.ransac_dist,
        num_hypotheses=cfg.ransac_hypotheses)

    icp_cfg = ICPConfig(max_iters=cfg.icp_max_iters,
                        dist_thresh=cfg.icp_dist_thresh,
                        query_chunk=cfg.icp_query_chunk)
    icp = icp_point_to_point(src.points, src.mask, dst.points, dst.mask,
                             init_T=rr.T, cfg=icp_cfg)
    return RegistrationOutput(icp.T, rr.T, rr.fitness, icp.iters, icp.rmse,
                              jnp.sum(matches.valid).astype(jnp.int32))


def result_row(idx1: int, idx2: int, T) -> tuple:
    """Format one output row like the reference (`main.py:213-218`): the
    row stores dst->src... The reference writes homo2tq of the INVERSE
    mapping convention used by evaluate_rt (P maps cloud idx2 onto idx1);
    we emit (t, q) of the given T directly — pass the appropriately
    directed transform."""
    import numpy as np
    t, q = se3.transform_to_tq(jnp.asarray(T))
    return idx1, idx2, np.asarray(t), np.asarray(q)
