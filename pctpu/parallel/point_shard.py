"""Point-sharded ICP: split one huge cloud's points across devices.

The sequence-parallel analogue for point clouds (SURVEY.md §5.7): source
points are sharded over the mesh's 'point' axis, the target stays replicated
(a full KITTI scan is ~1.5 MB — cheap to replicate; the *work* is the
O(N*M) association). Each device associates its source shard, computes the
five weighted Procrustes moments locally, and a `psum` combines them — the
solve is 3x3 and runs replicated. Per ICP iteration the only cross-device
traffic is the ~13-float moment vector.

    H = sum w b a^T - (sum w b)(sum w a)^T / sum w   (moment form of
    `Registration/main.py:131-141`'s centering-matrix SVD)
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pctpu.core import se3
from pctpu.ops.pairwise import chunked_min_argmin


def _local_moments(src_t, src_mask, dst, dst_mask, thresh2, query_chunk):
    d2, idx = chunked_min_argmin(src_t, dst, dst_mask, query_chunk)
    w = (src_mask & (d2 < thresh2)).astype(jnp.float32)
    b = dst[idx]
    sw = jnp.sum(w)
    sa = jnp.sum(src_t * w[:, None], axis=0)          # [3]
    sb = jnp.sum(b * w[:, None], axis=0)              # [3]
    H = jax.lax.dot_general(b * w[:, None], src_t,
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # [3,3]
    return sw, sa, sb, H


def _solve_from_moments(sw, sa, sb, H):
    swc = jnp.maximum(sw, 1e-12)
    Hc = H - jnp.outer(sb, sa) / swc
    U, _, Vt = jnp.linalg.svd(Hc)
    d = jnp.linalg.det(U @ Vt)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0], jnp.float32)).at[2, 2].set(d)
    R = U @ S @ Vt
    t = sb / swc - R @ (sa / swc)
    return R, t


def make_point_sharded_icp(mesh: Mesh, point_axis: str = "point",
                           iters: int = 30, dist_thresh: float = 5.0,
                           query_chunk: int = 2048):
    """Returns a jitted f(src, src_mask, dst, dst_mask) -> [4,4] with src
    sharded over `point_axis` and dst replicated. N must divide by the axis
    size."""
    thresh2 = jnp.float32(dist_thresh) ** 2

    def sharded_body(src, src_mask, dst, dst_mask):
        # runs per-device on its src shard
        def one_iter(_, T):
            src_t = se3.apply_transform(T, src)
            sw, sa, sb, H = _local_moments(src_t, src_mask, dst, dst_mask,
                                           thresh2, query_chunk)
            sw = jax.lax.psum(sw, point_axis)
            sa = jax.lax.psum(sa, point_axis)
            sb = jax.lax.psum(sb, point_axis)
            H = jax.lax.psum(H, point_axis)
            R, t = _solve_from_moments(sw, sa, sb, H)
            return se3.make_transform(R, t) @ T

        return jax.lax.fori_loop(0, iters, one_iter,
                                 jnp.eye(4, dtype=jnp.float32))

    f = shard_map(
        sharded_body, mesh=mesh,
        in_specs=(P(point_axis), P(point_axis), P(), P()),
        out_specs=P(),
        )
    return jax.jit(f)
