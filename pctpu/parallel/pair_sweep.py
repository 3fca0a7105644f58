"""Pair-parallel registration sweeps: shard scan pairs across the mesh.

The throughput axis of BASELINE.json ("registration pairs/sec"): the
registration dataset's 342 independent pairs (and KITTI scan pairs) are an
embarrassingly parallel batch. Each device runs the fixed-iteration ICP (all
pairs in lockstep — `icp_fixed_iters` has no data-dependent exit) on its
shard of the pair batch; there is zero cross-device traffic during the
sweep. The reference solves pairs one at a time in a Python loop
(`Registration/main.py:190`).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pctpu.register.icp import icp_fixed_iters


def batched_icp(src: jax.Array, src_mask: jax.Array,
                dst: jax.Array, dst_mask: jax.Array,
                init_T: Optional[jax.Array] = None,
                iters: int = 30, dist_thresh: float = 5.0,
                query_chunk: int = 2048, backend: str = "auto") -> jax.Array:
    """[B,N,3] x [B,M,3] -> [B,4,4]: vmapped fixed-iteration ICP."""
    b = src.shape[0]
    if init_T is None:
        init_T = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    f = partial(icp_fixed_iters, iters=iters, dist_thresh=dist_thresh,
                query_chunk=query_chunk, backend=backend)
    return jax.vmap(lambda s, sm, d, dm, t: f(s, sm, d, dm, init_T=t))(
        src, src_mask, dst, dst_mask, init_T)


def batched_icp_mega(src: jax.Array, src_mask: jax.Array,
                     dst: jax.Array, dst_mask: jax.Array,
                     coarse_iters: int = 28, polish_iters: int = 2,
                     dist_thresh: float = 5.0, block: int = 512,
                     window_blocks: int = 1, query_tile: int = 512,
                     interpret: bool = False) -> jax.Array:
    """[B,N,3] x [B,M,3] -> [B,4,4]: the whole-loop mega ICP kernel run
    over the pair batch as ONE (B, iters, ntiles)-grid Pallas launch per
    phase (`ops.pallas_icp_mega.icp_mega_batch`) — per-pair BlockSpec
    blocking keeps VMEM at a single pair's working set for any B (the
    earlier `jax.vmap` formulation OOMed VMEM past ~8 x 16k points).
    Measured 1244 pairs/s vs 305 for `batched_icp` (16 x 4096-pt KITTI
    pairs, 30 iters, all gated on the reference bound) on one v5e chip."""
    from pctpu.register.icp import icp_fixed_iters_banded_mega_batch
    return icp_fixed_iters_banded_mega_batch(
        src, src_mask, dst, dst_mask, coarse_iters=coarse_iters,
        polish_iters=polish_iters, dist_thresh=dist_thresh,
        block=block, window_blocks=window_blocks,
        query_tile=query_tile, interpret=interpret)


def make_pair_sweep(mesh: Mesh, pair_axis: str = "data",
                    iters: int = 30, dist_thresh: float = 5.0,
                    query_chunk: int = 2048, backend: str = "auto"):
    """Jitted pair-sharded sweep: batch axis of every input sharded over
    `pair_axis`; outputs sharded the same way. Call with B a multiple of the
    axis size."""
    sh = NamedSharding(mesh, P(pair_axis))

    fn = partial(batched_icp, iters=iters, dist_thresh=dist_thresh,
                 query_chunk=query_chunk, backend=backend)
    return jax.jit(
        lambda s, sm, d, dm: fn(s, sm, d, dm, None),
        in_shardings=(sh, sh, sh, sh),
        out_shardings=sh)


def make_full_pipeline_sweep(mesh: Mesh, pair_axis: str = "data", cfg=None):
    """Pair-shard the FULL registration pipeline (voxel -> FPFH ->
    mutual-NN -> RANSAC -> multiscale ICP, `register.pipeline.
    register_pairs`) over the mesh — BASELINE.json's literal north star
    ("registration pairs/s ... scaling efficiency at 1 chip / 1 host /
    N hosts"), scaling the reference's 342-pair loop
    (`Registration/main.py:183-222`).

    `shard_map` splits the pair batch across `pair_axis`; each device
    runs the identical batch-native program on its B/n_devices pairs with
    ZERO collectives (pairs are independent), so scaling is linear by
    construction and per-device VMEM stays at the single-device batch
    working set.

    Returns a jitted `sweep(src: PointCloud, dst: PointCloud, keys
    [B,2]) -> RegistrationOutput`, batch axis B a multiple of the axis
    size. Every output field is sharded over `pair_axis`.
    """
    from jax.experimental.shard_map import shard_map
    from pctpu.core.cloud import PointCloud
    from pctpu.register.pipeline import RegistrationConfig, register_pairs
    if cfg is None:
        cfg = RegistrationConfig()

    cloud_spec = PointCloud(points=P(pair_axis), mask=P(pair_axis))

    def per_device(src: PointCloud, dst: PointCloud, keys: jax.Array):
        return register_pairs(src, dst, keys=keys, cfg=cfg)

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(cloud_spec, cloud_spec, P(pair_axis)),
        out_specs=P(pair_axis), check_rep=False)
    return jax.jit(sharded)
