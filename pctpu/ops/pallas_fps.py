"""Pallas furthest-point sampling: the whole greedy loop in ONE kernel.

The XLA `fps` (`pctpu.ops.fps`) runs the m-step greedy loop as a
`lax.fori_loop` of tiny fused VPU programs — measured ~13 ms for
(B=16, N=4096 -> m=512) on v5e, essentially ALL per-step loop overhead
(the per-step compute is ~50k VPU ops). This kernel keeps the cloud
resident in VMEM and runs the sequential loop as a hardware loop inside a
single Pallas program, eliminating the per-step scheduling cost — the
TPU-native counterpart of the reference CUDA kernel's shared-memory
reduction loop (`sampling_gpu.cu:69-173`, SURVEY.md §2.1 item 1).

Semantics are bit-identical to `ops.fps.fps`: idx[0] = 0 unconditionally,
first-index argmax tie-breaking, masked/near-origin points never selected.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30          # python float: a jnp scalar would be captured as a
INT_BIG = 2**31 - 1  # constant by the pallas kernel tracer


def _fps_kernel(ptst_ref, elig_ref, out_ref, *, m: int):
    pts = ptst_ref[:]                                  # [3, N]
    elig = elig_ref[:]                                 # [1, N] 1.0 / 0.0
    n = pts.shape[1]
    colidx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    mcol = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def body(i, carry):
        mind, out_row, last_onehot = carry
        sel = jnp.sum(pts * last_onehot, axis=1, keepdims=True)   # [3,1]
        diff = pts - sel
        d = jnp.sum(diff * diff, axis=0, keepdims=True)           # [1,N]
        mind = jnp.minimum(mind, d)
        score = jnp.where(elig > 0, mind, NEG)
        smax = jnp.max(score)
        # first-index argmax (matches jnp.argmax tie-breaking)
        nxt = jnp.min(jnp.where(score >= smax, colidx, INT_BIG))
        out_row = jnp.where(mcol == i, nxt, out_row)
        return mind, out_row, (colidx == nxt).astype(jnp.float32)

    init = (jnp.full((1, n), jnp.float32(1e10)),
            jnp.zeros((1, m), jnp.int32),
            (colidx == 0).astype(jnp.float32))
    _, out_row, _ = jax.lax.fori_loop(1, m, body, init)
    out_ref[:] = out_row


@partial(jax.jit, static_argnames=("m", "skip_near_origin", "interpret"))
def fps_pallas(points: jax.Array, m: int,
               mask: Optional[jax.Array] = None,
               skip_near_origin: bool = False,
               interpret: bool = False) -> jax.Array:
    """points [N,3] -> idx [m] int32; same contract as `ops.fps.fps`."""
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    eligible = jnp.ones((n,), bool) if mask is None else mask
    if skip_near_origin:
        eligible = eligible & (jnp.sum(pts * pts, axis=-1) > 1e-3)

    mem = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        partial(_fps_kernel, m=m),
        in_specs=[pl.BlockSpec(memory_space=mem),
                  pl.BlockSpec(memory_space=mem)],
        out_specs=pl.BlockSpec(memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.int32),
        interpret=interpret,
    )(pts.T, eligible.astype(jnp.float32)[None, :])
    return out[0]


def _fps_kernel_batched(pts_ref, elig_ref, out_ref, *, m: int):
    """All batch rows advance together: each greedy step is [B,N] vector
    work (a vmapped single-cloud kernel would run B sequential grid
    programs AND waste 7/8 VPU sublanes on [1,N] rows)."""
    x = pts_ref[:, 0, :]                               # [B, N]
    y = pts_ref[:, 1, :]
    z = pts_ref[:, 2, :]
    elig = elig_ref[:]                                 # [B, N] 1.0 / 0.0
    b, n = x.shape
    colidx = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    mcol = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)

    def body(i, carry):
        mind, out_row, onehot = carry                  # [B,N],[B,m],[B,N]
        sx = jnp.sum(x * onehot, axis=1, keepdims=True)   # [B,1]
        sy = jnp.sum(y * onehot, axis=1, keepdims=True)
        sz = jnp.sum(z * onehot, axis=1, keepdims=True)
        d = ((x - sx) ** 2 + (y - sy) ** 2 + (z - sz) ** 2)
        mind = jnp.minimum(mind, d)
        score = jnp.where(elig > 0, mind, NEG)
        smax = jnp.max(score, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(score >= smax, colidx, INT_BIG),
                      axis=1, keepdims=True)           # [B,1] first argmax
        out_row = jnp.where(mcol == i, nxt, out_row)
        return mind, out_row, (colidx == nxt).astype(jnp.float32)

    init = (jnp.full((b, n), jnp.float32(1e10)),
            jnp.zeros((b, m), jnp.int32),
            (colidx == 0).astype(jnp.float32))
    _, out_row, _ = jax.lax.fori_loop(1, m, body, init)
    out_ref[:] = out_row


@partial(jax.jit, static_argnames=("m", "skip_near_origin", "interpret"))
def fps_pallas_batched(points: jax.Array, m: int,
                       mask: Optional[jax.Array] = None,
                       skip_near_origin: bool = False,
                       interpret: bool = False) -> jax.Array:
    """[B,N,3] -> [B,m] int32; same contract as `ops.fps.fps_batched`."""
    b, n, _ = points.shape
    pts = jnp.swapaxes(points.astype(jnp.float32), 1, 2)  # [B,3,N]
    eligible = (jnp.ones((b, n), bool) if mask is None else mask)
    if skip_near_origin:
        eligible = eligible & (jnp.sum(points.astype(jnp.float32) ** 2,
                                       axis=-1) > 1e-3)

    mem = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        partial(_fps_kernel_batched, m=m),
        in_specs=[pl.BlockSpec(memory_space=mem),
                  pl.BlockSpec(memory_space=mem)],
        out_specs=pl.BlockSpec(memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((b, m), jnp.int32),
        interpret=interpret,
    )(pts, eligible.astype(jnp.float32))
