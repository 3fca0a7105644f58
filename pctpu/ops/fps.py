"""Furthest-point sampling.

TPU-native re-design of the reference CUDA kernel
(`pointnet2_ops/_ext-src/src/sampling_gpu.cu:69-173`): the m-step greedy loop
is inherently sequential, but each step is a full-cloud masked min+argmax that
vectorizes on the VPU. The running min-distance vector is loop-carried (XLA
keeps it on-chip); batching goes through vmap so the whole batch runs as one
fused program.

Reference semantics preserved (SURVEY.md §7 "bit-for-bit" list):
  * idx[0] = 0 unconditionally (`sampling_gpu.cu:86`)
  * points with |p|^2 <= 1e-3 are never selected (`sampling_gpu.cu:100-101`)
    — gated by `skip_near_origin` since it only makes sense for normalized
    clouds.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG = jnp.float32(-1e30)


@partial(jax.jit, static_argnames=("m", "skip_near_origin"))
def fps(points: jax.Array, m: int,
        mask: Optional[jax.Array] = None,
        skip_near_origin: bool = False) -> jax.Array:
    """points [N,3] -> idx [m] int32 of a furthest-point subset.

    Masked-out (padding) points are never selected; if the cloud has fewer
    than m valid points, selections repeat (harmless for downstream gather —
    mirrors the reference's duplicate behavior when n < m).
    """
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    eligible = jnp.ones((n,), bool) if mask is None else mask
    if skip_near_origin:
        eligible = eligible & (jnp.sum(pts * pts, axis=-1) > 1e-3)

    def body(i, carry):
        idxs, mind, last = carry
        d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
        mind = jnp.minimum(mind, d)
        score = jnp.where(eligible, mind, NEG)
        nxt = jnp.argmax(score).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return idxs, mind, nxt

    idxs = jnp.zeros((m,), jnp.int32)
    mind = jnp.full((n,), jnp.float32(1e10))
    idxs, _, _ = jax.lax.fori_loop(1, m, body, (idxs, mind, jnp.int32(0)))
    return idxs


def fps_batched(points: jax.Array, m: int,
                mask: Optional[jax.Array] = None,
                skip_near_origin: bool = False,
                backend: str = "auto") -> jax.Array:
    """[B,N,3] -> [B,m].

    backend: 'auto' picks the single-kernel Pallas loop on TPU (the XLA
    fori_loop pays ~25 us/step of scheduling overhead — 13 ms vs ~1 ms for
    B=16, N=4096, m=512 on v5e) and the XLA loop elsewhere; results are
    bit-identical (`tests/test_pallas_nn.py::test_fps_pallas_matches_xla`).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from pctpu.ops.pallas_fps import fps_pallas_batched
        return fps_pallas_batched(points, m, mask=mask,
                                  skip_near_origin=skip_near_origin)
    f = partial(fps, m=m, skip_near_origin=skip_near_origin)
    if mask is None:
        return jax.vmap(lambda p: f(p))(points)
    return jax.vmap(lambda p, mk: f(p, mask=mk))(points, mask)
