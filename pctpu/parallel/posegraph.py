"""Pose-graph optimization (Gauss-Newton over SE(3)) — single-device and
edge-sharded multi-device.

The SLAM backend capability of BASELINE.json ("distributed pose-graph BA...
psum reductions"): poses from the pair-sweep front end (scan-to-scan ICP)
are refined jointly against relative-pose edge measurements.

Residual per edge (i, j, T_meas): r = [Log_SO3(R_err), t_err] of
T_err = T_meas^-1 . T_i^-1 . T_j. Per-edge [6,6] Jacobian blocks come from
jax.jacfwd at the tangent origin (vmapped); the normal equations assemble by
scatter-add into the dense 6M system (M = #poses; hundreds of keyframes fit
comfortably). Gauge freedom is fixed by a strong prior on pose 0. In the
sharded variant edges are partitioned across the mesh and the [6M,6M]/[6M]
normal equations are `psum`'d — the Schur-style reduction of SURVEY.md §5.7.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pctpu.core import se3
from pctpu.register.icp import _so3_exp


def so3_log(R: jax.Array) -> jax.Array:
    """[3,3] -> [3] rotation vector (Taylor-safe near identity)."""
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    small = theta < 1e-6
    scale = jnp.where(small, 0.5, theta / (2.0 * jnp.sin(
        jnp.where(small, 1.0, theta))))
    return w * scale


def _edge_residual(eps_i, eps_j, T_i, T_j, T_meas_inv):
    # RIGHT (body-frame) perturbation T . Exp(eps): the rotation tangent
    # turns about the pose's own center, so Jacobian entries stay O(1)
    # regardless of how far the trajectory drifts from the origin. (With
    # left perturbation the translation rows pick up ||t_i||-sized lever
    # arms and cond(H) blows up ~1e9 on a 256-pose drifting chain.)
    Ti = T_i @ se3.make_transform(_so3_exp(eps_i[:3]), eps_i[3:])
    Tj = T_j @ se3.make_transform(_so3_exp(eps_j[:3]), eps_j[3:])
    T_err = T_meas_inv @ se3.invert_transform(Ti) @ Tj
    return jnp.concatenate([so3_log(T_err[:3, :3]), T_err[:3, 3]])


class PoseGraphResult(NamedTuple):
    poses: jax.Array     # [M,4,4]
    final_cost: jax.Array
    iters: jax.Array


def _edge_terms(poses, edges_i, edges_j, T_meas_inv, weights,
                robust_delta=None, robust_kernel="geman"):
    """Per-edge residuals + Jacobian blocks, vmapped. Returns
    (r [E,6], Ji [E,6,6], Jj [E,6,6]), each scaled by sqrt(w_eff).

    robust_delta enables an M-estimator via IRLS (weights refresh every
    GN iteration), so bad loop closures cannot drag the trajectory:
      'huber' — w = min(1, delta/||r||): bounded CONSTANT influence;
        good for moderate outliers, but a gross (meters-wrong) closure
        still pulls with strength ~delta.
      'geman' (default) — Geman-McClure w = (1 + ||r||^2/delta^2)^-2:
        REDESCENDING influence -> 0 for gross outliers (the standard
        robust-SLAM choice, cf. DCS/switchable constraints)."""
    zero = jnp.zeros((6,), poses.dtype)

    def one(i, j, Tmi, w):
        f_i = lambda e: _edge_residual(e, zero, poses[i], poses[j], Tmi)
        f_j = lambda e: _edge_residual(zero, e, poses[i], poses[j], Tmi)
        r = f_i(zero)
        Ji = jax.jacfwd(f_i)(zero)
        Jj = jax.jacfwd(f_j)(zero)
        if robust_delta is not None:
            rn2 = jnp.sum(r * r)
            d2 = jnp.float32(robust_delta) ** 2
            if robust_kernel == "huber":
                w = w * jnp.minimum(
                    1.0, jnp.float32(robust_delta)
                    / jnp.maximum(jnp.sqrt(rn2), 1e-12))
            else:  # geman-mcclure
                w = w / (1.0 + rn2 / d2) ** 2
        sw = jnp.sqrt(w)
        return r * sw, Ji * sw, Jj * sw

    return jax.vmap(one)(edges_i, edges_j, T_meas_inv, weights)


def _assemble(m, edges_i, edges_j, r, Ji, Jj):
    """Scatter-add the normal equations: H [6m,6m], b [6m]."""
    H = jnp.zeros((6 * m, 6 * m), jnp.float32)
    b = jnp.zeros((6 * m,), jnp.float32)

    JiTJi = jnp.einsum("eab,eac->ebc", Ji, Ji)
    JjTJj = jnp.einsum("eab,eac->ebc", Jj, Jj)
    JiTJj = jnp.einsum("eab,eac->ebc", Ji, Jj)
    bi = -jnp.einsum("eab,ea->eb", Ji, r)
    bj = -jnp.einsum("eab,ea->eb", Jj, r)

    def block_idx(e_idx):
        base = e_idx[:, None] * 6 + jnp.arange(6)[None, :]  # [E,6]
        return base

    ri = block_idx(edges_i)
    rj = block_idx(edges_j)
    # H[i,i] += JiTJi etc. via flat scatter
    def add_blocks(H, rows, cols, vals):
        rr = rows[:, :, None] * (6 * m) + cols[:, None, :]
        return H.reshape(-1).at[rr.reshape(-1)].add(
            vals.reshape(-1)).reshape(6 * m, 6 * m)

    H = add_blocks(H, ri, ri, JiTJi)
    H = add_blocks(H, rj, rj, JjTJj)
    H = add_blocks(H, ri, rj, JiTJj)
    H = add_blocks(H, rj, ri, jnp.swapaxes(JiTJj, 1, 2))
    b = b.at[ri.reshape(-1)].add(bi.reshape(-1))
    b = b.at[rj.reshape(-1)].add(bj.reshape(-1))
    return H, b


@partial(jax.jit, static_argnames=("iters", "robust_delta",
                                   "robust_kernel", "robust_warmup"))
def optimize_pose_graph(poses: jax.Array, edges_i: jax.Array,
                        edges_j: jax.Array, T_meas: jax.Array,
                        weights: Optional[jax.Array] = None,
                        iters: int = 10, damping: float = 1e-6,
                        gauge_weight: float = 1e6,
                        robust_delta: Optional[float] = None,
                        robust_kernel: str = "geman",
                        robust_warmup: int = 0
                        ) -> PoseGraphResult:
    """poses [M,4,4]; edges (i[E], j[E], T_meas [E,4,4]) with T_meas ~
    T_i^-1 T_j. Returns optimized poses (pose 0 pinned). robust_delta
    enables an IRLS robust kernel (see `_edge_terms`).

    robust_warmup > 0 enables graduated non-convexity (GNC): the robust
    scale starts at delta * 2^warmup and halves each GN iteration until
    it reaches delta. Without it, a redescending kernel (Geman-McClure)
    evaluated at the INITIAL residuals crushes exactly the loop-closure
    edges the graph exists to honor — a closure that contradicts ~1 m of
    accumulated drift starts with ||r|| ~ 1 >> delta and gets weight
    (1 + r^2/d^2)^-2 ~ 0.04, so the loop never closes (r5 bench
    finding: ATE 0.615 raw -> 0.626 'optimized')."""
    m = poses.shape[0]
    if weights is None:
        weights = jnp.ones(edges_i.shape, jnp.float32)

    # exact-f32 matmuls throughout: TPU's default bf16 MXU passes corrupt
    # pose translations / Jacobian products by ~0.4% relative, which on a
    # drifting chain is decimeters of systematic error (r4 finding)
    with jax.default_matmul_precision("highest"):
        T_meas_inv = jax.vmap(se3.invert_transform)(T_meas)

        def body(k, carry):
            poses, cost = carry
            delta_k = None if robust_delta is None else (
                jnp.float32(robust_delta) * jnp.exp2(
                    jnp.maximum(0.0, robust_warmup - k).astype(jnp.float32)))
            r, Ji, Jj = _edge_terms(poses, edges_i, edges_j, T_meas_inv,
                                    weights, delta_k, robust_kernel)
            H, b = _assemble(m, edges_i, edges_j, r, Ji, Jj)
            # gauge prior on pose 0 + Levenberg damping
            H = H.at[jnp.arange(6), jnp.arange(6)].add(gauge_weight)
            H = H + damping * jnp.eye(6 * m)
            dx = jnp.linalg.solve(H, b).reshape(m, 6)
            new_poses = jax.vmap(
                lambda d, T: T @ se3.make_transform(_so3_exp(d[:3]), d[3:])
            )(dx, poses)
            new_cost = jnp.sum(r * r)
            return new_poses, new_cost

        poses, cost = jax.lax.fori_loop(
            0, iters, body, (poses.astype(jnp.float32), jnp.float32(0.0)))
    return PoseGraphResult(poses, cost, jnp.int32(iters))


# -- block-sparse backend (scales past the dense 6Mx6M solve) ---------------
#
# The dense path above materializes H [6M,6M] and runs an O((6M)^3) solve —
# fine for hundreds of keyframes, hopeless beyond. The sparse path keeps H
# in its natural pose-block structure (diagonal blocks D [M,6,6], one
# coupling block per edge [E,6,6]) and solves the normal equations with
# preconditioned conjugate gradient under a block-Jacobi preconditioner
# (the keyframe-block reduction of BASELINE.json's "Schur-complement over
# keyframe blocks" backend, realized as its standard iterative form).
# Cost per GN step: O(E*36) per matvec * cg_iters, memory O(M+E) blocks —
# vs O(M^2) memory / O(M^3) solve dense. Edges shard across the mesh; each
# CG matvec psums a [M,6] vector, not a [6M,6M] matrix.


def _pose_blocks(m, edges_i, edges_j, r, Ji, Jj, damping):
    """Block-structured normal equations: D [M,6,6] diagonal blocks,
    Bij [E,6,6] coupling blocks (H[i,j] = Bij, H[j,i] = Bij^T), b [M,6].
    Gauge is fixed by ELIMINATION (pose-0 block projected out in the solve),
    not by a huge prior — a 1e6 prior wrecks the CG conditioning in f32."""
    JiTJi = jnp.einsum("eab,eac->ebc", Ji, Ji)
    JjTJj = jnp.einsum("eab,eac->ebc", Jj, Jj)
    Bij = jnp.einsum("eab,eac->ebc", Ji, Jj)
    D = jnp.zeros((m, 6, 6), Ji.dtype)
    D = D.at[edges_i].add(JiTJi)
    D = D.at[edges_j].add(JjTJj)
    eye6 = jnp.eye(6, dtype=Ji.dtype)
    D = D + damping * eye6[None]
    b = jnp.zeros((m, 6), Ji.dtype)
    b = b.at[edges_i].add(-jnp.einsum("eab,ea->eb", Ji, r))
    b = b.at[edges_j].add(-jnp.einsum("eab,ea->eb", Jj, r))
    return D, Bij, b


def _project0(v):
    """Zero the pose-0 block: restrict to the gauge-fixed subspace."""
    return v.at[0].set(0.0)


def _bs_matvec(D, edges_i, edges_j, Bij, x):
    """Block-sparse H @ x: x [M,6] -> [M,6]."""
    y = jnp.einsum("mab,mb->ma", D, x)
    y = y.at[edges_i].add(jnp.einsum("eab,eb->ea", Bij, x[edges_j]))
    y = y.at[edges_j].add(jnp.einsum("eba,eb->ea", Bij, x[edges_i]))
    return y


def _pcg(matvec, Minv, b, cg_iters: int, tol: float = 1e-8):
    """Conjugate gradient with block preconditioner Minv [M,6,6], restricted
    to the gauge-fixed subspace (pose-0 block pinned to zero)."""
    def apply_M(v):
        return _project0(jnp.einsum("mab,mb->ma", Minv, v))

    def apply_A(v):
        return _project0(matvec(_project0(v)))

    b = _project0(b)
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = apply_M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    bnorm2 = jnp.maximum(jnp.sum(b * b), 1e-30)

    def cond(state):
        _, r, _, _, k = state
        return (k < cg_iters) & (jnp.sum(r * r) > tol * bnorm2)

    def body(state):
        x, r, p, rz, k = state
        Ap = apply_A(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, p, rz_new, k + 1

    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, jnp.int32(0)))
    return x


def _pcg_refined(matvec, Minv, b, cg_iters: int, refine: int = 2):
    """f32 CG stalls at a roundoff floor on ill-conditioned chains;
    iterative refinement (re-solve against the TRUE residual) recovers it."""
    x = _pcg(matvec, Minv, b, cg_iters)
    for _ in range(refine):
        r = _project0(b) - _project0(matvec(_project0(x)))
        x = x + _pcg(matvec, Minv, r, cg_iters)
    return x


@partial(jax.jit, static_argnames=("iters", "cg_iters", "refine",
                                   "robust_delta", "robust_kernel",
                                   "robust_warmup"))
def optimize_pose_graph_sparse(poses: jax.Array, edges_i: jax.Array,
                               edges_j: jax.Array, T_meas: jax.Array,
                               weights: Optional[jax.Array] = None,
                               iters: int = 10, cg_iters: int = 100,
                               damping: float = 1e-6,
                               refine: int = 2,
                               robust_delta: Optional[float] = None,
                               robust_kernel: str = "geman",
                               robust_warmup: int = 0
                               ) -> PoseGraphResult:
    """Block-sparse Gauss-Newton: same problem as `optimize_pose_graph`,
    O(M+E) memory and O(E*cg_iters) solve — use beyond ~100 poses.
    Gauge is fixed by eliminating pose 0 (vs the dense path's 1e6 prior —
    same solution to ~1e-6, far better CG conditioning).

    dtype follows the input poses: pass float64 arrays (under
    `jax.experimental.enable_x64`, or via `optimize_pose_graph_sparse_f64`)
    for the high-precision backend solve — at real-trajectory scale
    (1000+ keyframes) f32 CG hits a cond(H)*eps roundoff floor."""
    m = poses.shape[0]
    dt = jnp.float64 if poses.dtype == jnp.float64 else jnp.float32
    if weights is None:
        weights = jnp.ones(edges_i.shape, dt)

    with jax.default_matmul_precision("highest"):   # see dense path note
        T_meas_inv = jax.vmap(se3.invert_transform)(T_meas.astype(dt))

        def body(k, carry):
            poses, cost = carry
            # GNC warmup: see optimize_pose_graph docstring
            delta_k = None if robust_delta is None else (
                jnp.float32(robust_delta) * jnp.exp2(
                    jnp.maximum(0.0, robust_warmup - k).astype(jnp.float32)))
            r, Ji, Jj = _edge_terms(poses, edges_i, edges_j, T_meas_inv,
                                    weights, delta_k, robust_kernel)
            D, Bij, b = _pose_blocks(m, edges_i, edges_j, r, Ji, Jj,
                                     damping)
            Minv = jnp.linalg.inv(D)
            dx = _pcg_refined(
                lambda x: _bs_matvec(D, edges_i, edges_j, Bij, x),
                Minv, b, cg_iters, refine=refine)
            new_poses = jax.vmap(
                lambda d, T: T @ se3.make_transform(_so3_exp(d[:3]), d[3:])
            )(dx, poses)
            return new_poses, jnp.sum(r * r)

        poses, cost = jax.lax.fori_loop(
            0, iters, body, (poses.astype(dt), jnp.asarray(0.0, dt)))
    return PoseGraphResult(poses, cost, jnp.int32(iters))


def optimize_pose_graph_sparse_f64(poses, edges_i, edges_j, T_meas,
                                   weights=None, **kw) -> PoseGraphResult:
    """f64 pose-graph backend (VERDICT r4 item 7): runs the block-sparse
    PCG solve in double precision under `jax.experimental.enable_x64`,
    returning f32 poses. The pose-graph backend is tiny (KB of state, ~ms
    of work) so precision, not throughput, binds: f32 CG's achievable
    step error is ~cond(H)*eps_f32*||x|| — decimeters at 1000-keyframe
    conditioning — while f64 floors ~1e-9 lower. On CPU hosts f64 is
    native; on TPU it is emulated but still negligible at backend scale."""
    import numpy as np
    with jax.enable_x64():
        res = optimize_pose_graph_sparse(
            jnp.asarray(np.asarray(poses), jnp.float64),
            jnp.asarray(np.asarray(edges_i)),
            jnp.asarray(np.asarray(edges_j)),
            jnp.asarray(np.asarray(T_meas), jnp.float64),
            weights=None if weights is None else jnp.asarray(
                np.asarray(weights), jnp.float64),
            **kw)
        out = np.asarray(res.poses).astype(np.float32)
        cost = float(res.final_cost)
    return PoseGraphResult(jnp.asarray(out), jnp.float32(cost), res.iters)


def make_sharded_pose_graph_step_sparse(mesh, edge_axis: str = "data",
                                        cg_iters: int = 100):
    """Edge-sharded block-sparse GN step: each device assembles blocks over
    its edge shard; the per-CG-iteration psum is a [M,6] vector (vs the
    dense variant's [6M,6M] matrix psum). Pad the edge list (weight 0) to a
    multiple of the axis size; padded edges must point at (0, 0)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    axis_size = mesh.shape[edge_axis]

    def step(poses, edges_i, edges_j, T_meas_inv, weights):
        m = poses.shape[0]
        r, Ji, Jj = _edge_terms(poses, edges_i, edges_j, T_meas_inv, weights)
        # local blocks over this device's edge shard; D/b are [M,...] partial
        # sums -> one psum each per GN step (damping scaled so the psum'd
        # total matches the single-device value)
        D, Bij, b = _pose_blocks(m, edges_i, edges_j, r, Ji, Jj,
                                 1e-6 / axis_size)
        D = jax.lax.psum(D, edge_axis)
        b = jax.lax.psum(b, edge_axis)
        Minv = jnp.linalg.inv(D)

        def matvec(x):
            # D is replicated post-psum: contribute 1/axis_size of it per
            # device so the psum restores exactly D @ x; coupling blocks are
            # edge-shard-local
            y = jnp.einsum("mab,mb->ma", D, x) / axis_size
            y = y.at[edges_i].add(jnp.einsum("eab,eb->ea", Bij, x[edges_j]))
            y = y.at[edges_j].add(jnp.einsum("eba,eb->ea", Bij, x[edges_i]))
            return jax.lax.psum(y, edge_axis)

        dx = _pcg_refined(matvec, Minv, b, cg_iters, refine=2)
        return jax.vmap(
            lambda d, T: T @ se3.make_transform(_so3_exp(d[:3]), d[3:])
        )(dx, poses)

    f = shard_map(step, mesh=mesh,
                  in_specs=(P(), P(edge_axis), P(edge_axis), P(edge_axis),
                            P(edge_axis)),
                  out_specs=P())
    return jax.jit(f)


def make_sharded_pose_graph_step(mesh, edge_axis: str = "data"):
    """Edge-sharded normal-equation accumulation: each device assembles
    H,b over its edge shard; psum combines; the solve runs replicated.
    Returns f(poses, edges_i, edges_j, T_meas_inv, weights) -> new poses.
    Pad the edge list (weight 0) to a multiple of the axis size."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def step(poses, edges_i, edges_j, T_meas_inv, weights):
        m = poses.shape[0]
        r, Ji, Jj = _edge_terms(poses, edges_i, edges_j, T_meas_inv, weights)
        H, b = _assemble(m, edges_i, edges_j, r, Ji, Jj)
        H = jax.lax.psum(H, edge_axis)
        b = jax.lax.psum(b, edge_axis)
        H = H.at[jnp.arange(6), jnp.arange(6)].add(1e6)
        H = H + 1e-6 * jnp.eye(6 * m)
        dx = jnp.linalg.solve(H, b).reshape(m, 6)
        return jax.vmap(
            lambda d, T: T @ se3.make_transform(_so3_exp(d[:3]), d[3:])
        )(dx, poses)

    f = shard_map(step, mesh=mesh,
                  in_specs=(P(), P(edge_axis), P(edge_axis), P(edge_axis),
                            P(edge_axis)),
                  out_specs=P())
    return jax.jit(f)
