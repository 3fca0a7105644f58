"""SE(3) / quaternion utilities (jittable).

Parity targets in the reference (re-derived, not translated):
  * rotmat -> quaternion with sign-copy branch network: `Registration/main.py:158-168`
  * homogeneous -> (t, q_wxyz): `Registration/main.py:170-174`
  * RTE/RRE pose-difference metric:
    `Registration/registration_dataset/evaluate_rt.py:21-29`

Quaternions are (w, x, y, z) throughout — the convention of the reference's
result files (`reg_result.txt` rows are `idx1,idx2,tx,ty,tz,qw,qx,qy,qz`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _copysign_ref(v, s):
    # Reference semantics (`main.py:176-180`): flip v only when v*s < 0.
    return jnp.where(v * s < 0, -v, v)


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """[...,3,3] rotation matrix -> [...,4] quaternion (w,x,y,z).

    Shepperd-style magnitude-from-diagonal + sign-from-off-diagonal, matching
    the reference's formulation (`Registration/main.py:158-168`).
    """
    m = jnp.asarray(m)
    t = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + t)) / 2
    d0, d1, d2 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + d0 - d1 - d2)) / 2
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - d0 + d1 - d2)) / 2
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - d0 - d1 + d2)) / 2
    qx = _copysign_ref(qx, m[..., 2, 1] - m[..., 1, 2])
    qy = _copysign_ref(qy, m[..., 0, 2] - m[..., 2, 0])
    qz = _copysign_ref(qz, m[..., 1, 0] - m[..., 0, 1])
    return jnp.stack([qw, qx, qy, qz], axis=-1)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """[...,4] (w,x,y,z) quaternion -> [...,3,3] rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def make_transform(R: jax.Array, t: jax.Array) -> jax.Array:
    """[...,3,3] R + [...,3] t -> [...,4,4] homogeneous transform."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), batch + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def transform_to_tq(T: jax.Array):
    """[...,4,4] -> ([...,3] t, [...,4] q_wxyz), the reference's output row
    format (`Registration/main.py:170-174`)."""
    return T[..., :3, 3], rotmat_to_quat(T[..., :3, :3])


def tq_to_transform(t: jax.Array, q_wxyz: jax.Array) -> jax.Array:
    return make_transform(quat_to_rotmat(q_wxyz), t)


def invert_transform(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -(Rt @ t[..., None])[..., 0])


def apply_transform(T: jax.Array, points: jax.Array) -> jax.Array:
    """[...,4,4] @ [...,N,3] -> [...,N,3].

    Exact-f32 matmul: TPU f32 matmuls default to bf16 MXU passes, a
    ~0.4%-relative coordinate error (centimeters at LiDAR scale) that
    silently degrades every downstream association/residual (r4 finding).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.matmul(points, jnp.swapaxes(R, -1, -2),
                      precision=jax.lax.Precision.HIGHEST) + t[..., None, :]


def rotmat_to_euler_xyz(m: jax.Array) -> jax.Array:
    """[...,3,3] -> [...,3] extrinsic-xyz Euler angles (radians).

    Matches scipy `Rotation.as_euler('xyz')` (lowercase = extrinsic), which the
    reference evaluator uses for RRE (`evaluate_rt.py:27`). For R = Rz@Ry@Rx:
      sy = -m[2,0];  x = atan2(m[2,1], m[2,2]);  z = atan2(m[1,0], m[0,0]).
    """
    m = jnp.asarray(m)
    sy = jnp.clip(-m[..., 2, 0], -1.0, 1.0)
    y = jnp.arcsin(sy)
    # Gimbal-lock tolerance: same fallback direction as scipy (sets x=0).
    cy = jnp.sqrt(jnp.maximum(m[..., 2, 1] ** 2 + m[..., 2, 2] ** 2, 1e-24))
    locked = cy < 1e-7
    x = jnp.where(locked, 0.0, jnp.arctan2(m[..., 2, 1], m[..., 2, 2]))
    z = jnp.where(
        locked,
        jnp.arctan2(-m[..., 0, 1], m[..., 1, 1]),
        jnp.arctan2(m[..., 1, 0], m[..., 0, 0]),
    )
    return jnp.stack([x, y, z], axis=-1)


def pose_diff_rte_rre(P_pred: jax.Array, P_gt: jax.Array):
    """RTE (m) and RRE (deg) between predicted and GT poses.

    RRE = sum of |extrinsic-xyz Euler angles| of inv(P_pred) @ P_gt in degrees
    — the reference's exact criterion (`evaluate_rt.py:21-29`).
    """
    P_diff = invert_transform(P_pred) @ P_gt
    rte = jnp.linalg.norm(P_diff[..., :3, 3], axis=-1)
    ang = rotmat_to_euler_xyz(P_diff[..., :3, :3])
    rre = jnp.sum(jnp.abs(jnp.degrees(ang)), axis=-1)
    return rte, rre


def rotation_angle_deg(R: jax.Array) -> jax.Array:
    """Geodesic rotation angle in degrees (alternative RRE metric)."""
    t = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    c = jnp.clip((t - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(c))
