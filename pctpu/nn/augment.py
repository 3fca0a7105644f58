"""Point-cloud augmentations — on-device, batched, PRNG-keyed.

Parameter-exact re-design of the reference transform classes
(`Classification_ModelNet40/pointnet2/data/data_utils.py:38-141`), but as
pure jax functions over whole batches (one fused program per epoch step
instead of per-sample host numpy):

  scale U[0.8, 1.25]; rotate about y (full circle, normals too); small-angle
  xyz perturbation (sigma .06 clip .18); jitter (sigma .01 clip .05, xyz
  only); translate U[-.1, .1] (scalar, matching the reference's quirk of
  adding the same scalar to all three coords); random input dropout (ratio
  U[0, .875), dropped points replaced by point 0).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp


def angle_axis(angle, axis):
    """Rodrigues rotation matrix, parity with data_utils.py:5-35."""
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis)
    x, y, z = axis[0], axis[1], axis[2]
    cross = jnp.array([[0, -z, y], [z, 0, -x], [-y, x, 0]], jnp.float32)
    c, s = jnp.cos(angle), jnp.sin(angle)
    return (c * jnp.eye(3) + s * cross
            + (1 - c) * jnp.outer(axis, axis)).astype(jnp.float32)


def _apply_rot(pc, R):
    """pc [...,N,C>=3]: rotate xyz (and normals in channels 3:6 if present)."""
    xyz = pc[..., :3] @ R.T
    if pc.shape[-1] >= 6:
        nrm = pc[..., 3:6] @ R.T
        rest = pc[..., 6:]
        return jnp.concatenate([xyz, nrm, rest], axis=-1)
    return jnp.concatenate([xyz, pc[..., 3:]], axis=-1)


def scale(key, pc, lo=0.8, hi=1.25):
    s = jax.random.uniform(key, (), minval=lo, maxval=hi)
    return pc.at[..., :3].multiply(s)


def rotate_y(key, pc):
    ang = jax.random.uniform(key, ()) * 2 * jnp.pi
    return _apply_rot(pc, angle_axis(ang, jnp.array([0.0, 1.0, 0.0])))


def rotate_perturbation(key, pc, angle_sigma=0.06, angle_clip=0.18):
    ang = jnp.clip(angle_sigma * jax.random.normal(key, (3,)),
                   -angle_clip, angle_clip)
    Rx = angle_axis(ang[0], jnp.array([1.0, 0.0, 0.0]))
    Ry = angle_axis(ang[1], jnp.array([0.0, 1.0, 0.0]))
    Rz = angle_axis(ang[2], jnp.array([0.0, 0.0, 1.0]))
    return _apply_rot(pc, Rz @ Ry @ Rx)


def jitter(key, pc, std=0.01, clip=0.05):
    noise = jnp.clip(std * jax.random.normal(key, pc[..., :3].shape),
                     -clip, clip)
    return pc.at[..., :3].add(noise)


def translate(key, pc, rng=0.1):
    t = jax.random.uniform(key, (), minval=-rng, maxval=rng)
    return pc.at[..., :3].add(t)


def random_dropout(key, pc, max_ratio=0.875):
    k1, k2 = jax.random.split(key)
    ratio = jax.random.uniform(k1, ())
    drop = jax.random.uniform(k2, pc.shape[:-1]) <= ratio * max_ratio
    first = pc[..., :1, :]
    return jnp.where(drop[..., None], first, pc)


DEFAULT_TRAIN_PIPELINE = ("scale", "rotate_y", "rotate_perturbation",
                          "translate", "jitter", "random_dropout")

_FNS = {"scale": scale, "rotate_y": rotate_y,
        "rotate_perturbation": rotate_perturbation, "jitter": jitter,
        "translate": translate, "random_dropout": random_dropout}


@partial(jax.jit, static_argnames=("pipeline",))
def augment(key: jax.Array, pc: jax.Array,
            pipeline: Sequence[str] = DEFAULT_TRAIN_PIPELINE) -> jax.Array:
    """Apply the training pipeline (the transform order of
    `pointnet2_ssg_cls.py:198-208`) to one cloud [N,C]."""
    for i, name in enumerate(pipeline):
        pc = _FNS[name](jax.random.fold_in(key, i), pc)
    return pc


def augment_batch(key: jax.Array, pc: jax.Array,
                  pipeline: Sequence[str] = DEFAULT_TRAIN_PIPELINE) -> jax.Array:
    """[B,N,C], independent draws per sample."""
    keys = jax.random.split(key, pc.shape[0])
    return jax.vmap(lambda k, p: augment(k, p, pipeline))(keys, pc)


def pc_normalize(pc: jax.Array) -> jax.Array:
    """Center + unit-sphere scale (`ModelNet40Loader.py:17-23`), xyz only."""
    xyz = pc[..., :3]
    centroid = jnp.mean(xyz, axis=-2, keepdims=True)
    xyz = xyz - centroid
    m = jnp.max(jnp.sqrt(jnp.sum(xyz ** 2, axis=-1)), axis=-1)
    xyz = xyz / m[..., None, None]
    return jnp.concatenate([xyz, pc[..., 3:]], axis=-1)
