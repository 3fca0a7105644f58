import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from pctpu.core import se3


def random_rotations(n, seed=0):
    return Rotation.random(n, random_state=seed).as_matrix().astype(np.float32)


def test_quat_roundtrip():
    Rs = random_rotations(64)
    q = se3.rotmat_to_quat(jnp.asarray(Rs))
    R2 = se3.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R2), Rs, atol=1e-5)


def test_quat_matches_scipy_convention():
    Rs = random_rotations(32, seed=1)
    q = np.asarray(se3.rotmat_to_quat(jnp.asarray(Rs)))  # (w,x,y,z)
    q_scipy = Rotation.from_matrix(Rs).as_quat()  # (x,y,z,w)
    q_scipy_wxyz = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
    # quaternions are sign-ambiguous; compare up to sign
    dot = np.abs(np.sum(q * q_scipy_wxyz, axis=1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_transform_apply_invert():
    rng = np.random.default_rng(0)
    R = random_rotations(1)[0]
    t = rng.normal(size=3).astype(np.float32)
    T = se3.make_transform(jnp.asarray(R), jnp.asarray(t))
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    out = se3.apply_transform(T, jnp.asarray(pts))
    expected = pts @ R.T + t
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
    back = se3.apply_transform(se3.invert_transform(T), out)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_euler_xyz_matches_scipy():
    Rs = random_rotations(128, seed=2)
    ours = np.asarray(se3.rotmat_to_euler_xyz(jnp.asarray(Rs)))
    ref = Rotation.from_matrix(Rs).as_euler("xyz")
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_pose_diff_rte_rre_matches_reference_metric():
    # Re-derive the reference evaluator metric (evaluate_rt.py:21-29) in scipy
    # and compare.
    rng = np.random.default_rng(3)
    for seed in range(5):
        Rp = random_rotations(1, seed=seed)[0]
        Rg = random_rotations(1, seed=seed + 100)[0]
        tp = rng.normal(size=3)
        tg = rng.normal(size=3)
        Pp = np.eye(4); Pp[:3, :3] = Rp; Pp[:3, 3] = tp
        Pg = np.eye(4); Pg[:3, :3] = Rg; Pg[:3, 3] = tg
        rte, rre = se3.pose_diff_rte_rre(
            jnp.asarray(Pp, jnp.float32), jnp.asarray(Pg, jnp.float32))
        P_diff = np.linalg.inv(Pp) @ Pg
        rte_ref = np.linalg.norm(P_diff[:3, 3])
        rre_ref = np.sum(np.abs(
            Rotation.from_matrix(P_diff[:3, :3]).as_euler("xyz", degrees=True)))
        assert float(rte) == pytest.approx(rte_ref, abs=1e-3)
        assert float(rre) == pytest.approx(rre_ref, abs=1e-2)


def test_tq_roundtrip():
    Rs = random_rotations(8, seed=5)
    ts = np.random.default_rng(1).normal(size=(8, 3)).astype(np.float32)
    T = se3.make_transform(jnp.asarray(Rs), jnp.asarray(ts))
    t, q = se3.transform_to_tq(T)
    T2 = se3.tq_to_transform(t, q)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-5)
