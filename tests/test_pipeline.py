"""End-to-end coarse-to-fine registration on a synthetic LiDAR-like pair —
the minimum end-to-end slice of SURVEY.md §7 step 5."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pctpu.core import se3
from pctpu.core.cloud import PointCloud
from pctpu.register.pipeline import (RegistrationConfig, register_pair,
                                     register_pairs)


def make_structured_scene(rng, n=4000):
    """A scene with walls/boxes so FPFH has geometry to describe."""
    pts = []
    # ground
    g = rng.uniform(-20, 20, (n // 2, 3)).astype(np.float32)
    g[:, 2] = rng.normal(scale=0.05, size=n // 2)
    pts.append(g)
    # a few box-like structures
    for i in range(4):
        c = rng.uniform(-15, 15, 2)
        w = rng.uniform(1, 3, 2)
        h = rng.uniform(2, 5)
        m = n // 8
        face = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
        face[:, 0] = c[0] + w[0] * np.sign(face[:, 0])
        face[:, 1] = c[1] + w[1] * face[:, 1]
        face[:, 2] = h * (face[:, 2] + 1) / 2
        pts.append(face)
    return np.concatenate(pts).astype(np.float32)


@pytest.mark.slow
def test_register_pair_end_to_end(rng):
    src_np = make_structured_scene(rng)
    angle = np.radians(25.0)
    R = Rotation.from_rotvec([0, 0, angle]).as_matrix().astype(np.float32)
    t = np.array([8.0, -5.0, 0.3], np.float32)
    dst_np = (src_np @ R.T + t
              + rng.normal(scale=0.03, size=src_np.shape)).astype(np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R
    T_gt[:3, 3] = t

    src = PointCloud.from_numpy(src_np)
    dst = PointCloud.from_numpy(dst_np)
    cfg = RegistrationConfig(voxel_size=1.0, feature_radius=5.0,
                             ransac_dist=1.5, ransac_hypotheses=4096,
                             icp_dist_thresh=2.0, icp_query_chunk=1024)
    out = register_pair(src, dst, key=jax.random.PRNGKey(0), cfg=cfg)

    rte, rre = se3.pose_diff_rte_rre(out.T, jnp.asarray(T_gt))
    # the reference's own success criterion (evaluate_rt.py:16-18)
    assert float(rte) < 2.0, (float(rte), float(rre))
    assert float(rre) < 5.0, (float(rte), float(rre))
    assert int(out.num_matches) > 20


@pytest.mark.slow
def test_register_pairs_batched(rng):
    """The vmapped full pipeline solves a batch of distinct pairs and
    matches the single-pair path's answers (VERDICT r3 item 1)."""
    src_np = make_structured_scene(rng, n=2000)
    batch = 3
    srcs, dsts, gts = [], [], []
    for i in range(batch):
        angle = np.radians(10.0 + 7.0 * i)
        R = Rotation.from_rotvec([0, 0, angle]).as_matrix().astype(np.float32)
        t = np.array([2.0 + i, -1.0, 0.1 * i], np.float32)
        dst_np = (src_np @ R.T + t + rng.normal(
            scale=0.02, size=src_np.shape)).astype(np.float32)
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, :3] = R
        T_gt[:3, 3] = t
        srcs.append(src_np)
        dsts.append(dst_np)
        gts.append(T_gt)

    src = PointCloud(points=jnp.asarray(np.stack(srcs)),
                     mask=jnp.ones((batch, src_np.shape[0]), bool))
    dst = PointCloud(points=jnp.asarray(np.stack(dsts)),
                     mask=jnp.ones((batch, src_np.shape[0]), bool))
    cfg = RegistrationConfig(voxel_size=1.0, feature_radius=5.0,
                             ransac_dist=1.5, ransac_hypotheses=2048,
                             icp_dist_thresh=2.0, icp_query_chunk=1024,
                             downsample_capacity=1024)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    out = register_pairs(src, dst, keys=keys, cfg=cfg)
    assert out.T.shape == (batch, 4, 4)
    for i in range(batch):
        # the batched path (dense FPFH + multiscale ICP) must clear the
        # reference success bound on every pair, same as the single path
        rte, rre = se3.pose_diff_rte_rre(out.T[i], jnp.asarray(gts[i]))
        assert float(rte) < 2.0, (i, float(rte), float(rre))
        assert float(rre) < 5.0, (i, float(rte), float(rre))
    assert int(jnp.min(out.num_matches)) > 20
    assert int(jnp.min(out.src_voxels)) > 0


def test_capacity_cap_uniform_stride(rng):
    """When downsample_capacity binds, the kept voxels span the WHOLE
    scene (uniform stride), not a lexicographic prefix (ADVICE r3)."""
    from pctpu.ops.voxel import voxel_downsample
    from pctpu.register.pipeline import _cap_uniform
    pts = rng.uniform(-20, 20, (4096, 3)).astype(np.float32)
    mask = jnp.ones((4096,), bool)
    down = voxel_downsample(jnp.asarray(pts), mask, 1.0)
    nv = int(jnp.sum(down.mask))
    cap = nv // 3
    capped, nv_out = _cap_uniform(down, cap)
    assert int(nv_out) == nv
    assert capped.points.shape[0] == cap
    assert bool(jnp.all(capped.mask))
    kept = np.asarray(capped.points)
    full = np.asarray(down.points)[np.asarray(down.mask)]
    # the voxels are lexsorted by cell x: a prefix slice would cover only
    # the low-x end; the stride must span (nearly) the full x range
    span_kept = kept[:, 0].max() - kept[:, 0].min()
    span_full = full[:, 0].max() - full[:, 0].min()
    assert span_kept > 0.9 * span_full
