"""End-to-end coarse-to-fine registration on a synthetic LiDAR-like pair —
the minimum end-to-end slice of SURVEY.md §7 step 5."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pctpu.core import se3
from pctpu.core.cloud import PointCloud
from pctpu.register.pipeline import (RegistrationConfig, register_pair)


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
