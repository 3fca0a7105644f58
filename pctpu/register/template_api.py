"""Course-skeleton API shims (`Registration/icp_template.py:20-200`).

The reference ships an instructor skeleton defining the intended modular
registration API; this module exposes our implementations under those exact
names so course material / downstream code written against the template
works unchanged. Arrays follow the template's (D, N) column-point layout.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pctpu.features.matching import match_features
from pctpu.ops.knn import nearest
from pctpu.register.icp import ICPConfig, icp_point_to_point
from pctpu.register.procrustes import weighted_procrustes
from pctpu.register.ransac import ransac_registration


def find_matchings(feature_source: np.ndarray, feature_target: np.ndarray
                   ) -> np.ndarray:
    """Descriptor matching: features (C, N) -> matchings (2, M) of
    [src_idx; dst_idx] (template `find_matchings`)."""
    m = match_features(jnp.asarray(feature_source.T, jnp.float32),
                       jnp.asarray(feature_target.T, jnp.float32),
                       mutual=True)
    valid = np.asarray(m.valid)
    return np.stack([np.asarray(m.src_idx)[valid],
                     np.asarray(m.dst_idx)[valid]])


def procrustes_transformation(A: np.ndarray, B: np.ndarray
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """Rigid (R, t) minimizing ||R A + t - B||; A, B are (3, N)
    (template `procrustes_transformation` / `Registration/main.py:131-141`)."""
    R, t = weighted_procrustes(jnp.asarray(A.T, jnp.float32),
                               jnp.asarray(B.T, jnp.float32))
    return np.asarray(R), np.asarray(t)


def ransac_init(source: np.ndarray, target: np.ndarray,
                matchings: np.ndarray, dist_thresh: float = 1.0,
                num_hypotheses: int = 8192, seed: int = 0) -> np.ndarray:
    """RANSAC global init from matchings: clouds (3, N), matchings (2, M)
    -> 4x4 transform (template `ransac_init`)."""
    src = source.T[matchings[0]]
    dst = target.T[matchings[1]]
    res = ransac_registration(jnp.asarray(src, jnp.float32),
                              jnp.asarray(dst, jnp.float32),
                              key=jax.random.PRNGKey(seed),
                              dist_thresh=dist_thresh,
                              num_hypotheses=num_hypotheses)
    return np.asarray(res.T)


def find_associations(source: np.ndarray, target: np.ndarray,
                      dist_thresh: float = 5.0) -> np.ndarray:
    """Thresholded 1-NN association: clouds (3, N) -> (2, M) pairs
    (template `find_associations`)."""
    d2, idx = nearest(jnp.asarray(source.T, jnp.float32),
                      jnp.asarray(target.T, jnp.float32), backend="xla")
    d2 = np.asarray(d2)
    idx = np.asarray(idx)
    keep = d2 < dist_thresh ** 2
    return np.stack([np.nonzero(keep)[0], idx[keep]])


def ICP(source: np.ndarray, target: np.ndarray,
        init_transform: Optional[np.ndarray] = None,
        max_iteration: int = 100, dist_thresh: float = 5.0) -> np.ndarray:
    """Full point-to-point ICP: clouds (3, N) -> 4x4 (template `ICP`)."""
    from pctpu.core.cloud import PointCloud
    src = PointCloud.from_numpy(source.T)
    dst = PointCloud.from_numpy(target.T)
    init = (jnp.eye(4) if init_transform is None
            else jnp.asarray(init_transform, jnp.float32))
    res = icp_point_to_point(
        src.points, src.mask, dst.points, dst.mask, init_T=init,
        cfg=ICPConfig(max_iters=max_iteration, dist_thresh=dist_thresh))
    return np.asarray(res.T)
