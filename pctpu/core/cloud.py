"""Point-cloud container: the framework-wide fixed-shape, masked data model.

TPU/XLA programs want static shapes. Every cloud is stored padded to a
tile-friendly point count with an explicit validity mask; all ops in
``pctpu.ops`` honor the mask. This replaces the reference's ad-hoc variable-N
numpy arrays (e.g. ``Cluster_dbscan/clustering.py:22-33``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """A (possibly batched) padded point cloud.

    Attributes:
      points:   [..., N, 3] float32 coordinates. Padded entries are finite
                (repeat of a valid point or 0) — never NaN/inf, so kernels can
                compute distances without special-casing.
      mask:     [..., N] bool; True = real point.
      features: optional [..., N, C] float32 per-point features (normals,
                colors, descriptors...).
    """

    points: jax.Array
    mask: jax.Array
    features: Optional[jax.Array] = None

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    @property
    def batch_shape(self):
        return self.points.shape[:-2]

    def count(self) -> jax.Array:
        """Number of valid points, [...] int32."""
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def with_points(self, points: jax.Array) -> "PointCloud":
        return dataclasses.replace(self, points=points)

    def with_features(self, features: Optional[jax.Array]) -> "PointCloud":
        return dataclasses.replace(self, features=features)

    def transform(self, T: jax.Array) -> "PointCloud":
        """Apply a 4x4 (or [...,4,4]) homogeneous transform to the points."""
        R = T[..., :3, :3]
        t = T[..., :3, 3]
        pts = self.points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
        return self.with_points(pts)

    @staticmethod
    def from_numpy(
        points: np.ndarray,
        features: Optional[np.ndarray] = None,
        capacity: Optional[int] = None,
        tile: int = 128,
    ) -> "PointCloud":
        """Build a padded cloud from an (N,3) host array.

        Padding repeats the first point so padded entries sit at a real
        location (distance computations stay finite); the mask excludes them.
        """
        points = np.asarray(points, dtype=np.float32)
        if points.ndim != 2 or points.shape[1] != 3:
            raise ValueError(f"expected (N,3) points, got {points.shape}")
        n = points.shape[0]
        cap = capacity if capacity is not None else round_up(max(n, 1), tile)
        if cap < n:
            raise ValueError(f"capacity {cap} < N {n}")
        pad = cap - n
        fill = points[:1] if n > 0 else np.zeros((1, 3), np.float32)
        pts = np.concatenate([points, np.repeat(fill, pad, axis=0)], axis=0)
        mask = np.zeros((cap,), dtype=bool)
        mask[:n] = True
        feats = None
        if features is not None:
            features = np.asarray(features, dtype=np.float32)
            ffill = (features[:1] if n > 0
                     else np.zeros((1, features.shape[1]), np.float32))
            feats = np.concatenate([features, np.repeat(ffill, pad, axis=0)], axis=0)
        return PointCloud(jnp.asarray(pts), jnp.asarray(mask),
                          None if feats is None else jnp.asarray(feats))

    def to_numpy(self) -> np.ndarray:
        """Return only the valid points as a host (N,3) array (unbatched only)."""
        if self.batch_shape:
            raise ValueError("to_numpy supports unbatched clouds only")
        pts = np.asarray(self.points)
        msk = np.asarray(self.mask)
        return pts[msk]


def pad_cloud(points: np.ndarray, capacity: Optional[int] = None,
              tile: int = 128) -> PointCloud:
    """Convenience alias for PointCloud.from_numpy."""
    return PointCloud.from_numpy(points, capacity=capacity, tile=tile)
