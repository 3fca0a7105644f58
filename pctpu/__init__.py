"""pctpu — TPU-native point-cloud processing framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of the reference
repo ``ruanyyyyyyy/point-cloud-process`` (see SURVEY.md): classical point-cloud
ops (voxel filtering, PCA normals, neighbor search), clustering, keypoints and
descriptors, registration (RANSAC + ICP), PointNet++ model families, and the
KITTI object-detection pipeline — all expressed as fixed-shape, mask-everywhere
XLA programs that scale over `jax.sharding.Mesh` device meshes.

Data model: a point cloud is `(points[N,3], mask[N], features[N,C])` padded to
tile-friendly N; neighbor sets are `(idx[N,K], valid[N,K])`.
"""

__version__ = "0.1.0"

from pctpu.core.cloud import PointCloud  # noqa: F401
