"""pctpu.ops — TPU-native core point-cloud kernels (XLA + Pallas).

Replaces the reference's CUDA extension (`pointnet2_ops/_ext-src`) and its
Python KD-tree/octree layer with masked fixed-shape XLA programs; see each
module's docstring for the file:line parity map.
"""
from pctpu.ops.pairwise import pairwise_sqdist, chunked_min_argmin  # noqa: F401
from pctpu.ops.knn import knn, radius_search, nearest, NeighborSet  # noqa: F401
from pctpu.ops.fps import fps, fps_batched  # noqa: F401
from pctpu.ops.ball_query import ball_query  # noqa: F401
from pctpu.ops.gather import gather_points, group_points, mask_group  # noqa: F401
from pctpu.ops.interpolate import (  # noqa: F401
    three_nn, three_interpolate, interpolation_weights)
from pctpu.ops.voxel import voxel_downsample, voxel_downsample_cloud  # noqa: F401
from pctpu.ops.normals import (  # noqa: F401
    pca, pca_project, estimate_normals, neighborhood_covariances)
from pctpu.ops.eigh3 import eigh3, eigvalsh3  # noqa: F401
from pctpu.ops.grid_hash import (  # noqa: F401
    HashGrid, build_grid, grid_knn, grid_radius, grid_nearest)
from pctpu.ops.morton import morton_codes, morton_sort  # noqa: F401
from pctpu.ops.pallas_banded import build_banded, nearest_banded  # noqa: F401
from pctpu.ops.box3d import (  # noqa: F401
    iou_bev, iou3d, nms_rotated, points_in_boxes, roipool3d, bev_corners,
    corners3d)
