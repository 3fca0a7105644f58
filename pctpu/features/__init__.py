from pctpu.features.iss import iss_keypoints, ISSResult  # noqa: F401
from pctpu.features.harris import (  # noqa: F401
    harris3d_keypoints, harris6d_keypoints, intensity_gradients,
    rgb_to_intensity, HarrisResult)
from pctpu.features.fpfh import fpfh, spfh  # noqa: F401
from pctpu.features.fpfh_dense import (  # noqa: F401
    fpfh_dense, normals_radius_dense)
from pctpu.features.matching import match_features, Matches  # noqa: F401
from pctpu.features.nms import radius_nms, top_k_mask  # noqa: F401
from pctpu.features.shot import shot352  # noqa: F401
from pctpu.features.sift3d import sift3d_keypoints, SIFT3DResult  # noqa: F401
