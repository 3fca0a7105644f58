from pctpu.features.iss import iss_keypoints, ISSResult  # noqa: F401
from pctpu.features.harris import (  # noqa: F401
    harris3d_keypoints, harris6d_keypoints, HarrisResult)
from pctpu.features.fpfh import fpfh, spfh  # noqa: F401
from pctpu.features.matching import match_features, Matches  # noqa: F401
from pctpu.features.nms import radius_nms, top_k_mask  # noqa: F401
from pctpu.features.shot import shot352  # noqa: F401
from pctpu.features.sift3d import sift3d_keypoints, SIFT3DResult  # noqa: F401
