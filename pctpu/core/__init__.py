from pctpu.core.cloud import PointCloud, pad_cloud  # noqa: F401
from pctpu.core import se3  # noqa: F401
from pctpu.core import io  # noqa: F401
