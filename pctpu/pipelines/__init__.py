from pctpu.pipelines.segmentation import (  # noqa: F401
    SegmentationConfig, segment_ground_and_objects)
from pctpu.pipelines import kitti_frames  # noqa: F401
from pctpu.pipelines import kitti_etl  # noqa: F401
from pctpu.pipelines import detect  # noqa: F401
from pctpu.pipelines import trainset  # noqa: F401
from pctpu.pipelines import registration_driver  # noqa: F401
from pctpu.pipelines import odometry  # noqa: F401
from pctpu.pipelines import kitti_eval  # noqa: F401
from pctpu.pipelines import cluster_compare  # noqa: F401
