from pctpu.parallel.mesh import (  # noqa: F401
    make_mesh, multihost_init, shard_batch, replicated)
from pctpu.parallel.pair_sweep import (batched_icp, batched_icp_mega,  # noqa: F401
                                       make_pair_sweep,
                                       make_full_pipeline_sweep)
from pctpu.parallel.point_shard import make_point_sharded_icp  # noqa: F401
from pctpu.parallel.posegraph import (  # noqa: F401
    optimize_pose_graph, optimize_pose_graph_sparse,
    optimize_pose_graph_sparse_f64,
    make_sharded_pose_graph_step, make_sharded_pose_graph_step_sparse,
    PoseGraphResult)
from pctpu.parallel.halo import make_halo_nearest, partition_by_axis  # noqa: F401
