from pctpu.register.procrustes import weighted_procrustes, procrustes_transform  # noqa: F401
from pctpu.register.icp import (  # noqa: F401
    ICPConfig, ICPResult, icp_point_to_point, icp_point_to_plane,
    icp_fixed_iters, icp_fixed_iters_grid, icp_fixed_iters_banded)
from pctpu.register.ransac import (  # noqa: F401
    ransac_registration, ransac_registration_adaptive,
    ransac_registration_batch, RansacResult,
    AdaptiveRansacResult)
from pctpu.register import evaluate  # noqa: F401
