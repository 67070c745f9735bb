"""Lidar scan registration (parity: wave_matching), TPU-first.

ICP/GICP/NDT with voxel-grid downsampling, multiscale schedules, and
LUM/Censi information matrices; batched multi-matching replaces the
reference's thread pool (multi_matcher.hpp:30). Correspondence search is a
chunked matmul nearest-neighbour sweep (the MXU-friendly replacement for
kd-trees, which do not map to TPU).
"""

from libwave_tpu.matching.pointcloud import (  # noqa: F401
    PointCloud,
    make_cloud,
    transform_cloud,
    voxel_downsample,
    synthetic_scan,
)
from libwave_tpu.matching.knn import nearest_neighbor, knn  # noqa: F401
from libwave_tpu.matching.icp import (  # noqa: F401
    ICPParams,
    ICPResult,
    icp_match,
    estimate_info_lum,
    estimate_info_censi,
)
from libwave_tpu.matching.gicp import GICPParams, gicp_match  # noqa: F401
from libwave_tpu.matching.ndt import NDTParams, ndt_match  # noqa: F401
from libwave_tpu.matching.multi import (  # noqa: F401
    multi_match,
    multi_match_sharded,
)
from libwave_tpu.matching.ground_segmentation import (  # noqa: F401
    GROUND,
    OBSTACLE,
    DRIVABLE,
    UNLABELED,
    GroundSegmentationParams,
    segment_ground,
)
