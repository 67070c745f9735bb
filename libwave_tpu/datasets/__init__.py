"""Dataset loaders (EuRoC MAV, KITTI odometry) feeding the pipelines.

The reference ships a VO dataset directory format plus a vendored
KITTI-derived feature-track dump (wave_optimization/tests/data/
vo_data_drive_0036); real-dataset loading was left to the user. Here the
standard benchmark formats load natively (libwave_tpu.native CSV/PCD/binary
readers) into the fixed-shape structures the estimators consume.
"""

from libwave_tpu.datasets.euroc import (  # noqa: F401
    EurocImu,
    EurocGroundTruth,
    load_euroc_imu,
    load_euroc_ground_truth,
    load_euroc_camera_index,
    load_euroc_tracks,
    EUROC_CAM0_K,
)
from libwave_tpu.datasets.kitti import (  # noqa: F401
    load_kitti_poses,
    load_kitti_velodyne,
    load_kitti_times,
)
