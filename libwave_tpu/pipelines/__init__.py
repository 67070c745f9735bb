"""End-to-end estimation pipelines (parity: the reference's test-embedded
pipelines — wave_gtsam/tests/gtsam/gtsam_offline_example.cpp VO and the
factor combinations its factor pack was built for — promoted to first-class
library components)."""

from libwave_tpu.pipelines.vio import (  # noqa: F401
    VIOConfig,
    VIOProblem,
    VIOState,
    solve_vio,
    solve_vio_staged,
    vio_from_sim,
)
from libwave_tpu.pipelines.euroc_vio import (  # noqa: F401
    EurocVIOParams,
    build_euroc_vio_problem,
    run_euroc_vio,
    run_euroc_vio_from_images,
)
from libwave_tpu.pipelines.windowed_vio import (  # noqa: F401
    WindowedVIOParams,
    run_euroc_vio_windowed,
)
from libwave_tpu.pipelines.windowed_ba import (  # noqa: F401
    WindowedBAParams,
    solve_ba_windowed,
)
from libwave_tpu.pipelines.visual_frontend import (  # noqa: F401
    FrontendParams,
    detect_and_describe,
    track_sequence,
    track_sequences_batched,
    tracks_from_state,
)
from libwave_tpu.pipelines.overlap import (  # noqa: F401
    pipelined_windows,
    serial_windows,
)
from libwave_tpu.pipelines.lidar_odometry import (  # noqa: F401
    LidarOdometryConfig,
    LidarOdometryResult,
    lidar_odometry,
)
from libwave_tpu.pipelines.vo_frontend import (  # noqa: F401
    TwoFrameResult,
    VOFrontendConfig,
    two_frame_pose,
)
