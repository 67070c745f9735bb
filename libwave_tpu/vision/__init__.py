"""Visual front end (parity: wave_vision), TPU-first.

Pinhole camera utilities, FAST/ORB detection, BRISK/ORB description, Hamming
matching with ratio test and RANSAC outlier rejection, and the fixed-capacity
feature tracker. Hot paths are Pallas kernels over image tiles; everything
else is batched XLA.
"""

from libwave_tpu.vision.camera import (  # noqa: F401
    focal_length,
    pinhole_project,
    pinhole_project_frames,
)
from libwave_tpu.vision.detector import (  # noqa: F401
    FASTParams,
    ORBDetectorParams,
    build_pyramid,
    detect_fast,
    detect_orb,
    detect_orb_pyramid,
    fast_score,
    harris_score,
)
from libwave_tpu.vision.descriptor import (  # noqa: F401
    BRISKParams,
    ORBDescriptorParams,
    brisk_describe,
    orb_describe,
    orb_describe_pyramid,
)
from libwave_tpu.vision.flann import (  # noqa: F401
    FLANNParams,
    LSHIndex,
    build_lsh_index,
    lsh_match,
)
from libwave_tpu.vision.flann_float import (  # noqa: F401
    FloatIndex,
    FloatIndexParams,
    build_float_index,
    exact_l2_top2,
    float_match,
)
from libwave_tpu.vision.matcher import (  # noqa: F401
    MatcherParams,
    find_fundamental_ransac,
    hamming_distance_matrix,
    match_descriptors,
    match_ratio_test,
)
from libwave_tpu.vision.epipolar import (  # noqa: F401
    decompose_essential,
    essential_from_fundamental,
    recover_pose,
    triangulate,
)
from libwave_tpu.vision.tracker import (  # noqa: F401
    TrackerParams,
    TrackerState,
    add_image_features,
    offline_tracker,
    tracker_init,
)
from libwave_tpu.vision.images import (  # noqa: F401
    list_image_sequence,
    load_image,
    read_image_sequence,
)
