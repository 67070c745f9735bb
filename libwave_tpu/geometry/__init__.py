"""Batched Lie-group geometry for TPU.

Capability parity with the reference's Eigen-based math layer
(wave_utils/include/wave/utils/math.hpp:25-140, wave_utils/src/math.cpp) and the
wave_geometry submodule (manifold rotations/transforms with Jacobians), designed
TPU-first: every function is a pure, jit-safe, dtype-preserving map over arrays
with arbitrary leading batch dimensions. Quaternions are Hamilton convention,
ordered ``[w, x, y, z]``, and always represent *rotations* (unit norm).
"""

from libwave_tpu.geometry import euler, frames, se3, so3  # noqa: F401
from libwave_tpu.geometry.pose_cov import (  # noqa: F401
    PoseWithCovariance,
    compose_pose_with_covariance,
)
from libwave_tpu.geometry.se3 import SE3  # noqa: F401
