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
