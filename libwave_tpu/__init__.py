"""libwave_tpu: a TPU-native SLAM/SfM engine built from scratch in JAX/XLA/Pallas.

A ground-up re-design of the capabilities of wavelab/libwave (the C++ reference
library of composable SLAM building blocks) for TPU hardware:

- ``geometry``   batched Lie algebra (SO(3)/SE(3)), pose+covariance composition
                 (capability parity: wave_utils math.hpp / pose_cov_comp.hpp,
                 wave_geometry submodule)
- ``utils``      config dataclasses + yaml, logging, timing, csv I/O
                 (parity: wave_utils)
- ``containers`` struct-of-arrays measurement tables with device-side
                 interpolating lookup (parity: wave_containers)
- ``kinematics`` two-wheel / quadrotor / gimbal models as lax.scan steps
                 (parity: wave_kinematics)
- ``controls``   PID (parity: wave_controls)
- ``geography``  LLH/ECEF/ENU conversions, WGS84 (parity: wave_geography)
- ``vision``     FAST/ORB detection, BRISK/ORB description, Hamming matching,
                 RANSAC, fixed-capacity tracker, pinhole camera, synthetic VO
                 dataset (parity: wave_vision) — hot paths as Pallas kernels
- ``matching``   ICP/GICP/NDT registration with voxel-grid correspondence,
                 LUM/Censi information matrices, GP-INSAC ground segmentation,
                 batched multi-matching (parity: wave_matching)
- ``optim``      factor-graph back end: reprojection/IMU-preintegration/motion/
                 GPS-bias/prior/hand-eye/decaying-bias factors over combined
                 manifold states, Gauss-Newton/LM with Schur elimination and
                 preconditioned CG (parity: wave_optimization + wave_gtsam)
- ``parallel``   mesh/topology, sharded factor banks, distributed BA
                 (new; the reference is single-process)
- ``benchmark``  trajectory comparison, ATE/RPE (parity: wave_benchmark)
- ``sim``        synthetic dataset generation helpers

Everything is pure functions over pytrees of fixed-shape arrays; batching via
vmap, device placement via jax.sharding, Pallas kernels where XLA fusion is not
enough.
"""

__version__ = "0.1.0"

from libwave_tpu import geometry, utils  # noqa: F401
