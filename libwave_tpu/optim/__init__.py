"""Factor-graph optimization back end (parity: wave_optimization + wave_gtsam).

The reference delegates to Ceres (SPARSE_SCHUR + SCHUR_JACOBI, 8 CPU threads;
wave_optimization/src/ceres/ba.cpp:43-60) and GTSAM (LM over manifold states).
Here the whole solve runs on device as fixed-shape batched linear algebra:

- factor *banks*: every factor type is a struct-of-arrays over its instances,
  linearized with one vmap (residual + hand-derived manifold Jacobians);
- normal equations assembled by segment-sums (the MXU-friendly analog of
  sparse assembly);
- landmarks eliminated by batched 3x3 block inversion (Schur complement);
- the reduced camera system solved matrix-free by preconditioned CG with the
  block-Jacobi (SCHUR_JACOBI) preconditioner;
- Levenberg-Marquardt trust-region loop as a ``lax.scan``.
"""

from libwave_tpu.optim.ba import (  # noqa: F401
    BAConfig,
    BAProblem,
    BAState,
    ba_cost,
    ba_from_dataset,
    solve_ba,
)
from libwave_tpu.optim.reprojection import (  # noqa: F401
    reprojection_residual,
    linearize_reprojection,
)
from libwave_tpu.optim.states import (  # noqa: F401
    PoseVelAccBiasState,
    PoseVelBiasState,
    PoseVelState,
)
from libwave_tpu.optim.factors import (  # noqa: F401
    bias_prior_residual,
    decaying_bias_residual,
    gps_residual,
    hand_eye_residual,
    motion_residual,
    pose_prior_residual,
    solve_trajectory_gn,
    twist_prior_residual,
)
from libwave_tpu.optim.imu import (  # noqa: F401
    PreintegratedImu,
    imu_residual,
    imu_sqrt_info,
    preintegrate_imu,
    simulate_imu,
)
from libwave_tpu.optim.pose_graph import (  # noqa: F401
    BetweenBank,
    PoseGraphConfig,
    PriorBank,
    between_from_trajectory,
    pose_graph_cost,
    solve_pose_graph,
)
from libwave_tpu.optim.nlls import (  # noqa: F401
    LMConfig,
    LMResult,
    curve_fit,
    exp_curve_residual,
    lm_solve,
    numeric_jacobian,
)
