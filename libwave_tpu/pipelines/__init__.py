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
