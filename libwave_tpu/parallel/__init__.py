"""Mesh/topology and distributed solvers.

New first-class subsystem (the reference is single-process shared-memory; its
entire parallel surface is a thread-pooled MultiMatcher,
wave_matching/include/wave/matching/multi_matcher.hpp:30). Here parallelism is
expressed over a ``jax.sharding.Mesh``:

- ``dp`` axis: observation/factor banks sharded across devices (front-end
  frames and factor evaluation are embarrassingly parallel);
- ``tp`` axis: the map state — landmark blocks and their 3x3 Schur blocks —
  sharded across devices (tensor-parallel analog);
- collectives (psum for normal-equation reductions, all_gather for separator
  poses) are inserted by XLA from sharding annotations, riding ICI.
"""

from libwave_tpu.parallel.mesh import make_mesh, MeshConfig  # noqa: F401
from libwave_tpu.parallel.dist_ba import (  # noqa: F401
    shard_ba_problem,
    distributed_lm_step,
    partition_ba_problem,
    solve_ba_sharded,
)
from libwave_tpu.parallel.dist_vio import (  # noqa: F401
    partition_vio_problem,
    solve_vio_sharded,
)
from libwave_tpu.parallel.multihost import (  # noqa: F401
    MultiHostConfig,
    initialize_multihost,
    make_host_mesh,
    flatten_mesh,
    host_block_range,
    solve_ba_multihost,
)
from libwave_tpu.parallel.dist_pose_graph import (  # noqa: F401
    BlockPoseGraph,
    partition_pose_graph,
    solve_pose_graph_blocks,
    unpartition,
)
