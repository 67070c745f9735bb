"""Multi-host process groups and host-spanning meshes.

The reference is strictly single-process (its whole concurrency surface is
a thread pool, wave_matching/include/wave/matching/multi_matcher.hpp:30);
multi-host distribution is this framework's addition (SURVEY.md §5.8): a
``jax.distributed`` process group per host, a mesh whose outer axis spans
hosts (DCN) and inner axis the local devices (ICI), and per-host feeding of
the observation bank so no host materializes the full dataset.

Single-host degradation is total: with one process every function below is
a cheap no-op/identity, so the same launch script runs from a laptop to a
pod slice.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh

from libwave_tpu.optim.ba import BAConfig, BAProblem, BAState
from libwave_tpu.parallel.dist_ba import (
    partition_ba_problem,
    solve_ba_sharded,
)


@dataclasses.dataclass(frozen=True)
class MultiHostConfig:
    """Process-group wiring. Defaults describe a single-host run.

    For an N-host launch, start one process per host with identical
    ``coordinator_address``/``num_processes`` and distinct ``process_id``
    (the usual ``jax.distributed.initialize`` contract); under cluster
    schedulers that set the standard environment variables all three may
    stay None and jax autodetects.
    """

    coordinator_address: str | None = None  # "host:port" of process 0
    num_processes: int | None = None
    process_id: int | None = None
    local_device_ids: tuple | None = None

    def validate(self):
        explicit = (
            self.coordinator_address is not None
            or self.num_processes is not None
            or self.process_id is not None
        )
        if explicit and (
            self.coordinator_address is None
            or self.num_processes is None
            or self.process_id is None
        ):
            raise ValueError(
                "coordinator_address, num_processes and process_id must be "
                "set together (or all left None for autodetection)"
            )


def initialize_multihost(cfg: MultiHostConfig = MultiHostConfig()) -> bool:
    """Create the cross-host process group. Call once per process, before
    any jax computation. Returns True when a multi-process group exists
    afterwards (False for the single-host degenerate case).
    """
    cfg.validate()
    if (
        cfg.coordinator_address is None
        and cfg.num_processes in (None, 1)
        and jax.process_count() == 1
    ):
        return False  # single host: nothing to initialize
    kwargs = {}
    if cfg.coordinator_address is not None:
        kwargs = dict(
            coordinator_address=cfg.coordinator_address,
            num_processes=cfg.num_processes,
            process_id=cfg.process_id,
        )
        if cfg.local_device_ids is not None:
            kwargs["local_device_ids"] = list(cfg.local_device_ids)
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def make_host_mesh(axis_names=("dcn", "ici")) -> Mesh:
    """(hosts, local-devices) mesh: the outer axis crosses hosts (DCN
    links), the inner axis stays within each host's slice (ICI). Devices
    are ordered process-major so a contiguous block partition keeps
    neighbors ICI-local."""
    procs = jax.process_count()
    devices = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id)
    )
    local = len(devices) // procs
    arr = np.asarray(devices).reshape(procs, local)
    return Mesh(arr, axis_names)


def flatten_mesh(mesh: Mesh, axis_name: str = "dp") -> Mesh:
    """Collapse a (dcn, ici) mesh into one 1-D axis (device order
    preserved: host-major). The block-partitioned solvers shard over a
    single named axis; XLA still routes the collectives hierarchically
    (ICI within a host, DCN across) from the device order."""
    return Mesh(mesh.devices.reshape(-1), (axis_name,))


def host_block_range(n_items: int, mesh: Mesh | None = None):
    """[lo, hi) block of a length-``n_items`` partition owned by THIS
    process under contiguous block sharding over all devices — what a
    per-host data loader should read so no host touches the full dataset.
    """
    procs = jax.process_count()
    me = jax.process_index()
    per = -(-n_items // procs)
    return me * per, min(n_items, (me + 1) * per)


def solve_ba_multihost(
    problem: BAProblem,
    state: BAState,
    cfg: BAConfig = BAConfig(),
    mesh: Mesh | None = None,
):
    """Distributed BA over every device of every host: contiguous pose
    blocks, one per device, host-major placement (a host's blocks sit on
    its own chips; the landmark psums are the only DCN traffic).

    Single-host this is exactly :func:`solve_ba_sharded` over the local
    devices. Returns (state, info).
    """
    if mesh is None:
        mesh = flatten_mesh(make_host_mesh())
    elif len(mesh.axis_names) > 1:
        mesh = flatten_mesh(mesh)
    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    stacked, padded = partition_ba_problem(problem, state, n_dev)
    return solve_ba_sharded(stacked, padded, mesh, cfg, axis_name=axis)
