"""Distributed VIO: the full visual-inertial solve over a device mesh.

Same design as :mod:`libwave_tpu.parallel.dist_ba` (sharded pose-ELL
layout): the reprojection bank is partitioned into contiguous keyframe
blocks, one per device; keyframe/landmark *state* and the (tiny) IMU +
bias-walk factor banks stay replicated and are evaluated redundantly.
Inside ``shard_map`` the trust-region LM loop of
:func:`libwave_tpu.pipelines.vio.solve_vio` runs with landmark-side
reductions psum'd and pose-side blocks all_gathered — identical numerics to
the single-device solve.

The reference's closest analog is the GTSAM LM optimization of the combined
pose/vel/bias graph (wave_gtsam/tests/gtsam/gtsam_offline_example.cpp:133 +
preint_imu_factor.hpp:20), which is single-threaded; distribution is this
framework's addition (SURVEY.md §2.8/§5.8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from libwave_tpu.optim import schur
from libwave_tpu.parallel.dist_ba import partition_ell_bank
from libwave_tpu.pipelines.vio import (
    VIOConfig,
    VIOProblem,
    VIOState,
    solve_vio,
)


def partition_vio_problem(problem: VIOProblem, state: VIOState,
                          n_shards: int):
    """Host-side partitioner: contiguous keyframe blocks of the
    reprojection bank (common Pmax/shift passes), keyframe padding with
    frozen dummy states. IMU/bias banks and their indices stay global.

    Returns ``(stacked_problem, padded_state)`` for
    :func:`solve_vio_sharded`.
    """
    N = problem.free_pose.shape[0]
    M = state.lm.shape[0]
    pose_b, lm_b, w_b, ell, uv_b, n_pad = partition_ell_bank(
        problem.pose_idx, problem.lm_idx, problem.obs_weight, N, M,
        n_shards, problem.uv,
    )
    dtype = state.p.dtype
    pad = n_pad - N
    free = jnp.concatenate(
        [problem.free_pose,
         jnp.zeros((pad,) + problem.free_pose.shape[1:],
                   problem.free_pose.dtype)]
    )
    stacked = problem._replace(
        pose_idx=pose_b,
        lm_idx=lm_b,
        uv=uv_b,
        obs_weight=w_b.astype(dtype),
        free_pose=free,
        ell=ell,
    )
    # pad the IMU factor bank to a multiple of n_shards so the
    # expert-parallel linearization slices evenly; padding factors carry
    # zero whitening (silencing both the IMU and bias-walk residuals)
    F = problem.imu_i.shape[0]
    f_pad = (-F) % n_shards
    if f_pad:
        rep = lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (f_pad,) + x.shape[1:])]
        )
        stacked = stacked._replace(
            pim=jax.tree.map(rep, problem.pim),
            imu_i=jnp.concatenate(
                [problem.imu_i, jnp.zeros(f_pad, problem.imu_i.dtype)]
            ),
            imu_j=jnp.concatenate(
                [problem.imu_j, jnp.zeros(f_pad, problem.imu_j.dtype)]
            ),
            imu_sqrt_info=jnp.concatenate(
                [
                    problem.imu_sqrt_info,
                    jnp.zeros((f_pad, 9, 9), problem.imu_sqrt_info.dtype),
                ]
            ),
        )

    q_pad = jnp.zeros((pad, 4), state.q.dtype).at[:, 0].set(1.0)
    z = lambda c: jnp.zeros((pad, c), dtype)
    padded_state = state._replace(
        q=jnp.concatenate([state.q, q_pad]),
        p=jnp.concatenate([state.p, z(3)]),
        v=jnp.concatenate([state.v, z(3)]),
        bg=jnp.concatenate([state.bg, z(3)]),
        ba=jnp.concatenate([state.ba, z(3)]),
    )
    return stacked, padded_state


def solve_vio_sharded(
    stacked: VIOProblem,
    state: VIOState,
    mesh: Mesh,
    cfg: VIOConfig = VIOConfig(),
    axis_name: str = "dp",
):
    """Full distributed VIO LM solve, one keyframe block per device.

    ``stacked``/``state`` come from :func:`partition_vio_problem`; the
    number of blocks must equal the mesh axis size. Returns (state, info)
    matching :func:`libwave_tpu.pipelines.vio.solve_vio` on the
    unpartitioned problem (trim padding keyframes with ``[:N]``).

    The jit(shard_map) executable is cached on (mesh, axis_name, cfg,
    problem structure) — repeated solves do not re-trace.
    """
    n_blocks = stacked.pose_idx.shape[0]
    n_dev = int(mesh.shape[axis_name])
    if n_blocks != n_dev:
        raise ValueError(
            f"problem has {n_blocks} keyframe blocks but mesh axis "
            f"'{axis_name}' has {n_dev} devices; re-partition with "
            f"n_shards={n_dev}"
        )
    cache_key = (
        mesh, axis_name, cfg, jax.tree.structure((stacked, state))
    )
    mapped = _VIO_SOLVER_CACHE.get(cache_key)
    if mapped is not None:
        return mapped(stacked, state)

    spec_b = P(axis_name)
    rep = P()

    def tree_spec(x, spec):
        return jax.tree.map(lambda _: spec, x)

    in_specs = (
        tree_spec(stacked, rep)._replace(
            pose_idx=spec_b, lm_idx=spec_b, uv=spec_b, obs_weight=spec_b,
            ell=schur.EllLayout(
                sigma=spec_b, shift_masks=spec_b,
                seg_last=spec_b, has_obs=spec_b,
            ),
        ),
        tree_spec(state, rep),
    )

    def local_solve(problem, st):
        problem = problem._replace(
            pose_idx=problem.pose_idx[0],
            lm_idx=problem.lm_idx[0],
            uv=problem.uv[0],
            obs_weight=problem.obs_weight[0],
            ell=jax.tree.map(lambda x: x[0], problem.ell),
        )
        return solve_vio(problem, st, cfg, axis_name=axis_name)

    out_info = {
        "initial_cost": rep, "final_cost": rep, "costs": rep,
        "accepted": rep, "cg_iterations": rep, "final_lambda": rep,
    }
    mapped = jax.jit(
        jax.shard_map(
            local_solve, mesh=mesh,
            in_specs=in_specs,
            out_specs=(tree_spec(state, rep), out_info),
            check_vma=False,
        )
    )
    _VIO_SOLVER_CACHE[cache_key] = mapped
    return mapped(stacked, state)


# see parallel.dist_ba._BA_SOLVER_CACHE — same retrace-avoidance cache
_VIO_SOLVER_CACHE: dict = {}
