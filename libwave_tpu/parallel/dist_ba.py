"""Distributed bundle adjustment over a device mesh.

The multi-device analog of the reference's multithreaded Ceres solve
(wave_optimization/src/ceres/ba.cpp:51-52, num_threads=8): the observation
bank is sharded over the ``dp`` mesh axis and landmark state over ``tp``.
Normal-equation assembly (segment-sums) then reduces across ``dp`` with
XLA-inserted psums; the batched 3x3 landmark elimination runs sharded over
``tp``; each CG matvec's two gather/segment-sum sweeps become
all-gather + reduce-scatter pairs over ICI. Sharding is expressed with
``jax.jit`` in_shardings/out_shardings (GSPMD) so a single code path serves
1..N devices.

Observation banks must be padded to a multiple of the dp axis size
(``shard_ba_problem`` pads with zero-weight observations — weights already
mask padding everywhere in the solver).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from libwave_tpu.optim.ba import BAConfig, BAProblem, BAState, _lm_iteration


def _pad_axis(x, multiple, fill=0):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x
    padding = jnp.full((pad,) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([x, padding], axis=0)


def shard_ba_problem(problem: BAProblem, state: BAState, mesh: Mesh):
    """Pad + place a BAProblem/BAState on the mesh.

    - observations: sharded over dp (padded with weight-0 rows pointing at
      index 0, which the zero weight fully masks);
    - landmarks: sharded over tp (padded with zero rows);
    - poses, intrinsics: replicated.
    """
    dp = mesh.shape["dp"]
    tp = mesh.shape["tp"]

    # Padding note: pose_idx must stay non-decreasing (the Schur machinery
    # uses sorted segment-sums), so pad with the LAST pose index; the
    # padded rows are fully masked by their zero weight either way.
    last_pose = problem.free_pose.shape[0] - 1
    # the pose-ELL fast path permutes the global observation bank; the
    # sharded path uses sharded segment-sums instead
    problem = problem._replace(ell=None)
    problem = problem._replace(
        pose_idx=_pad_axis(problem.pose_idx, dp, fill=last_pose),
        lm_idx=_pad_axis(problem.lm_idx, dp),
        uv=_pad_axis(problem.uv, dp),
        weight=_pad_axis(problem.weight, dp),
    )
    state = state._replace(lm=_pad_axis(state.lm, tp))

    obs_sh = NamedSharding(mesh, P("dp"))
    obs2_sh = NamedSharding(mesh, P("dp", None))
    lm_sh = NamedSharding(mesh, P("tp", None))
    rep = NamedSharding(mesh, P())

    problem = problem._replace(
        K=jax.device_put(problem.K, rep),
        pose_idx=jax.device_put(problem.pose_idx, obs_sh),
        lm_idx=jax.device_put(problem.lm_idx, obs_sh),
        uv=jax.device_put(problem.uv, obs2_sh),
        weight=jax.device_put(problem.weight, obs_sh),
        free_pose=jax.device_put(problem.free_pose, rep),
        between=jax.tree.map(lambda x: jax.device_put(x, rep), problem.between),
        priors=jax.tree.map(lambda x: jax.device_put(x, rep), problem.priors),
    )
    state = BAState(
        q=jax.device_put(state.q, rep),
        p=jax.device_put(state.p, rep),
        lm=jax.device_put(state.lm, lm_sh),
    )
    return problem, state


def distributed_lm_step(problem: BAProblem, state: BAState, cfg: BAConfig,
                        damping: float = 1e-4):
    """One jit-compiled LM iteration with GSPMD sharding propagated from the
    input placements (call with the outputs of :func:`shard_ba_problem`)."""

    @jax.jit
    def step(problem, state):
        lam = jnp.asarray(damping, dtype=state.p.dtype)
        from libwave_tpu.optim.ba import ba_cost

        cost = ba_cost(problem, state)
        carry = (state, lam, cost, jnp.asarray(False))
        carry, _ = _lm_iteration(problem, cfg, carry, None)
        new_state, _, new_cost, _ = carry
        return new_state, new_cost

    return step(problem, state)
