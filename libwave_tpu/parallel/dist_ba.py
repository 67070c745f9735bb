"""Distributed bundle adjustment over a device mesh.

The multi-device analog of the reference's multithreaded Ceres solve
(wave_optimization/src/ceres/ba.cpp:43-60, SPARSE_SCHUR + num_threads=8) —
except here "threads" are TPU chips and the full solve loop distributes.

Two paths:

1. **Sharded ELL solve** (:func:`partition_ba_problem` +
   :func:`solve_ba_sharded`) — the production path. The observation bank is
   partitioned into contiguous pose blocks, one per device, each packed in
   the pose-ELL fast layout (the same single-device layout
   ``optim.schur`` measured ~3-6x faster than flat segment-sums, so
   per-chip speed survives sharding). Pose and landmark *state* stay
   replicated (they are tiny next to the bank); inside ``shard_map``:

   - linearization + pose-side normal blocks are local; local (Nb, ...)
     blocks all_gather into the replicated global system;
   - landmark-side blocks (6, M)/(3, M) psum over the mesh;
   - the trust-region LM loop and PCG run replicated — each CG matvec's
     U-sweeps are local ELL work plus one (3, M) psum and one (Nb, D)
     all_gather riding ICI (the distributed Schur matvec of SURVEY §5.7).

   Numerics are bit-comparable to the single-device solve: same layout,
   same reduction trees per device, one extra cross-device add.

2. **GSPMD one-step** (:func:`shard_ba_problem` + :func:`distributed_lm_step`)
   — observation bank sharded over ``dp`` and landmark state over ``tp`` by
   sharding annotations alone, flat segment-sum layout. Kept for the
   annotate-and-let-XLA-partition style and for landmark-state sharding when
   M is too big to replicate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from libwave_tpu.optim import schur
from libwave_tpu.optim.ba import (
    BAConfig,
    BAProblem,
    BAState,
    _lm_iteration,
    solve_ba,
)
from libwave_tpu.utils.precision import f32_matmuls


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


def partition_ell_bank(pose_idx, lm_idx, weight, num_poses, num_landmarks,
                       n_shards, *arrays):
    """Host-side: split an observation bank into ``n_shards`` contiguous
    pose blocks, each packed pose-ELL with a common Pmax and a common
    shift-pass count (so every device runs the identical program on its
    block). Rows with zero weight (prior ELL padding) are dropped first.

    Returns ``(pose_idx, lm_idx, weight, ell, *packed)``, every field
    stacked with a leading (n_shards,) axis, plus ``n_pad`` (the padded
    global pose count; blocks cover ``n_pad / n_shards`` poses each).
    """
    pose_idx = np.asarray(pose_idx)
    lm_idx = np.asarray(lm_idx)
    weight = np.asarray(weight)
    arrays = [np.asarray(a) for a in arrays]
    live = weight > 0
    pose_idx, lm_idx, weight = pose_idx[live], lm_idx[live], weight[live]
    arrays = [a[live] for a in arrays]

    nb = -(-num_poses // n_shards)  # ceil
    n_pad = n_shards * nb
    pmax = max(int(np.bincount(pose_idx, minlength=num_poses).max()), 1)

    banks = []
    for b in range(n_shards):
        lo, hi = b * nb, (b + 1) * nb
        sel = (pose_idx >= lo) & (pose_idx < hi)
        out = schur.pack_observations(
            pose_idx[sel] - lo, lm_idx[sel], nb, num_landmarks,
            weight[sel], *[a[sel] for a in arrays], min_pmax=pmax,
        )
        banks.append(out)

    # unify shift-pass counts (a zero mask row is a no-op pass)
    s_max = max(bk[3].shift_masks.shape[0] for bk in banks)

    def pad_masks(m):
        s = m.shape[0]
        if s == s_max:
            return m
        return jnp.concatenate(
            [m, jnp.zeros((s_max - s,) + m.shape[1:], m.dtype)], axis=0
        )

    ell = schur.EllLayout(
        sigma=jnp.stack([bk[3].sigma for bk in banks]),
        shift_masks=jnp.stack([pad_masks(bk[3].shift_masks) for bk in banks]),
        seg_last=jnp.stack([bk[3].seg_last for bk in banks]),
        has_obs=jnp.stack([bk[3].has_obs for bk in banks]),
    )
    return (
        jnp.stack([bk[0] for bk in banks]),
        jnp.stack([bk[1] for bk in banks]),
        jnp.stack([bk[4] for bk in banks]),  # weight (padding already zero)
        ell,
        *[
            jnp.stack([bk[5 + k] for bk in banks])
            for k in range(len(arrays))
        ],
        n_pad,
    )


def partition_ba_problem(problem: BAProblem, state: BAState, n_shards: int):
    """Host-side partitioner for the sharded ELL solve.

    Splits the pose range into ``n_shards`` contiguous blocks (padding N to
    a multiple with frozen dummy poses) and packs each block's observations
    into pose-ELL order with a common Pmax, so every device runs the
    identical fast-layout program on its block.

    Returns ``(stacked_problem, padded_state)``: the observation-bank and
    EllLayout fields carry a leading (n_shards,) axis; ``K``, ``free_pose``,
    ``between`` and ``priors`` stay global. Feed both to
    :func:`solve_ba_sharded`.
    """
    N = problem.free_pose.shape[0]
    M = state.lm.shape[0]
    pose_b, lm_b, w_b, ell, uv_b, n_pad = partition_ell_bank(
        problem.pose_idx, problem.lm_idx, problem.weight, N, M, n_shards,
        problem.uv,
    )
    dtype = state.p.dtype
    free = jnp.concatenate(
        [problem.free_pose, jnp.zeros(n_pad - N, problem.free_pose.dtype)]
    )
    stacked = problem._replace(
        pose_idx=pose_b,
        lm_idx=lm_b,
        uv=uv_b,
        weight=w_b.astype(dtype),
        free_pose=free,
        ell=ell,
    )
    q_pad = jnp.zeros((n_pad - N, 4), state.q.dtype).at[:, 0].set(1.0)
    padded_state = state._replace(
        q=jnp.concatenate([state.q, q_pad]),
        p=jnp.concatenate([state.p, jnp.zeros((n_pad - N, 3), dtype)]),
    )
    return stacked, padded_state


def solve_ba_sharded(
    stacked: BAProblem,
    state: BAState,
    mesh: Mesh,
    cfg: BAConfig = BAConfig(),
    axis_name: str = "dp",
):
    """Full distributed LM solve (trust-region lambda, convergence freeze,
    Huber) with one observation pose block per device — the distributed
    promotion of the reference's Ceres ``solve()``
    (wave_optimization/src/ceres/ba.cpp:43-60).

    ``stacked``/``state`` come from :func:`partition_ba_problem`; the number
    of blocks must equal the mesh axis size. Returns (state, info) with the
    same values as :func:`libwave_tpu.optim.ba.solve_ba` on the
    unpartitioned problem (the state is replicated; trim padding poses with
    ``state.q[:N]``).

    The jit(shard_map) executable is cached on (mesh, axis_name, cfg,
    problem structure) — repeated solves do not re-trace.
    """
    n_blocks = stacked.pose_idx.shape[0]
    n_dev = int(mesh.shape[axis_name])
    if n_blocks != n_dev:
        raise ValueError(
            f"problem has {n_blocks} pose blocks but mesh axis "
            f"'{axis_name}' has {n_dev} devices; re-partition with "
            f"n_shards={n_dev}"
        )
    cache_key = (
        mesh, axis_name, cfg, jax.tree.structure((stacked, state))
    )
    mapped = _BA_SOLVER_CACHE.get(cache_key)
    if mapped is not None:
        return mapped(stacked, state)

    spec_b = P(axis_name)
    rep = P()

    def tree_spec(x, spec):
        return jax.tree.map(lambda _: spec, x)

    in_specs = (
        stacked._replace(
            K=rep,
            pose_idx=spec_b, lm_idx=spec_b, uv=spec_b, weight=spec_b,
            free_pose=rep,
            between=tree_spec(stacked.between, rep),
            priors=tree_spec(stacked.priors, rep),
            ell=schur.EllLayout(
                sigma=spec_b, shift_masks=spec_b,
                seg_last=spec_b, has_obs=spec_b,
            ),
        ),
        BAState(q=rep, p=rep, lm=rep),
    )

    def local_solve(problem, st):
        # strip the leading block axis shard_map leaves on sharded leaves
        problem = problem._replace(
            pose_idx=problem.pose_idx[0],
            lm_idx=problem.lm_idx[0],
            uv=problem.uv[0],
            weight=problem.weight[0],
            ell=jax.tree.map(lambda x: x[0], problem.ell),
        )
        return solve_ba(problem, st, cfg, axis_name=axis_name)

    out_info = {
        "initial_cost": rep, "final_cost": rep, "costs": rep,
        "accepted": rep, "cg_iterations": rep, "final_lambda": rep,
    }
    mapped = jax.jit(
        jax.shard_map(
            local_solve, mesh=mesh,
            in_specs=in_specs,
            out_specs=(BAState(q=rep, p=rep, lm=rep), out_info),
            check_vma=False,
        )
    )
    _BA_SOLVER_CACHE[cache_key] = mapped
    return mapped(stacked, state)


# jit(shard_map) closures keyed on (mesh, axis_name, cfg, tree structure):
# rebuilding the closure per call would re-trace every solve (a measured 60x
# penalty on the pose-graph analog); jit itself still specializes on shapes.
_BA_SOLVER_CACHE: dict = {}


@f32_matmuls
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
