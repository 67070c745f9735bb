"""Bundle adjustment: problem container + Levenberg-Marquardt driver.

Capability parity with the reference's ``BundleAdjustment``
(wave_optimization/include/wave/optimization/ceres/ba.hpp:95,
src/ceres/ba.cpp:5-60: per-observation AutoDiffCostFunction<2,4,3,3> +
EigenQuaternionParameterization, solved with SPARSE_SCHUR/SCHUR_JACOBI) and
the GTSAM offline VO example's LM optimization
(wave_gtsam/tests/gtsam/gtsam_offline_example.cpp:133).

TPU-first design: the problem is a fixed-shape observation bank
(pose_idx, lm_idx, uv, weight). One LM iteration = vmapped closed-form
linearization -> segment-sum normal equations -> batched 3x3 landmark
elimination -> matrix-free PCG on the reduced camera system ->
back-substitution -> manifold retraction, with trust-region lambda update on
cost decrease. The whole solve is a single jit-able ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from libwave_tpu.geometry import so3
from libwave_tpu.optim import pose_graph, schur
from libwave_tpu.optim.reprojection import (
    linearize_reprojection_cm,
    linearize_reprojection_ell,
    reprojection_residual_cm,
    reprojection_residual_ell,
)
from libwave_tpu.utils.precision import f32_matmuls


class BAProblem(NamedTuple):
    """Fixed-shape bundle-adjustment problem.

    When ``ell`` is set, the observation bank MUST be in pose-ELL order:
    rectangular, ``Pmax = K_ / N`` slots per pose (pose_idx =
    repeat(arange(N), Pmax)), padding slots carrying zero weight — use
    :func:`libwave_tpu.optim.schur.pack_observations`. This is the fast
    single-device layout. With ``ell=None`` the bank is a flat pose-sorted
    list and the solver uses segment-sums (the sharded path).

    ``between``/``priors`` optionally add pose-graph factors (odometry and
    pose priors, the reference's BetweenFactor/PriorFactor graph structure);
    ``None`` means absent.
    """

    K: jnp.ndarray  # (3, 3) intrinsics
    pose_idx: jnp.ndarray  # (K_,) int32 — observation -> pose
    lm_idx: jnp.ndarray  # (K_,) int32 — observation -> landmark
    uv: jnp.ndarray  # (K_, 2) pixel measurements
    weight: jnp.ndarray  # (K_,) 0 for padding/invalid observations
    free_pose: jnp.ndarray  # (N,) 1.0 free / 0.0 gauge-fixed
    between: object = None  # BetweenBank | None
    priors: object = None  # PriorBank | None
    ell: object = None  # schur.EllLayout | None (pose-ELL fast path)
    # Dense marginal prior on the HEAD O poses (sliding-window
    # marginalization, pipelines.windowed_ba — see
    # pipelines.vio.VIOProblem.prior_Lambda for the VIO analog): cost
    # 0.5 d^T Lambda d - b^T d with d the (O*6,) tangent delta
    # [omega, dp] of poses [0, O) from the prior mean.
    prior_Lambda: jnp.ndarray = None  # (O*6, O*6)
    prior_b: jnp.ndarray = None  # (O*6,)
    prior_q: jnp.ndarray = None  # (O, 4) mean orientations
    prior_p: jnp.ndarray = None  # (O, 3) mean positions
    # Static covisibility-band plan (schur.BandPlan, registered-static
    # pytree aux) for the explicit-S build: contracts only the
    # (pose-run x landmark-range) blocks the covisibility graph
    # populates. Built host-side via schur.compute_band_plan from the
    # packed observation bank; None = dense build.
    bands: object = None

    @property
    def num_poses(self) -> int:
        return self.free_pose.shape[0]


class BAState(NamedTuple):
    """Optimizable variables: camera poses (q_GC, p_GC) and landmarks."""

    q: jnp.ndarray  # (N, 4) camera orientations (camera-to-world)
    p: jnp.ndarray  # (N, 3) camera positions
    lm: jnp.ndarray  # (M, 3) landmark positions


@dataclasses.dataclass(frozen=True)
class BAConfig:
    max_iterations: int = 20
    cg_max_iters: int = 100
    cg_tol: float = 1e-6
    init_lambda: float = 1e-4
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    min_lambda: float = 1e-8
    max_lambda: float = 1e6
    # GTSAM-style stopping (LevenbergMarquardtParams relativeErrorTol /
    # absoluteErrorTol): once an accepted step improves cost by less than
    # these, the solve freezes — this is what keeps poorly-constrained
    # landmarks from creeping along near-null directions.
    relative_decrease_tol: float = 1e-5
    absolute_decrease_tol: float = 1e-9
    # Huber robust loss scale in pixels (None = plain L2). Applied by IRLS
    # reweighting; the acceptance cost uses the same robustified objective.
    # (Ceres LossFunction slot — the reference passes NULL there, ba.cpp:30,
    # but real feature tracks need it.)
    huber_delta: float = None
    # Reduced-camera-system solver: "pcg" (matrix-free, scales to any size,
    # required when sharded), "dense" (explicit Schur + Cholesky — the
    # Ceres DENSE_SCHUR analog, one MXU matmul instead of serial CG
    # sweeps), or "auto" (dense when the problem fits the memory/size
    # gates below, else pcg).
    #
    # BA defaults to PCG: on the KITTI drive_0036 parity problem the exact
    # dense solve converges to a *worse* minimum (final cost 1.46e9 vs
    # 1.34e9, max pose error 3.9 m vs 1.6 m mean) — truncated CG steps act
    # as implicit trust-region regularization on nonconvex inits. (The
    # reference itself runs exact SPARSE_SCHUR, ba.cpp:49; the measured
    # KITTI convergence comparison above is what justifies the different
    # default here.) Dense stays the default-auto choice for VIO
    # (pipelines.vio.VIOConfig), where the stiff IMU chain makes
    # block-Jacobi PCG propagate corrections only ~one keyframe per
    # iteration.
    solver: str = "pcg"
    # Explicit-S PCG (the headline-path win): materialize the reduced
    # camera matrix S once per LM iteration (fused one-hot MXU kernel,
    # chunked over landmark ranges so G never exceeds dense_max_g_bytes)
    # and run the SAME preconditioned CG against it — identical Krylov
    # iterates and basin to matrix-free PCG, but each of the ~20 serial
    # matvecs is one dense einsum instead of ~30 latency-bound
    # gather/shift ops. "auto": use it whenever the solver is pcg,
    # single-device, pose-ELL, on a TPU backend, and S fits
    # explicit_max_s_bytes. "never"/"always" override (always = also
    # off-TPU, for tests). Measured v5e 10k lm / 200 poses: 63 -> see
    # bench (headline); the matrix-free path remains the sharded-mode
    # and huge-N fallback.
    explicit_s: str = "auto"
    explicit_max_s_bytes: float = 4e8  # (N*D)^2 cap for materialized S
    # "auto" also requires M <= this: the one-hot build + A@G^T work is
    # linear in M while matrix-free PCG tracks the observation count, so
    # explicit-S loses at map scale (measured v5e: 10k lm 82 vs 64
    # iter/s in its favor, 100k lm 4.0 vs 8.0 against).
    explicit_max_landmarks: int = 20_000
    # Storage dtype for the explicit-S *operator* build (G/A one-hot +
    # A@G^T), always with f32 MXU accumulation. "f32" (default): exact —
    # the explicit path then reproduces the matrix-free LM trajectory to
    # float tolerance. "bf16": ~1.8x faster S build, but MEASURED
    # UNUSABLE for ill-conditioned BA even with the exact-f32 diagonal
    # repair (dense_reduced_system op_dtype): the ~0.5% off-diagonal
    # operator error degrades LM steps (headline problem: plateau 2.8e-2
    # vs 1.2e-4 at 15 iterations). Kept as an opt-in for well-conditioned
    # operators; never the default.
    s_op_dtype: str = "f32"
    dense_max_pose_dim: int = 4096  # N*D cap for the dense path
    dense_max_g_bytes: float = 1.5e9  # cap on the (N*Dj, 3M) scatter
    # "auto" additionally requires M <= this before picking dense: the
    # dense path's per-iteration cost is dominated by the (N*Dj, 3M)
    # matmul and the N*M scatter, both linear in M, while PCG's cost
    # tracks the observation count only. Measured on v5e at 10k landmarks
    # / 60k observations, dense is ~2x slower per iteration *and* its f32
    # (N*D)^2 Cholesky conditions worse than matrix-free PCG — so auto
    # reserves dense for the small-M regime (VIO keyframe windows, stiff
    # chain-coupled graphs) where serial CG sweeps are the bottleneck.
    dense_max_landmarks: int = 1500

    def validate(self):
        if self.max_iterations <= 0:
            raise ValueError("max_iterations must be > 0")
        if self.solver not in ("auto", "pcg", "dense"):
            raise ValueError("solver must be auto | pcg | dense")
        if self.explicit_s not in ("auto", "never", "always"):
            raise ValueError("explicit_s must be auto | never | always")
        if self.s_op_dtype not in ("f32", "bf16"):
            raise ValueError("s_op_dtype must be f32 | bf16")


def _use_dense_schur(cfg, N, D, Dj, M, itemsize, axis_name):
    """Static solver choice (trace-time): dense Schur when allowed and it
    fits; sharded mode always uses PCG (S couples poses across devices)."""
    if axis_name is not None:
        return False
    if cfg.solver == "pcg":
        return False
    g_bytes = itemsize * N * Dj * 3 * M
    fits = N * D <= cfg.dense_max_pose_dim and g_bytes <= cfg.dense_max_g_bytes
    if cfg.solver == "dense":
        if not fits:
            raise ValueError(
                f"dense solver requested but N*D={N * D} or G bytes "
                f"{g_bytes:.2e} exceed the configured caps"
            )
        return True
    return fits and M <= cfg.dense_max_landmarks


def _use_explicit_s(cfg, N, D, M, itemsize, ell, axis_name, bands=None):
    """Static choice (trace-time) of the explicit-S PCG matvec: same
    Krylov iterates as matrix-free, gated on structure (pose-ELL,
    single-device, TPU kernel available), the S footprint, and the
    landmark count (explicit work is linear in M)."""
    if cfg.explicit_s == "never":
        return False
    if axis_name is not None or ell is None:
        return False
    if itemsize * (N * D) ** 2 > cfg.explicit_max_s_bytes:
        return False
    if cfg.explicit_s == "always":
        return True
    if M > cfg.explicit_max_landmarks and bands is None:
        # dense explicit work is linear in M; a band plan bounds it by
        # the covisibility share instead, so banded problems skip the cap
        return False
    from libwave_tpu.ops.segmm import on_tpu_backend

    return on_tpu_backend()


# Penalty charged per cheirality-violated observation: without it, a step
# that pushes points behind the camera zeroes their (masked) residuals and
# the LM acceptance test mistakes that for an improvement.
_CHEIRALITY_PENALTY = 1e6


def _huber_rho(sq_norm, delta):
    """Huber loss on squared residual norms: 0.5 r^2 inside, delta(|r| -
    0.5 delta) outside."""
    rn = jnp.sqrt(jnp.maximum(sq_norm, 1e-20))
    return jnp.where(
        rn <= delta, 0.5 * sq_norm, delta * (rn - 0.5 * delta)
    )


def _prior_delta(problem: BAProblem, state: BAState) -> jnp.ndarray:
    """Tangent delta (O*6,) of the head poses from the prior mean, in
    retraction order [omega, dp] (first-order identity Jacobian — the
    standard marginalization-prior linearization)."""
    O = problem.prior_q.shape[0]
    return jnp.concatenate(
        [
            so3.quat_boxminus(state.q[:O], problem.prior_q),
            state.p[:O] - problem.prior_p,
        ],
        axis=-1,
    ).reshape(-1)


def _prior_cost(problem: BAProblem, state: BAState) -> jnp.ndarray:
    d = _prior_delta(problem, state)
    c = 0.5 * d @ (problem.prior_Lambda @ d)
    if problem.prior_b is not None:
        c = c - problem.prior_b @ d
    return c


def _prior_terms(problem: BAProblem, state: BAState):
    """Normal-equation contributions of the dense head prior: per-pose
    diagonal blocks, upper-triangle cross couplings, and the rhs."""
    import numpy as onp

    O = problem.prior_q.shape[0]
    Lam4 = problem.prior_Lambda.reshape(O, 6, O, 6)
    diag = Lam4[jnp.arange(O), :, jnp.arange(O), :]  # (O, 6, 6)
    iu, ju = onp.triu_indices(O, k=1)
    C = Lam4[iu, :, ju, :]
    d = _prior_delta(problem, state)
    g = -(problem.prior_Lambda @ d)
    if problem.prior_b is not None:
        g = g + problem.prior_b
    return (
        diag,
        (C, jnp.asarray(iu, jnp.int32), jnp.asarray(ju, jnp.int32)),
        g.reshape(O, 6),
    )


def _local_pose_view(state: BAState, num_poses: int, axis_name: str | None):
    """(q, p, nb) for the ELL bank: the full state single-device, or this
    device's contiguous pose block when sharded (the bank is local)."""
    q, nb = schur.local_pose_block(state.q, num_poses, axis_name)
    p, _ = schur.local_pose_block(state.p, num_poses, axis_name)
    return q, p, nb


def ba_cost(problem: BAProblem, state: BAState,
            huber_delta: float | None = None,
            axis_name: str | None = None) -> jnp.ndarray:
    """Weighted (optionally Huber-robustified) reprojection cost +
    pose-graph factor cost + a fixed penalty per behind-camera
    observation. ``axis_name``: the observation bank is a per-device pose
    block (sharded ELL mode) — the observation cost psums over the mesh
    while the (replicated) pose-graph cost is added once."""
    if problem.ell is not None:
        N = problem.free_pose.shape[0]
        q, p, nb = _local_pose_view(state, N, axis_name)
        r, valid = reprojection_residual_ell(
            problem.K, q, p, state.lm,
            problem.lm_idx.reshape(nb, -1),
            problem.uv.T.reshape(2, nb, -1),
        )
        r = r.reshape(2, -1)
        valid = valid.reshape(-1)
    else:
        if axis_name is not None:
            raise ValueError("sharded BA requires the pose-ELL layout")
        r, valid = reprojection_residual_cm(
            problem.K, state.q, state.p, state.lm,
            problem.pose_idx, problem.lm_idx, problem.uv.T,
        )
    sq = r[0] * r[0] + r[1] * r[1]
    if huber_delta is None:
        c = 0.5 * jnp.sum(problem.weight * sq)
    else:
        c = jnp.sum(problem.weight * _huber_rho(sq, huber_delta))
    c = c + _CHEIRALITY_PENALTY * jnp.sum(
        problem.weight * (~valid).astype(r.dtype)
    )
    if axis_name is not None:
        c = jax.lax.psum(c, axis_name)
    c = c + pose_graph.pose_graph_cost(
        state.q, state.p, problem.between, problem.priors
    )
    if problem.prior_Lambda is not None:
        c = c + _prior_cost(problem, state)
    return c


def _linearize_ba(problem: BAProblem, state: BAState, lam,
                  huber_delta: float | None = None,
                  axis_name: str | None = None) -> schur.SchurBlocks:
    """Linearize every factor (reprojection + pose-graph + marginal head
    prior) at ``state`` and assemble damped normal-equation blocks. Shared
    by the LM iteration and by :func:`ba_reduced_hessian` (``lam=0``)."""
    N = problem.free_pose.shape[0]
    M = state.lm.shape[0]

    if problem.ell is not None:
        q_loc, p_loc, nb = _local_pose_view(state, N, axis_name)
        r, J_pose, J_lm, valid = linearize_reprojection_ell(
            problem.K, q_loc, p_loc, state.lm,
            problem.lm_idx.reshape(nb, -1),
            problem.uv.T.reshape(2, nb, -1),
        )
        w = problem.weight.reshape(nb, -1) * valid.astype(r.dtype)
    else:
        r, J_pose, J_lm, valid = linearize_reprojection_cm(
            problem.K, state.q, state.p, state.lm,
            problem.pose_idx, problem.lm_idx, problem.uv.T,
        )
        w = problem.weight * valid.astype(r.dtype)
    if huber_delta is not None:
        # IRLS weight rho'(r)/|r| = min(1, delta/|r|)
        rn = jnp.sqrt(jnp.maximum(r[0] * r[0] + r[1] * r[1], 1e-20))
        w = w * jnp.minimum(1.0, huber_delta / rn)

    # pose-graph factor contributions (odometry between-factors + priors)
    extra_Hpp = None
    extra_bp = None
    couplings = None
    if problem.between is not None:
        rb, Ji, Jj = pose_graph.linearize_between(
            problem.between, state.q, state.p
        )
        JiT = jnp.swapaxes(Ji, -1, -2)
        JjT = jnp.swapaxes(Jj, -1, -2)
        bi, bj = problem.between.i, problem.between.j
        extra_Hpp = jax.ops.segment_sum(
            JiT @ Ji, bi, num_segments=N
        ) + jax.ops.segment_sum(JjT @ Jj, bj, num_segments=N)
        extra_bp = jax.ops.segment_sum(
            -jnp.einsum("fij,fj->fi", JiT, rb), bi, num_segments=N
        ) + jax.ops.segment_sum(
            -jnp.einsum("fij,fj->fi", JjT, rb), bj, num_segments=N
        )
        couplings = (JiT @ Jj, bi, bj)
    if problem.priors is not None:
        rp, Jp = pose_graph.linearize_prior(problem.priors, state.q, state.p)
        JpT = jnp.swapaxes(Jp, -1, -2)
        pi = problem.priors.i
        add_H = jax.ops.segment_sum(JpT @ Jp, pi, num_segments=N)
        add_b = jax.ops.segment_sum(
            -jnp.einsum("fij,fj->fi", JpT, rp), pi, num_segments=N
        )
        extra_Hpp = add_H if extra_Hpp is None else extra_Hpp + add_H
        extra_bp = add_b if extra_bp is None else extra_bp + add_b

    if problem.prior_Lambda is not None:
        O = problem.prior_q.shape[0]
        dtype = r.dtype
        Hp_add, (Cp, cpi, cpj), bp_add = _prior_terms(problem, state)
        if extra_Hpp is None:
            extra_Hpp = jnp.zeros((N, 6, 6), dtype)
            extra_bp = jnp.zeros((N, 6), dtype)
        extra_Hpp = extra_Hpp.at[:O].add(Hp_add)
        extra_bp = extra_bp.at[:O].add(bp_add)
        if couplings is None:
            couplings = (Cp, cpi, cpj)
        else:
            C0, ci0, cj0 = couplings
            couplings = (
                jnp.concatenate([C0, Cp]),
                jnp.concatenate([ci0, cpi]),
                jnp.concatenate([cj0, cpj]),
            )

    return schur.build_normal_equations(
        r, J_pose, J_lm, w, problem.pose_idx, problem.lm_idx,
        N, M, lam, problem.free_pose,
        extra_Hpp=extra_Hpp, extra_bp=extra_bp, couplings=couplings,
        ell=problem.ell, axis_name=axis_name,
    )


@f32_matmuls
def ba_reduced_hessian(problem: BAProblem, state: BAState,
                       huber_delta: float | None = None):
    """Dense landmark-eliminated (reduced) Hessian + rhs of the BA graph at
    ``state``, undamped: ``(H (N*6, N*6), b (N*6,))`` with ``b = -grad``.
    The window-marginalization primitive (pipelines.windowed_ba); no gauge
    projection beyond ``free_pose`` is applied."""
    blocks = _linearize_ba(problem, state, 0.0, huber_delta, None)
    S = schur.dense_reduced_system(blocks)
    b = schur.schur_rhs(blocks)
    N = b.shape[0]
    return S.reshape(N * 6, N * 6), b.reshape(-1)


def _lm_iteration(problem: BAProblem, cfg: BAConfig, carry, _,
                  axis_name: str | None = None):
    state, lam, cost, converged = carry
    N = problem.free_pose.shape[0]
    M = state.lm.shape[0]
    blocks = _linearize_ba(problem, state, lam, cfg.huber_delta, axis_name)
    rhs = schur.schur_rhs(blocks)
    if _use_dense_schur(
        cfg, N, 6, 6, M, jnp.dtype(rhs.dtype).itemsize, axis_name
    ):
        dx_pose = schur.dense_schur_solve(blocks, rhs)
        cg_iterations = jnp.asarray(0, jnp.int32)
    else:
        S4 = None
        if _use_explicit_s(
            cfg, N, 6, M, jnp.dtype(rhs.dtype).itemsize, problem.ell,
            axis_name, problem.bands,
        ):
            op_dtype = jnp.bfloat16 if cfg.s_op_dtype == "bf16" else None
            S4 = schur.dense_reduced_system(
                blocks, max_g_bytes=cfg.dense_max_g_bytes,
                op_dtype=op_dtype, bands=problem.bands,
            )
        cg = schur.pcg(
            blocks, rhs, max_iters=cfg.cg_max_iters, tol=cfg.cg_tol, S4=S4
        )
        dx_pose = cg.x
        cg_iterations = cg.iterations
    dx_lm = schur.back_substitute(blocks, dx_pose)

    free = problem.free_pose[:, None]
    new_state = BAState(
        q=so3.quat_boxplus(state.q, dx_pose[:, 0:3] * free),
        p=state.p + dx_pose[:, 3:6] * free,
        lm=state.lm + dx_lm,
    )
    new_cost = ba_cost(problem, new_state, cfg.huber_delta, axis_name)
    step_ok = jnp.isfinite(jnp.sum(dx_pose)) & jnp.isfinite(jnp.sum(dx_lm))
    accept = (new_cost < cost) & ~converged & jnp.isfinite(new_cost) & step_ok
    decrease = cost - new_cost
    converged = converged | (
        accept
        & (decrease < cfg.relative_decrease_tol * cost + cfg.absolute_decrease_tol)
    )
    state = jax.tree.map(
        lambda new, old: jnp.where(accept, new, old), new_state, state
    )
    cost = jnp.where(accept, new_cost, cost)
    lam = jnp.where(
        converged,
        lam,
        jnp.clip(
            jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up),
            cfg.min_lambda,
            cfg.max_lambda,
        ),
    )
    return (state, lam, cost, converged), (cost, accept, cg_iterations)


# TPU matmuls default to bf16 passes - solver-grade numerics (normal
# equations, CG dot products, Cholesky factors) need full f32 accumulation
# or LM steps silently degrade on device.
@f32_matmuls
def solve_ba(problem: BAProblem, state: BAState, cfg: BAConfig = BAConfig(),
             axis_name: str | None = None):
    """Run LM to convergence budget. Returns (state, info dict of arrays).

    jit-able; wrap in jax.jit for production use. ``axis_name``: run in
    sharded ELL mode inside shard_map (see
    :func:`libwave_tpu.parallel.dist_ba.solve_ba_sharded`, the public
    entry point) — the full trust-region LM loop, with each device owning
    one contiguous pose block of observations.
    """
    lam0 = jnp.asarray(cfg.init_lambda, dtype=state.p.dtype)
    cost0 = ba_cost(problem, state, cfg.huber_delta, axis_name)
    carry = (state, lam0, cost0, jnp.asarray(False))
    carry, (costs, accepts, cg_iters) = jax.lax.scan(
        lambda c, x: _lm_iteration(problem, cfg, c, x, axis_name),
        carry,
        None,
        length=cfg.max_iterations,
    )
    state, lam, cost, _ = carry
    info = {
        "initial_cost": cost0,
        "final_cost": cost,
        "costs": costs,
        "accepted": accepts,
        "cg_iterations": cg_iters,
        "final_lambda": lam,
    }
    return state, info


def ba_from_dataset(
    dataset, noise_pixels=0.0, key=None, max_obs=None,
    with_odometry=False, with_priors=False,
):
    """Build a BAProblem + ground-truth BAState from a synthetic VoDataset
    (the pattern of the reference's ba_test.cpp:62-193: dataset -> addCamera
    per state -> solve). Camera poses are q_GC = q_GB * q_BC.

    Only frames where the camera triggered become poses. Returns
    (problem, gt_state) — callers perturb gt_state for the initial guess.
    """
    import numpy as np

    from libwave_tpu.sim.vo_dataset import q_BC

    vis = np.asarray(dataset.visible)
    trig = np.asarray(dataset.frame_has_obs)
    frames = np.nonzero(trig)[0]
    M = dataset.landmarks.shape[0]

    q_GB = np.asarray(dataset.robot_q_GB)[frames]
    p_GB = np.asarray(dataset.robot_p_GB)[frames]
    qbc = np.asarray(q_BC(dataset.robot_q_GB.dtype))
    q_GC = np.asarray(so3.quat_multiply(jnp.asarray(q_GB), jnp.asarray(qbc)))

    pose_idx, lm_idx, uv = [], [], []
    for fi, f in enumerate(frames):
        ids = np.nonzero(vis[f])[0]
        for j in ids:
            pose_idx.append(fi)
            lm_idx.append(j)
            uv.append(np.asarray(dataset.pixels)[f, j])
    pose_idx = np.asarray(pose_idx, dtype=np.int32)
    lm_idx = np.asarray(lm_idx, dtype=np.int32)
    uv = np.asarray(uv)
    if key is not None and noise_pixels > 0:
        uv = uv + noise_pixels * np.asarray(
            jax.random.normal(key, uv.shape, dtype=jnp.float64)
        )
    if max_obs is not None and len(pose_idx) > max_obs:
        pose_idx, lm_idx, uv = (
            pose_idx[:max_obs], lm_idx[:max_obs], uv[:max_obs]
        )

    N = len(frames)
    free = np.ones(N)
    free[:2] = 0.0  # gauge: fix first two poses (ba_test.cpp:156-161)

    gt = BAState(
        q=jnp.asarray(q_GC), p=jnp.asarray(p_GB), lm=dataset.landmarks
    )

    between = None
    priors = None
    if with_odometry:
        # ground-truth relative poses with tight sigmas, mirroring
        # gtsam_offline_example.cpp:62-74 (rot 1e-3, trans 1e-4)
        between = pose_graph.between_from_trajectory(
            gt.q, gt.p, sigmas_rot=1e-3, sigmas_trans=1e-4
        )
    if with_priors:
        # priors on the first two poses (offline_example.cpp:123-130:
        # sigmas rot 1e-5, trans 1e-6); poses then stay free (soft gauge)
        free[:] = 1.0
        priors = pose_graph.PriorBank(
            i=jnp.asarray([0, 1], dtype=jnp.int32),
            q=gt.q[:2],
            p=gt.p[:2],
            sqrt_info=jnp.concatenate(
                [
                    jnp.full((2, 3), 1e5, dtype=uv.dtype),
                    jnp.full((2, 3), 1e6, dtype=uv.dtype),
                ],
                axis=-1,
            ),
        )

    pose_ell, lm_ell, pad_mask, ell, uv_p = schur.pack_observations(
        pose_idx, lm_idx, N, M, uv
    )
    problem = BAProblem(
        K=jnp.asarray(dataset.camera_K),
        pose_idx=pose_ell,
        lm_idx=lm_ell,
        uv=uv_p,
        weight=pad_mask.astype(uv.dtype),
        free_pose=jnp.asarray(free, dtype=uv.dtype),
        between=between,
        priors=priors,
        ell=ell,
    )
    return problem, gt
