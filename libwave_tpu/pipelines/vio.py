"""Visual-inertial odometry: full factor graph with Schur elimination.

The flagship end-to-end estimator (BASELINE.md config 4: "full VIO factor
graph — reprojection + IMU preintegration, sliding window"). The reference
assembles the equivalent graph in GTSAM (projection factors + combined-IMU
factors over PoseVel/Bias states, preint_imu_factor.hpp:20); here the whole
graph solves on device:

- keyframe states are 15-dim blocks [pose(6), vel(3), bg(3), ba(3)]
  (linear velocity only — the angular rate is not observable from this
  factor set and the reference's combined-IMU states likewise only use
  linear velocity in the IMU residual);
- reprojection factors eliminate landmarks via the Schur machinery
  (3x3 block inverses + matrix-free PCG), exactly as pure BA;
- IMU preintegration factors and bias random-walk factors enter as
  pose-pose couplings in the reduced camera system;
- the LM loop is one lax.scan; everything jits and shards.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from libwave_tpu.geometry import se3, so3
from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.optim import schur
from libwave_tpu.optim.imu import PreintegratedImu, imu_residual, imu_sqrt_info
from libwave_tpu.optim.reprojection import (
    linearize_reprojection_ell,
    reprojection_residual_ell,
)
from libwave_tpu.utils.precision import allow_explicit_f64, f32_matmuls

D = 15  # keyframe tangent dim: [pose(6), vel(3), bg(3), ba(3)]

# Behind-camera penalty per observation — see vio_cost for the sizing
# rationale (must dominate any single-step decrease of the other factors;
# the cost total accumulates in f64 so this magnitude stays resolvable).
_CHEIRALITY_PENALTY = 1e10

# permit explicit f64 arrays (mixed-precision stiff-Hessian path) without
# changing any implicit/default dtype behavior — see utils.precision
allow_explicit_f64()


class VIOState(NamedTuple):
    """Keyframe states (N keyframes, BODY frame) + landmarks."""

    q: jnp.ndarray  # (N, 4) body-to-world orientation
    p: jnp.ndarray  # (N, 3)
    v: jnp.ndarray  # (N, 3) world-frame linear velocity
    bg: jnp.ndarray  # (N, 3) gyro bias
    ba: jnp.ndarray  # (N, 3) accel bias
    lm: jnp.ndarray  # (M, 3)

    def retract(self, dx: jnp.ndarray, dlm: jnp.ndarray, free) -> "VIOState":
        """Product-manifold retraction [omega, dp_world, dv, dbg, dba] —
        consistent with the reprojection Jacobians (same convention as the
        BA solver)."""
        dx = dx * (free[:, None] if free.ndim == 1 else free)
        return VIOState(
            q=so3.quat_boxplus(self.q, dx[:, 0:3]),
            p=self.p + dx[:, 3:6],
            v=self.v + dx[:, 6:9],
            bg=self.bg + dx[:, 9:12],
            ba=self.ba + dx[:, 12:15],
            lm=self.lm + dlm,
        )


class VIOProblem(NamedTuple):
    K: jnp.ndarray  # (3, 3) intrinsics
    # reprojection bank, pose-ELL order (schur.pack_observations)
    pose_idx: jnp.ndarray  # (K_,)
    lm_idx: jnp.ndarray  # (K_,)
    uv: jnp.ndarray  # (K_, 2)
    obs_weight: jnp.ndarray  # (K_,) zero on padding slots
    # IMU bank: one preintegrated window per consecutive keyframe pair,
    # stacked (pytree of arrays with leading axis F)
    pim: PreintegratedImu  # leading dim F on every field
    imu_i: jnp.ndarray  # (F,)
    imu_j: jnp.ndarray  # (F,)
    imu_sqrt_info: jnp.ndarray  # (F, 9, 9)
    # bias random walk sqrt-information (per-step, 6-dim [bg, ba])
    bias_walk_sqrt_info: jnp.ndarray  # (6,)
    free_pose: jnp.ndarray  # (N,)
    q_BC: jnp.ndarray = None  # (4,) camera-from-body extrinsic rotation
    # zero-mean bias prior per keyframe (weak, regularizes the weakly
    # observable bias directions — standard VIO practice)
    bias_prior_sqrt_info: jnp.ndarray = None  # (6,) or None
    ell: object = None  # schur.EllLayout (pose-ELL fast path)
    pixel_sigma: float = 1.0
    gravity: tuple = (0.0, 0.0, -9.81)
    # Dense marginal prior on the HEAD O keyframes (sliding-window
    # marginalization, pipelines.windowed_vio): cost 0.5 d^T Lambda d -
    # b^T d with d the (O*15,) tangent delta of states [0, O) from the
    # prior mean, in retract() order [omega, dp, dv, dbg, dba]. The
    # reference's GTSAM solves keep the whole graph instead
    # (gtsam_offline_example.cpp:133); the prior is what lets bounded
    # windows carry the information a global solve would retain.
    prior_Lambda: jnp.ndarray = None  # (O*15, O*15)
    prior_b: jnp.ndarray = None  # (O*15,) reduced gradient at the mean
    prior_q: jnp.ndarray = None  # (O, 4) mean orientations
    prior_p: jnp.ndarray = None  # (O, 3)
    prior_v: jnp.ndarray = None  # (O, 3)
    prior_bg: jnp.ndarray = None  # (O, 3)
    prior_ba: jnp.ndarray = None  # (O, 3)


@dataclasses.dataclass(frozen=True)
class VIOConfig:
    max_iterations: int = 15
    cg_max_iters: int = 60
    cg_tol: float = 1e-6
    init_lambda: float = 1e-4
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    # Huber scale on the *whitened* reprojection norm (units of
    # pixel_sigma), None = plain L2. Applied by IRLS reweighting; real
    # feature tracks carry outliers that a quadratic loss lets dominate.
    huber_delta: float = None
    # Reduced-system solver (see optim.ba.BAConfig): dense Schur is
    # especially valuable for VIO, where the stiff IMU chain makes
    # block-Jacobi PCG propagate corrections ~one keyframe per iteration.
    solver: str = "auto"
    dense_max_pose_dim: int = 4096
    dense_max_g_bytes: float = 1.5e9
    # auto-only landmark cap (see optim.ba.BAConfig.dense_max_landmarks)
    dense_max_landmarks: int = 1500
    # Mixed-precision stiff-Hessian path ("float64"): sum the pose-block
    # normal equations and factorize the reduced system in f64 while all
    # linearization and the G/A MXU matmuls stay f32. Required for f32
    # correctness when the IMU whitening is stiff (20 Hz keyframes make
    # IMU Hessian entries ~7e8; co-located vision information ~1e2 is
    # BELOW f32 eps of that and annihilates — the on-chip solve then
    # silently diverges while CPU f64 is fine). Dense-solver path only;
    # ignored by PCG. Measured v5e: f64 cholesky at N*D=1800 is 170 ms vs
    # 30 ms f32 — the windowed 20 Hz pipeline enables this automatically
    # (windowed_vio auto-gates on max |imu_sqrt_info| > 3e4).
    hessian_dtype: str | None = None


def _imu_linearize(problem: VIOProblem, state: VIOState,
                   axis_name: str | None = None):
    """Residuals + Jacobians of all IMU factors wrt the 15-dim blocks.

    Returns (r (F, 9), Ji (F, 9, 15), Jj (F, 9, 15)) — whitened.

    ``axis_name`` (expert-parallel factor placement, SURVEY §2.8 "EP"):
    each device linearizes an F/n_dev slice of the bank — the jacfwd
    through the preintegration residual is the expensive part — and the
    results all_gather so the (replicated) normal-equation assembly stays
    local. Requires F divisible by the axis size (the partitioner pads
    with zero-information factors, which the S = 0 whitening silences).
    """
    g = jnp.asarray(problem.gravity, state.p.dtype)

    def one(pim, i, j, S):
        qi, pi, vi = state.q[i], state.p[i], state.v[i]
        qj, pj, vj = state.q[j], state.p[j], state.v[j]
        bgi, bai = state.bg[i], state.ba[i]

        def res(xi_i, xi_j):
            # product retraction, matching VIOState.retract
            r = imu_residual(
                pim,
                so3.quat_boxplus(qi, xi_i[0:3]), pi + xi_i[3:6],
                vi + xi_i[6:9],
                so3.quat_boxplus(qj, xi_j[0:3]), pj + xi_j[3:6],
                vj + xi_j[6:9],
                bgi + xi_i[9:12], bai + xi_i[12:15],
                gravity=g,
            )
            return S @ r

        z = jnp.zeros(D, state.p.dtype)
        r = res(z, z)
        Ji = jax.jacfwd(res, argnums=0)(z, z)
        Jj = jax.jacfwd(res, argnums=1)(z, z)
        return r, Ji, Jj

    if axis_name is None:
        return jax.vmap(one)(problem.pim, problem.imu_i, problem.imu_j,
                             problem.imu_sqrt_info)

    n_dev = jax.lax.axis_size(axis_name)
    F = problem.imu_i.shape[0]
    fb = F // n_dev
    me = jax.lax.axis_index(axis_name)
    sl = lambda x: jax.lax.dynamic_slice_in_dim(x, me * fb, fb, axis=0)
    r, Ji, Jj = jax.vmap(one)(
        jax.tree.map(sl, problem.pim), sl(problem.imu_i),
        sl(problem.imu_j), sl(problem.imu_sqrt_info),
    )
    gather = lambda x: jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    return gather(r), gather(Ji), gather(Jj)


def _bias_walk_linearize(problem: VIOProblem, state: VIOState):
    """Bias random-walk between consecutive keyframes: r = [bg_j - bg_i,
    ba_j - ba_i] * sqrt_info. Closed-form Jacobians (constant). Factors
    whose IMU whitening is all-zero are padding (EP bank padding) and are
    silenced here too."""
    i, j = problem.imu_i, problem.imu_j
    si = problem.bias_walk_sqrt_info
    live = (
        jnp.sum(jnp.abs(problem.imu_sqrt_info), axis=(-1, -2)) > 0
    ).astype(state.p.dtype)
    r = jnp.concatenate(
        [state.bg[j] - state.bg[i], state.ba[j] - state.ba[i]], axis=-1
    ) * si * live[:, None]
    F = i.shape[0]
    dtype = state.p.dtype
    Ji = jnp.zeros((F, 6, D), dtype)
    Ji = Ji.at[:, 0:3, 9:12].set(-si[0:3, None] * jnp.eye(3, dtype=dtype))
    Ji = Ji.at[:, 3:6, 12:15].set(-si[3:6, None] * jnp.eye(3, dtype=dtype))
    Ji = Ji * live[:, None, None]
    Jj = -Ji
    return r, Ji, Jj


def _camera_quats(problem, q_body):
    if problem.q_BC is None:
        return q_body
    return so3.quat_multiply(q_body, problem.q_BC)


def _prior_delta(problem: VIOProblem, state: VIOState) -> jnp.ndarray:
    """Tangent delta (O*15,) of the head states from the prior mean, in
    retract() coordinate order. First-order (identity) Jacobian — the
    standard marginalization-prior linearization; the overlap states move
    little between windows so the O(|d|^2) error is negligible."""
    O = problem.prior_q.shape[0]
    return jnp.concatenate(
        [
            so3.quat_boxminus(state.q[:O], problem.prior_q),
            state.p[:O] - problem.prior_p,
            state.v[:O] - problem.prior_v,
            state.bg[:O] - problem.prior_bg,
            state.ba[:O] - problem.prior_ba,
        ],
        axis=-1,
    ).reshape(-1)


def _prior_cost(problem: VIOProblem, state: VIOState) -> jnp.ndarray:
    d = _prior_delta(problem, state)
    c = 0.5 * d @ (problem.prior_Lambda @ d)
    if problem.prior_b is not None:
        c = c - problem.prior_b @ d
    return c


def _prior_terms(problem: VIOProblem, state: VIOState):
    """Normal-equation contributions of the dense head prior: per-keyframe
    diagonal blocks, upper-triangle cross couplings, and the rhs. Returns
    (Hpp_add (O, D, D), (C, ci, cj), bp_add (O, D))."""
    import numpy as onp

    O = problem.prior_q.shape[0]
    Lam4 = problem.prior_Lambda.reshape(O, D, O, D)
    diag = Lam4[jnp.arange(O), :, jnp.arange(O), :]  # (O, D, D)
    iu, ju = onp.triu_indices(O, k=1)
    C = Lam4[iu, :, ju, :]  # (O*(O-1)/2, D, D)
    d = _prior_delta(problem, state)
    g = -(problem.prior_Lambda @ d)
    if problem.prior_b is not None:
        g = g + problem.prior_b
    return (
        diag,
        (C, jnp.asarray(iu, jnp.int32), jnp.asarray(ju, jnp.int32)),
        g.reshape(O, D),
    )


def vio_cost(problem: VIOProblem, state: VIOState,
             axis_name: str | None = None,
             huber_delta: float | None = None) -> jnp.ndarray:
    """``axis_name``: sharded ELL mode — the reprojection bank is this
    device's keyframe block; its cost psums over the mesh while the
    (replicated) IMU/bias factor costs are added once. ``huber_delta``
    robustifies the whitened reprojection norm (VIOConfig.huber_delta)."""
    from libwave_tpu.optim.ba import _huber_rho

    N = problem.free_pose.shape[0]
    q_cam, nb = schur.local_pose_block(
        _camera_quats(problem, state.q), N, axis_name
    )
    p_loc, _ = schur.local_pose_block(state.p, N, axis_name)
    r, valid = reprojection_residual_ell(
        problem.K,
        q_cam,  # (Nb, 4) camera orientations
        p_loc,
        state.lm,
        problem.lm_idx.reshape(nb, -1),
        problem.uv.T.reshape(2, nb, -1),
    )
    wf = problem.obs_weight.reshape(nb, -1)
    wv = wf * valid.astype(r.dtype)
    sq_white = (r[0] * r[0] + r[1] * r[1]) / problem.pixel_sigma**2
    # The TOTAL accumulates in f64 (scalar adds — free): cost components
    # span ~10 decades when cheirality penalties or stiff-IMU init
    # residuals are present, and LM's accept test needs to resolve
    # ~1e1-scale decreases against them (f32 resolution at 1e9 is ~1e2 —
    # acceptance would be decided by rounding).
    if huber_delta is None:
        c = 0.5 * jnp.sum(wv * sq_white).astype(jnp.float64)
    else:
        c = jnp.sum(wv * _huber_rho(sq_white, huber_delta)).astype(
            jnp.float64
        )
    # Behind-camera observations carry a fixed penalty per observation.
    # Its magnitude is a DESIGN constraint, not a tuning knob: it must
    # exceed any cost decrease a single LM step can otherwise buy, or the
    # accept test will trade landmarks pushed behind cameras for progress
    # on other factors — and the penalty's zero gradient makes that
    # near-irreversible, so the window ends with trapped invalid
    # landmarks and the marginalized prior inherits the damage. Measured
    # (20 Hz stiff windows, pass-2 inits with ~7e8 stitched-IMU residual):
    # at 1e6 the solver accepted steps trading ~24 crossings for the IMU
    # relaxation and chained windows collapsed (ATE 1.55 m); at 1e10 no
    # crossing is ever worth it and LM finds the damped path instead.
    c = c + _CHEIRALITY_PENALTY * jnp.sum(
        wf * (~valid).astype(r.dtype)
    ).astype(jnp.float64)
    if axis_name is not None:
        c = jax.lax.psum(c, axis_name)
    r_imu, _, _ = _imu_linearize(problem, state, axis_name)
    c = c + 0.5 * jnp.sum(r_imu * r_imu).astype(jnp.float64)
    r_bw, _, _ = _bias_walk_linearize(problem, state)
    c = c + 0.5 * jnp.sum(r_bw * r_bw).astype(jnp.float64)
    if problem.bias_prior_sqrt_info is not None:
        si = problem.bias_prior_sqrt_info
        rp = jnp.concatenate([state.bg, state.ba], axis=-1) * si
        c = c + 0.5 * jnp.sum(rp * rp).astype(jnp.float64)
    if problem.prior_Lambda is not None:
        c = c + _prior_cost(problem, state).astype(jnp.float64)
    return c


def _linearize_vio(problem: VIOProblem, state: VIOState, lam,
                   huber_delta: float | None = None,
                   axis_name: str | None = None,
                   hessian_dtype: str | None = None) -> schur.SchurBlocks:
    """Linearize every factor (reprojection + IMU + bias walk + bias prior
    + marginal head prior) at ``state`` and assemble damped normal-equation
    blocks. Shared by the LM iteration and by
    :func:`vio_reduced_hessian` (marginalization, with ``lam=0``).

    ``hessian_dtype``: widen the pose-block sums (IMU/bias/prior extras +
    vision Hpp) to this dtype before they meet — the stiff-chain f32
    annihilation fix (VIOConfig.hessian_dtype). Individual factor blocks
    stay f32 (each is relatively precise); only their summation widens."""
    N = problem.free_pose.shape[0]
    M = state.lm.shape[0]
    dtype = state.p.dtype

    # reprojection bank, pose-ELL component-major: the Jacobian touches
    # only the [omega, dp] 6 of the 15 tangent dims (structural zeros are
    # skipped via build_normal_equations' pose_dim).
    # States are BODY poses; the camera orientation is q_body * q_BC with
    # zero lever arm (the reference camera sits at the body origin,
    # VoDataset.cpp:237-246). A right perturbation phi on the body maps to
    # R_BC^T phi on the camera, so J_omega_body = J_omega_cam @ R_BC^T.
    q_cam, nb = schur.local_pose_block(
        _camera_quats(problem, state.q), N, axis_name
    )
    p_loc, _ = schur.local_pose_block(state.p, N, axis_name)
    r, J6, J_lm, valid = linearize_reprojection_ell(
        problem.K,
        q_cam,
        p_loc,
        state.lm,
        problem.lm_idx.reshape(nb, -1),
        problem.uv.T.reshape(2, nb, -1),
    )
    if problem.q_BC is not None:
        # J_omega_body[a, i] = sum_b J_omega_cam[a, b] R_BC[i, b]
        R_BC = so3.quat_to_rot(problem.q_BC)
        Jw = jnp.stack(
            [
                jnp.stack(
                    [
                        sum(J6[a, b] * R_BC[i, b] for b in range(3))
                        for i in range(3)
                    ]
                )
                for a in range(2)
            ]
        )
        J6 = jnp.concatenate([Jw, J6[:, 3:6]], axis=1)
    w = (
        problem.obs_weight.reshape(nb, -1)
        * valid.astype(dtype)
        / problem.pixel_sigma**2
    )
    if huber_delta is not None:
        # IRLS weight rho'(s)/1 = min(1, delta/|r_white|)
        rn = jnp.sqrt(
            jnp.maximum(r[0] * r[0] + r[1] * r[1], 1e-20)
        ) / problem.pixel_sigma
        w = w * jnp.minimum(1.0, huber_delta / rn)

    # IMU + bias-walk factors -> diagonal contributions + couplings;
    # the IMU jacfwd linearization is sharded over the mesh (EP placement)
    r_imu, Ji, Jj = _imu_linearize(problem, state, axis_name)
    r_bw, Bi, Bj = _bias_walk_linearize(problem, state)
    bi, bj = problem.imu_i, problem.imu_j

    JiT, JjT = jnp.swapaxes(Ji, -1, -2), jnp.swapaxes(Jj, -1, -2)
    BiT, BjT = jnp.swapaxes(Bi, -1, -2), jnp.swapaxes(Bj, -1, -2)
    sdt = jnp.dtype(hessian_dtype) if hessian_dtype is not None else None
    wide = (lambda x: x.astype(sdt)) if sdt is not None else (lambda x: x)
    extra_Hpp = (
        jax.ops.segment_sum(wide(JiT @ Ji + BiT @ Bi), bi, num_segments=N)
        + jax.ops.segment_sum(wide(JjT @ Jj + BjT @ Bj), bj, num_segments=N)
    )
    extra_bp = jax.ops.segment_sum(
        wide(-jnp.einsum("fij,fj->fi", JiT, r_imu)
             - jnp.einsum("fij,fj->fi", BiT, r_bw)),
        bi, num_segments=N,
    ) + jax.ops.segment_sum(
        wide(-jnp.einsum("fij,fj->fi", JjT, r_imu)
             - jnp.einsum("fij,fj->fi", BjT, r_bw)),
        bj, num_segments=N,
    )
    C_bank, ci_bank, cj_bank = wide(JiT @ Jj + BiT @ Bj), bi, bj

    if problem.bias_prior_sqrt_info is not None:
        # (6,) shared across keyframes, or (N, 6) per-keyframe — the
        # windowed marginalization restricts the prior to out-frames via
        # the per-keyframe form so overlap keyframes' bias priors are not
        # double-counted across the chain (counted once, in the window
        # that marginalizes them).
        si = problem.bias_prior_sqrt_info
        si2_n = jnp.broadcast_to(si * si, (N, 6))  # (N, 6)
        diag_n = jnp.concatenate(
            [jnp.zeros((N, 9), dtype), si2_n], axis=-1
        )  # (N, D)
        extra_Hpp = extra_Hpp + wide(
            jnp.eye(D, dtype=dtype)[None] * diag_n[:, None, :]
        )
        rp = jnp.concatenate([state.bg, state.ba], axis=-1)  # (N, 6)
        extra_bp = extra_bp - wide(jnp.concatenate(
            [jnp.zeros((N, 9), dtype), rp * si2_n], axis=-1
        ))

    if problem.prior_Lambda is not None:
        O = problem.prior_q.shape[0]
        Hp_add, (Cp, cpi, cpj), bp_add = _prior_terms(problem, state)
        extra_Hpp = extra_Hpp.at[:O].add(wide(Hp_add))
        extra_bp = extra_bp.at[:O].add(wide(bp_add))
        C_bank = jnp.concatenate([C_bank, wide(Cp)])
        ci_bank = jnp.concatenate([ci_bank, cpi])
        cj_bank = jnp.concatenate([cj_bank, cpj])

    return schur.build_normal_equations(
        r, J6, J_lm, w, problem.pose_idx, problem.lm_idx,
        N, M, lam, problem.free_pose,
        extra_Hpp=extra_Hpp, extra_bp=extra_bp,
        couplings=(C_bank, ci_bank, cj_bank),
        ell=problem.ell, pose_dim=D, axis_name=axis_name,
        sum_dtype=sdt,
    )


@f32_matmuls
def vio_reduced_hessian(problem: VIOProblem, state: VIOState,
                        huber_delta: float | None = None,
                        hessian_dtype: str | None = None):
    """Dense landmark-eliminated (reduced) Hessian + gradient-side rhs of
    the full VIO graph at ``state``, undamped: ``(H (N*D, N*D), b (N*D,))``
    with ``b = -grad``. This is the window-marginalization primitive
    (pipelines.windowed_vio): marginalizing states out of H/b yields the
    Schur-complement prior the next window carries. jit-able; no gauge
    projection is applied (callers anchor via the prior chain).
    ``hessian_dtype``: widen the stiff pose-block sums (see VIOConfig)."""
    blocks = _linearize_vio(problem, state, 0.0, huber_delta, None,
                            hessian_dtype)
    S = schur.dense_reduced_system(blocks)
    b = schur.schur_rhs(blocks)
    N = b.shape[0]
    return S.reshape(N * D, N * D), b.reshape(-1)


@f32_matmuls
def vio_marginalize_device(problem: VIOProblem, state: VIOState,
                           keep_dim: int,
                           huber_delta: float | None = None,
                           hessian_dtype: str | None = None):
    """Schur-complement marginalization computed ON DEVICE: the reduced
    Hessian never leaves the chip — only the (keep_dim, keep_dim) prior
    and its rhs do. Through a remote TPU runtime this is the difference
    between pulling ~13 MB and ~100 KB per window (measured: host-side
    marginalization dominated the MH_01-scale wall clock).

    Equilibrated Cholesky in the (possibly widened) Hessian dtype:
    ``hessian_dtype="float64"`` gives stiff chains the f64 cancellation
    headroom ON DEVICE (the round-4 guidance to keep the host-f64 path
    there no longer applies). Returns ``(Lambda, b_m)`` — apply the
    host-side PSD projection before use (windowed_vio does; it also
    checks finiteness and falls back to the host-f64 complement if the
    factorization NaN'd)."""
    blocks = _linearize_vio(problem, state, 0.0, huber_delta, None,
                            hessian_dtype)
    S = schur.dense_reduced_system(blocks)
    b = schur.schur_rhs(blocks)
    N = b.shape[0]
    n = N * D
    H = S.reshape(n, n)
    bf = b.reshape(-1)
    cut = n - keep_dim
    Hoo = H[:cut, :cut]
    dg = jnp.diagonal(Hoo)
    # per-coordinate Marquardt-scaled ridge + Jacobi equilibration (same
    # rationale as dense_schur_solve / schur_marginalize); the widened
    # (f64) path factorizes in f32 + refines with f64 residuals
    # (schur.chol_solve_mixed) — f64 Cholesky is 21x slower on TPU
    ridge = 1e-10 if H.dtype == jnp.float64 else 1e-7
    Hoo = Hoo + jnp.diag(ridge * jnp.maximum(dg, 1.0))
    d = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(Hoo), 1e-12))
    Hoo_e = d[:, None] * Hoo * d[None, :]
    rhs = jnp.concatenate([H[:cut, cut:], bf[:cut, None]], axis=1)
    rhs_e = d[:, None] * rhs
    sol_e = schur.chol_solve_mixed(Hoo_e, rhs_e)
    sol = d[:, None] * sol_e
    Lam = H[cut:, cut:] - H[:cut, cut:].T @ sol[:, :keep_dim]
    b_m = bf[cut:] - H[:cut, cut:].T @ sol[:, -1]
    return 0.5 * (Lam + Lam.T), b_m


def _vio_iteration(problem: VIOProblem, cfg: VIOConfig, carry, _,
                   axis_name: str | None = None):
    state, lam, cost = carry
    N = problem.free_pose.shape[0]
    M = state.lm.shape[0]
    from libwave_tpu.optim.ba import _use_dense_schur

    # static solver choice first: the widened-Hessian path (stiff chains)
    # only pays off under the dense factorization, so PCG keeps pure f32.
    # The G-bytes gate uses the f32 itemsize — G stays f32 either way.
    use_dense = _use_dense_schur(cfg, N, D, 6, M, 4, axis_name)
    hdt = cfg.hessian_dtype if use_dense else None
    blocks = _linearize_vio(
        problem, state, lam, cfg.huber_delta, axis_name, hdt
    )
    rhs = schur.schur_rhs(blocks)
    if use_dense:
        dx = schur.dense_schur_solve(blocks, rhs).astype(state.p.dtype)
        cg_iterations = jnp.asarray(0, jnp.int32)
    else:
        cg = schur.pcg(
            blocks, rhs, max_iters=cfg.cg_max_iters, tol=cfg.cg_tol
        )
        dx = cg.x.astype(state.p.dtype)
        cg_iterations = cg.iterations
    dlm = schur.back_substitute(blocks, dx)

    new_state = state.retract(dx, dlm, problem.free_pose)
    new_cost = vio_cost(problem, new_state, axis_name, cfg.huber_delta)
    step_ok = jnp.isfinite(jnp.sum(dx)) & jnp.isfinite(jnp.sum(dlm))
    accept = (new_cost < cost) & jnp.isfinite(new_cost) & step_ok
    state = jax.tree.map(lambda a, b: jnp.where(accept, a, b), new_state, state)
    cost = jnp.where(accept, new_cost, cost)
    lam = jnp.clip(
        jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up),
        1e-10, 1e8,
    )
    return (state, lam, cost), (cost, accept, cg_iterations)


@f32_matmuls
def solve_vio(problem: VIOProblem, state: VIOState,
              cfg: VIOConfig = VIOConfig(),
              axis_name: str | None = None, lam0=None):
    """Run the full VIO LM optimization (jit-able). ``axis_name``: sharded
    ELL mode inside shard_map — see
    :func:`libwave_tpu.parallel.dist_vio.solve_vio_sharded`.

    ``lam0`` (traced scalar, optional): starting trust-region lambda —
    lets callers CHUNK the solve into several shorter jitted scans with a
    host-side convergence check between them (the windowed pipeline's
    adaptive-iteration mode: converged windows stop paying f64
    factorizations) without resetting the lambda adaptation."""
    cost0 = vio_cost(problem, state, axis_name, cfg.huber_delta)
    if lam0 is None:
        lam0 = jnp.asarray(cfg.init_lambda, state.p.dtype)
    carry = (state, jnp.asarray(lam0, state.p.dtype), cost0)
    carry, (costs, accepts, cg_iters) = jax.lax.scan(
        lambda c, x: _vio_iteration(problem, cfg, c, x, axis_name),
        carry, None, length=cfg.max_iterations,
    )
    state, lam, cost = carry
    return state, {
        "initial_cost": cost0,
        "final_cost": cost,
        "costs": costs,
        "accepted": accepts,
        "cg_iterations": cg_iters,
        "final_lambda": lam,
    }


def vio_dead_reckon(problem: VIOProblem, q0, p0, v0, lm_init) -> VIOState:
    """Initialize keyframe states by propagating the preintegrated IMU
    deltas from (q0, p0, v0) — the standard VIO initialization (a pose
    guess inconsistent with the stiff IMU chain strands LM in a high-cost
    valley; see tests). Landmarks come from the caller (triangulation or
    map prior)."""
    g = jnp.asarray(problem.gravity, p0.dtype)

    def step(carry, pim):
        q, p, v = carry
        dt = pim.dt_total
        R = so3.quat_to_rot(q)
        p_next = p + v * dt + 0.5 * g * dt * dt + R @ pim.dp
        v_next = v + g * dt + R @ pim.dv
        q_next = so3.quat_multiply(q, pim.dq)
        return (q_next, p_next, v_next), (q_next, p_next, v_next)

    (_, _, _), (qs, ps, vs) = jax.lax.scan(step, (q0, p0, v0), problem.pim)
    N = qs.shape[0] + 1
    return VIOState(
        q=jnp.concatenate([q0[None], qs]),
        p=jnp.concatenate([p0[None], ps]),
        v=jnp.concatenate([v0[None], vs]),
        bg=jnp.zeros((N, 3), p0.dtype),
        ba=jnp.zeros((N, 3), p0.dtype),
        lm=lm_init,
    )


def solve_vio_staged(problem: VIOProblem, state: VIOState,
                     cfg: VIOConfig = VIOConfig(),
                     vision_stage_scale: float = 1e-3):
    """Two-stage solve: optimize with down-weighted inertial factors first,
    then the full graph. Useful when the initial guess badly violates the
    IMU chain but the vision geometry is sound. Caution: with a very small
    ``vision_stage_scale`` the first stage is near-monocular and its scale
    gauge can drift — prefer plain :func:`solve_vio` whenever the
    initialization is IMU-consistent (e.g. from :func:`vio_dead_reckon` or a
    previous window's optimum)."""
    soft = problem._replace(
        imu_sqrt_info=problem.imu_sqrt_info * vision_stage_scale,
        bias_walk_sqrt_info=problem.bias_walk_sqrt_info * vision_stage_scale,
    )
    state, _ = solve_vio(soft, state, cfg)
    return solve_vio(problem, state, cfg)


def vio_from_sim(dataset, imu_rate_mult: int = 10, pixel_noise: float = 1.0,
                 imu_gyro_sigma: float = 1e-3, imu_accel_sigma: float = 1e-2,
                 key=None, q_BC=None):
    """Build a VIOProblem from a synthetic VoDataset plus simulated IMU.

    The robot trajectory provides ground truth; IMU samples are generated at
    ``imu_rate_mult`` x the dataset step rate between triggered keyframes and
    preintegrated per keyframe interval. Returns (problem, gt_state).
    """
    import numpy as np

    from libwave_tpu.benchmark import Trajectory, interpolate_at
    from libwave_tpu.optim.imu import preintegrate_imu, simulate_imu
    from libwave_tpu.sim.vo_dataset import q_BC as default_q_BC

    dtype = dataset.robot_p_GB.dtype
    trig = np.asarray(dataset.frame_has_obs)
    frames = np.nonzero(trig)[0]
    N = len(frames)
    qbc = default_q_BC(dtype) if q_BC is None else q_BC

    # keyframe body poses (camera = body ∘ q_BC, zero lever arm)
    q_GB = dataset.robot_q_GB[frames]
    p_GB = dataset.robot_p_GB[frames]
    times = np.asarray(dataset.times)[frames]

    # dense body trajectory for IMU simulation
    dt_imu = float(dataset.times[1] - dataset.times[0]) / imu_rate_mult
    fine_t = jnp.arange(float(times[0]), float(times[-1]) + 1e-9, dt_imu)
    fine = interpolate_at(
        Trajectory(dataset.times, SE3(q=dataset.robot_q_GB, t=dataset.robot_p_GB)),
        fine_t,
    )
    v_fine = jnp.gradient(fine.t, dt_imu, axis=0)
    if key is not None:
        key, k_imu = jax.random.split(key)
    else:
        k_imu = None
    gyro, accel = simulate_imu(
        fine.q, fine.t, v_fine, dt_imu, key=k_imu,
        gyro_sigma=imu_gyro_sigma, accel_sigma=imu_accel_sigma,
    )

    # preintegrate per keyframe interval (equal-length windows for stacking)
    steps_per_kf = int(round((times[1] - times[0]) / dt_imu))
    pims = []
    z3 = jnp.zeros(3, dtype)
    for i in range(N - 1):
        s = int(round((times[i] - times[0]) / dt_imu))
        pims.append(
            preintegrate_imu(
                jax.lax.dynamic_slice_in_dim(gyro, s, steps_per_kf),
                jax.lax.dynamic_slice_in_dim(accel, s, steps_per_kf),
                dt_imu, z3, z3,
                gyro_noise_density=max(imu_gyro_sigma, 1e-5),
                accel_noise_density=max(imu_accel_sigma, 1e-4),
            )
        )
    pim_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *pims)
    sqrt_infos = jnp.stack([imu_sqrt_info(p) for p in pims])

    # reprojection bank
    vis = np.asarray(dataset.visible)
    pose_idx, lm_idx, uv = [], [], []
    px = np.asarray(dataset.pixels)
    for fi, f in enumerate(frames):
        for j in np.nonzero(vis[f])[0]:
            pose_idx.append(fi)
            lm_idx.append(j)
            uv.append(px[f, j])
    pose_idx = jnp.asarray(np.asarray(pose_idx, np.int32))
    lm_idx = jnp.asarray(np.asarray(lm_idx, np.int32))
    uv = jnp.asarray(np.asarray(uv), dtype)
    if key is not None and pixel_noise > 0:
        uv = uv + pixel_noise * jax.random.normal(key, uv.shape, dtype)

    # gauge: fix only the POSE of the first keyframe; its velocity and
    # biases stay free (freezing them would force the whole chain to
    # accommodate whatever the initial guess put there)
    free = np.ones((N, D))
    free[0, 0:6] = 0.0

    # ground-truth velocities at keyframes
    kf_idx = np.round((times - times[0]) / dt_imu).astype(int)
    v_kf = v_fine[jnp.asarray(np.minimum(kf_idx, v_fine.shape[0] - 1))]

    pose_ell, lm_ell, pad_mask, ell, uv_p = schur.pack_observations(
        pose_idx, lm_idx, N, int(dataset.landmarks.shape[0]), np.asarray(uv)
    )
    problem = VIOProblem(
        K=jnp.asarray(dataset.camera_K, dtype),
        pose_idx=pose_ell,
        lm_idx=lm_ell,
        uv=jnp.asarray(uv_p, dtype),
        obs_weight=pad_mask.astype(dtype),
        pim=pim_stack,
        imu_i=jnp.arange(N - 1, dtype=jnp.int32),
        imu_j=jnp.arange(1, N, dtype=jnp.int32),
        imu_sqrt_info=sqrt_infos,
        bias_walk_sqrt_info=jnp.full((6,), 1e3, dtype),
        bias_prior_sqrt_info=jnp.concatenate(
            [jnp.full((3,), 1e2, dtype), jnp.full((3,), 1e1, dtype)]
        ),
        ell=ell,
        free_pose=jnp.asarray(free, dtype),
        q_BC=qbc,
        pixel_sigma=max(pixel_noise, 0.5),
    )
    gt = VIOState(
        q=q_GB, p=p_GB, v=v_kf,
        bg=jnp.zeros((N, 3), dtype), ba=jnp.zeros((N, 3), dtype),
        lm=dataset.landmarks,
    )
    return problem, gt
