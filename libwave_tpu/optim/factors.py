"""Factor residuals over combined trajectory states + a generic GN solver.

Capability parity with the reference's wave_gtsam factor pack (§2.6 of
SURVEY.md), each implemented as a *bank* (struct-of-arrays over instances)
whose residual evaluates for all instances in one vectorized call:

- ``motion_factor``: constant-velocity binary factor
  r = [v1·dt − Local(pose1, pose2); v1 − v2; (b1 − b2)]
  (motion_factor.hpp:31, impl/motion_factor_impl.hpp:8-66)
- ``gps_factor_with_bias``: r = Logmap(T_meas⁻¹ ∘ (LiftedBias(B) ∘ T))
  with the bias lifted into translation (gps_factor_with_bias.hpp:19,
  src/gps_factor_with_bias.cpp:10-45)
- ``hand_eye_factor``: GPS↔sensor extrinsic calibration
  r = Logmap((T_LOCAL_S1 ∘ (LiftedBias ∘ T_S1_S2))⁻¹ ∘ T_LOCAL_S2)
  (hand_eye.hpp:20, src/hand_eye.cpp:14-62)
- ``decaying_bias_factor``: r = B2 − B1·exp(−dt/τ)
  (decaying_bias.hpp:14, src/decaying_bias.cpp)
- ``pose_prior`` / ``twist_prior`` / ``bias_prior``: unary priors on state
  sub-blocks (pose_prior.hpp:14, twist_prior.hpp:9, bias_prior.hpp:9)
- the IMU preintegration factor lives in :mod:`libwave_tpu.optim.imu`.

Solver: :func:`solve_trajectory_gn` — Levenberg-Marquardt on the stacked
trajectory tangent. Jacobians come from one ``jax.jacfwd`` through the
retraction (the autodiff replacement for the reference's hand-coded
H-matrices, verified against them in tests). Suitable for the sliding-window
sizes the reference's tests use; large-scale problems route through the
Schur/PCG machinery instead.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from libwave_tpu.geometry import se3, so3
from libwave_tpu.geometry.se3 import SE3


# ---------------------------------------------------------------------------
# factor residuals (each returns a flat residual vector, already weighted)
# ---------------------------------------------------------------------------


def motion_residual(state, i, j, dt, sqrt_info=1.0):
    """Constant-velocity factor between steps i and j (vectorized over
    index arrays). State must have .pose()/.vel (+ optional .bias)."""
    pose = state.pose()
    P1 = SE3(q=pose.q[i], t=pose.t[i])
    P2 = SE3(q=pose.q[j], t=pose.t[j])
    local = se3.boxminus(P2, P1)  # Local(pose1, pose2)
    dt_arr = jnp.asarray(dt)[..., None]
    parts = [state.vel[i] * dt_arr - local, state.vel[i] - state.vel[j]]
    if hasattr(state, "bias"):
        parts.append(state.bias[i] - state.bias[j])
    return (jnp.concatenate(parts, axis=-1) * sqrt_info).reshape(-1)


def _lifted_bias(bias3, dtype):
    """Pose with identity rotation and the bias as translation."""
    batch = bias3.shape[:-1]
    return SE3(q=so3.quat_identity(batch, dtype), t=bias3)


def gps_residual(state, i, T_meas: SE3, sqrt_info=1.0):
    """GPS factor with additive translational bias at steps ``i``:
    r = Logmap(T_meas⁻¹ ∘ (LiftedBias(bias_i) ∘ pose_i))."""
    pose = state.pose()
    P = SE3(q=pose.q[i], t=pose.t[i])
    B = _lifted_bias(state.bias[i], pose.t.dtype)
    biased = B.compose(P)
    err = T_meas.inverse().compose(biased)
    return (se3.log(err) * sqrt_info).reshape(-1)


def hand_eye_residual(T_LOCAL_S2: SE3, T_S1_S2: SE3, bias3,
                      T_LOCAL_S1: SE3, sqrt_info=1.0):
    """Hand-eye calibration residual over explicit pose variables
    (not trajectory-indexed — calibration states)."""
    B = _lifted_bias(bias3, T_LOCAL_S2.t.dtype)
    meas = T_LOCAL_S1.compose(B.compose(T_S1_S2))
    err = meas.inverse().compose(T_LOCAL_S2)
    return (se3.log(err) * sqrt_info).reshape(-1)


def decaying_bias_residual(state, i, j, dt, tau, sqrt_info=1.0):
    """r = B_j − B_i · exp(−dt/τ) (decaying_bias.cpp)."""
    decay = jnp.exp(-jnp.asarray(dt) / tau)[..., None]
    return ((state.bias[j] - state.bias[i] * decay) * sqrt_info).reshape(-1)


def pose_prior_residual(state, i, prior: SE3, sqrt_info=1.0):
    pose = state.pose()
    P = SE3(q=pose.q[i], t=pose.t[i])
    return (se3.boxminus(P, prior) * sqrt_info).reshape(-1)


def twist_prior_residual(state, i, prior_vel, sqrt_info=1.0):
    return ((state.vel[i] - prior_vel) * sqrt_info).reshape(-1)


def bias_prior_residual(state, i, prior_bias, sqrt_info=1.0):
    return ((state.bias[i] - prior_bias) * sqrt_info).reshape(-1)


# ---------------------------------------------------------------------------
# generic trajectory LM solver
# ---------------------------------------------------------------------------


def solve_trajectory_gn(
    state,
    residual_fns: Sequence[Callable],
    num_iters: int = 20,
    init_lambda: float = 1e-6,
    lambda_up: float = 10.0,
    lambda_down: float = 0.3,
):
    """Levenberg-Marquardt over a combined trajectory state.

    ``residual_fns``: callables state -> flat residual vector (already
    weighted by sqrt information). Linearization is ``jax.jacfwd`` through
    ``state.retract`` on the stacked (T, D) tangent.

    Returns (state, info) where info carries per-iteration costs. jit-able.
    """
    T = state.q.shape[0]
    D = state.DIM
    dtype = state.p.dtype

    def residuals_at(st):
        return jnp.concatenate([jnp.atleast_1d(f(st)) for f in residual_fns])

    def cost_of(st):
        r = residuals_at(st)
        return 0.5 * jnp.sum(r * r)

    def linearize(st):
        def f(dx):
            return residuals_at(st.retract(dx.reshape(T, D)))

        z = jnp.zeros(T * D, dtype)
        r = f(z)
        J = jax.jacfwd(f)(z)
        return r, J

    def step(carry, _):
        st, lam, cost = carry
        r, J = linearize(st)
        H = J.T @ J
        g = J.T @ r
        Hd = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-12 * jnp.eye(
            T * D, dtype=dtype
        )
        dx = jnp.linalg.solve(Hd, -g)
        new_st = st.retract(dx.reshape(T, D))
        new_cost = cost_of(new_st)
        accept = new_cost < cost
        st = jax.tree.map(lambda a, b: jnp.where(accept, a, b), new_st, st)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(
            jnp.where(accept, lam * lambda_down, lam * lambda_up), 1e-12, 1e8
        )
        return (st, lam, cost), cost

    cost0 = cost_of(state)
    (state, lam, cost), costs = jax.lax.scan(
        step,
        (state, jnp.asarray(init_lambda, dtype), cost0),
        None,
        length=num_iters,
    )
    return state, {"initial_cost": cost0, "final_cost": cost, "costs": costs}
