"""Pose-graph factor banks: between (odometry) factors and pose priors.

Capability parity with the factors the reference's offline VO pipeline puts in
its GTSAM graph besides projections (wave_gtsam/tests/gtsam/
gtsam_offline_example.cpp:62-74 ``BetweenFactor<Pose3>`` odometry with diagonal
sigmas, :123-130 ``PriorFactor<Pose3>`` gauge priors), and with the motion/
prior factor family of wave_gtsam (pose_prior.hpp:14, motion_factor.hpp:31).

Residual conventions (product manifold (q, p), right perturbation):

  between(i, j; meas):  r = [ log(q_meas⁻¹ ⊗ q_i⁻¹ ⊗ q_j),
                              R_i^T (p_j - p_i) - p_meas ] * sqrt_info
  prior(i; meas):       r = [ log(q_meas⁻¹ ⊗ q_i),  p_i - p_meas ] * sqrt_info

Jacobians come from ``jax.jacfwd`` over the boxplus-perturbed residual,
vmapped over the bank — exact manifold Jacobians without hand derivation
(the factors are 6-dim; this is cheap and XLA fuses it).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from libwave_tpu.geometry import so3
from libwave_tpu.utils.precision import f32_matmuls


class BetweenBank(NamedTuple):
    """F between-factors (i -> j relative pose measurements)."""

    i: jnp.ndarray  # (F,) int32
    j: jnp.ndarray  # (F,) int32
    dq: jnp.ndarray  # (F, 4) measured q_i⁻¹ ⊗ q_j
    dp: jnp.ndarray  # (F, 3) measured R_i^T (p_j - p_i)
    sqrt_info: jnp.ndarray  # (F, 6) diagonal sqrt information [rot, trans]


class PriorBank(NamedTuple):
    """P unary pose priors."""

    i: jnp.ndarray  # (P,) int32
    q: jnp.ndarray  # (P, 4)
    p: jnp.ndarray  # (P, 3)
    sqrt_info: jnp.ndarray  # (P, 6)


def between_from_trajectory(q, p, sigmas_rot, sigmas_trans, stride: int = 1,
                            noise_key=None):
    """Build consecutive-pose odometry measurements from a trajectory, as the
    reference does from ground truth (gtsam_offline_example.cpp:62-74).
    With ``noise_key``, each measurement is perturbed by the factor's own
    sigmas (the artificial odometry noise of the KITTI example,
    gtsam_offline_kitti_example.cpp:77-79)."""
    i = jnp.arange(0, q.shape[0] - stride, dtype=jnp.int32)
    j = i + stride
    qi_inv = so3.quat_inverse(q[i])
    dq = so3.quat_multiply(qi_inv, q[j])
    dp = so3.quat_rotate(qi_inv, p[j] - p[i])
    if noise_key is not None:
        import jax

        k1, k2 = jax.random.split(noise_key)
        dq = so3.quat_boxplus(
            dq, sigmas_rot * jax.random.normal(k1, dq.shape[:-1] + (3,), p.dtype)
        )
        dp = dp + sigmas_trans * jax.random.normal(k2, dp.shape, p.dtype)
    si = jnp.concatenate(
        [
            jnp.full((i.shape[0], 3), 1.0 / sigmas_rot, dtype=p.dtype),
            jnp.full((i.shape[0], 3), 1.0 / sigmas_trans, dtype=p.dtype),
        ],
        axis=-1,
    )
    return BetweenBank(i=i, j=j, dq=dq, dp=dp, sqrt_info=si)


def _between_residual(qi, pi, qj, pj, dq, dp, sqrt_info):
    qi_inv = so3.quat_inverse(qi)
    r_rot = so3.log_quat(
        so3.quat_multiply(so3.quat_inverse(dq), so3.quat_multiply(qi_inv, qj))
    )
    r_pos = so3.quat_rotate(qi_inv, pj - pi) - dp
    return jnp.concatenate([r_rot, r_pos], axis=-1) * sqrt_info


def _prior_residual(qi, pi, q0, p0, sqrt_info):
    r_rot = so3.log_quat(so3.quat_multiply(so3.quat_inverse(q0), qi))
    return jnp.concatenate([r_rot, pi - p0], axis=-1) * sqrt_info


def linearize_between(bank: BetweenBank, q, p):
    """Returns (r (F,6), Ji (F,6,6), Jj (F,6,6)) in [omega, dp] tangent order."""

    def one(i, j, dq, dp, si):
        qi, pi, qj, pj = q[i], p[i], q[j], p[j]

        def res(xi_i, xi_j):
            return _between_residual(
                so3.quat_boxplus(qi, xi_i[0:3]),
                pi + xi_i[3:6],
                so3.quat_boxplus(qj, xi_j[0:3]),
                pj + xi_j[3:6],
                dq, dp, si,
            )

        z = jnp.zeros(6, dtype=p.dtype)
        r = res(z, z)
        Ji = jax.jacfwd(res, argnums=0)(z, z)
        Jj = jax.jacfwd(res, argnums=1)(z, z)
        return r, Ji, Jj

    return jax.vmap(one)(bank.i, bank.j, bank.dq, bank.dp, bank.sqrt_info)


def linearize_prior(bank: PriorBank, q, p):
    """Returns (r (P,6), J (P,6,6))."""

    def one(i, q0, p0, si):
        qi, pi = q[i], p[i]

        def res(xi):
            return _prior_residual(
                so3.quat_boxplus(qi, xi[0:3]), pi + xi[3:6], q0, p0, si
            )

        z = jnp.zeros(6, dtype=p.dtype)
        return res(z), jax.jacfwd(res)(z)

    return jax.vmap(one)(bank.i, bank.q, bank.p, bank.sqrt_info)


class PoseGraphConfig(NamedTuple):
    """Knobs for :func:`solve_pose_graph` (defaults sized for odometry graphs
    with loop closures; the reference's analog is GTSAM LM defaults in
    gtsam_offline_example.cpp:133-134)."""

    max_iterations: int = 15
    cg_max_iters: int = 60
    cg_tol: float = 1e-8
    damping: float = 1e-8


def _scatter6(i, j, Ji, Jj, y, n):
    """out[k] = sum_{f: i_f=k} Ji_f^T y_f + sum_{f: j_f=k} Jj_f^T y_f."""
    ti = jnp.einsum("fab,fa->fb", Ji, y)
    tj = jnp.einsum("fab,fa->fb", Jj, y)
    out = jax.ops.segment_sum(ti, i, num_segments=n)
    return out + jax.ops.segment_sum(tj, j, num_segments=n)


@f32_matmuls
def solve_pose_graph(
    q,
    p,
    between: BetweenBank,
    priors: PriorBank | None = None,
    free=None,
    cfg: PoseGraphConfig = PoseGraphConfig(),
):
    """Gauss-Newton pose-graph optimization, fully on device.

    TPU-native analog of the reference's GTSAM ``LevenbergMarquardtOptimizer``
    over BetweenFactor/PriorFactor graphs (gtsam_offline_example.cpp:62-134):
    instead of a sparse elimination ordering, each GN step solves the normal
    equations matrix-free — the Hessian-vector product is two vmapped 6x6
    block products plus segment-sums (scatter over pose ids), solved by PCG
    with a block-Jacobi (6x6 block diagonal) preconditioner. Everything is
    fixed-shape: the iteration loop is a ``lax.scan``.

    Args:
      q, p: (N, 4) quaternions + (N, 3) positions (initial estimate).
      free: optional (N,) mask, 0 = gauge-fixed pose (default: pose 0 fixed).

    Returns (q, p, info dict with cost trace).
    """
    n = q.shape[0]
    dtype = p.dtype
    if free is None:
        # gauge: if priors anchor the graph, every pose is free; otherwise
        # fix pose 0 (the reference fixes gauge the same two ways —
        # PriorFactor in the gtsam examples, SetParameterBlockConstant in
        # ba_test.cpp:156-161)
        if priors is not None:
            free = jnp.ones((n,), dtype)
        else:
            free = jnp.ones((n,), dtype).at[0].set(0.0)
    free = jnp.asarray(free, dtype)
    fmask = free[:, None]  # (N, 1)
    eye6 = jnp.eye(6, dtype=dtype)

    def gn_step(carry, _):
        q, p = carry
        r_b, Ji, Jj = linearize_between(between, q, p)
        if priors is not None:
            r_p, Jp = linearize_prior(priors, q, p)

        # gradient and block-diagonal of H
        g = _scatter6(between.i, between.j, Ji, Jj, r_b, n)
        Dblk = jax.ops.segment_sum(
            jnp.einsum("fab,fac->fbc", Ji, Ji), between.i, num_segments=n
        ) + jax.ops.segment_sum(
            jnp.einsum("fab,fac->fbc", Jj, Jj), between.j, num_segments=n
        )
        if priors is not None:
            g = g + jax.ops.segment_sum(
                jnp.einsum("fab,fa->fb", Jp, r_p), priors.i, num_segments=n
            )
            Dblk = Dblk + jax.ops.segment_sum(
                jnp.einsum("fab,fac->fbc", Jp, Jp), priors.i, num_segments=n
            )
        Dblk = Dblk + (cfg.damping + 1e-10) * eye6
        # gauge-fixed blocks become identity so the preconditioner is SPD
        Dblk = jnp.where(
            (free > 0)[:, None, None], Dblk, eye6[None, :, :]
        )
        Pinv = jnp.linalg.inv(Dblk)  # (N, 6, 6) block-Jacobi preconditioner

        def Hv(v):
            v = v * fmask
            y = jnp.einsum("fab,fb->fa", Ji, v[between.i]) + jnp.einsum(
                "fab,fb->fa", Jj, v[between.j]
            )
            out = _scatter6(between.i, between.j, Ji, Jj, y, n)
            if priors is not None:
                yp = jnp.einsum("fab,fb->fa", Jp, v[priors.i])
                out = out + jax.ops.segment_sum(
                    jnp.einsum("fab,fa->fb", Jp, yp), priors.i, num_segments=n
                )
            return (out + cfg.damping * v) * fmask

        def apply_P(v):
            return jnp.einsum("nij,nj->ni", Pinv, v * fmask) * fmask

        # masked-convergence PCG (same pattern as optim.schur.pcg)
        b = -g * fmask
        x = jnp.zeros_like(b)
        r = b
        z = apply_P(r)
        pdir = z
        rz = jnp.vdot(r, z)
        rr = jnp.vdot(b, b)
        thresh = (cfg.cg_tol**2) * rr

        def cg_body(state, _):
            x, r, z, pdir, rz, rr = state
            live = rr > thresh
            Hp = Hv(pdir)
            denom = jnp.vdot(pdir, Hp)
            alpha = jnp.where(live, rz / jnp.where(denom == 0, 1.0, denom), 0.0)
            x = x + alpha * pdir
            r = r - alpha * Hp
            z_new = apply_P(r)
            rz_new = jnp.vdot(r, z_new)
            rr = jnp.vdot(r, r)
            beta = jnp.where(live, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
            pdir = z_new + beta * pdir
            rz = jnp.where(live, rz_new, rz)
            return (x, r, z_new, pdir, rz, rr), None

        (x, *_), _ = jax.lax.scan(
            cg_body, (x, r, z, pdir, rz, rr), None, length=cfg.cg_max_iters
        )
        dx = x * fmask
        q_new = so3.quat_boxplus(q, dx[:, 0:3])
        p_new = p + dx[:, 3:6]
        cost = pose_graph_cost(q_new, p_new, between, priors)
        return (q_new, p_new), cost

    (q, p), trace = jax.lax.scan(
        gn_step, (q, p), None, length=cfg.max_iterations
    )
    return q, p, {"cost_trace": trace, "final_cost": trace[-1]}


def pose_graph_cost(q, p, between: BetweenBank | None, priors: PriorBank | None):
    c = jnp.asarray(0.0, dtype=p.dtype)
    if between is not None:
        r = _between_residual(
            q[between.i], p[between.i], q[between.j], p[between.j],
            between.dq, between.dp, between.sqrt_info,
        )
        c = c + 0.5 * jnp.sum(r * r)
    if priors is not None:
        r = _prior_residual(
            q[priors.i], p[priors.i], priors.q, priors.p, priors.sqrt_info
        )
        c = c + 0.5 * jnp.sum(r * r)
    return c
