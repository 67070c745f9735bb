"""Generic small-scale nonlinear least squares (dense Levenberg-Marquardt).

Capability parity with the reference's ``ceres_examples`` component
(wave_optimization/src/ceres/ceres_examples.cpp:5-80 and
include/wave/optimization/ceres/ceres_examples.hpp): the tutorial residuals —
autodiff / numeric-diff / analytic-Jacobian variants of ``f(x) = 10 - x`` and
exponential curve fitting ``y = exp(m*x + c)`` — generalized into a reusable
dense LM solver. Where Ceres dispatches on AutoDiffCostFunction /
NumericDiffCostFunction / SizedCostFunction, we dispatch on how the Jacobian
is obtained: ``jax.jacfwd`` (autodiff, the default), central finite
differences (numeric), or a user-supplied analytic Jacobian function.

TPU-native design: the whole LM iteration loop is one ``lax.scan`` with a
fixed trip count and a damping freeze on convergence, so the solver is
jit-able, vmap-able (batch of independent problems), and differentiable.
The normal equations are solved densely with ``jnp.linalg.solve`` — this
module targets small parameter vectors (calibration, curve fits); large
structured problems use ``optim.ba`` / ``optim.factors``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from libwave_tpu.utils.precision import f32_matmuls

__all__ = ["LMConfig", "LMResult", "lm_solve", "curve_fit",
           "numeric_jacobian", "exp_curve_residual"]


@dataclass(frozen=True)
class LMConfig:
    """LM solver knobs (defaults mirror Ceres' tutorial-scale settings)."""

    max_iterations: int = 50
    lambda_init: float = 1e-4
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    gradient_tol: float = 1e-10
    step_tol: float = 1e-12


class LMResult(NamedTuple):
    x: jnp.ndarray            # final parameters
    cost: jnp.ndarray         # final 0.5*||r||^2
    iterations: jnp.ndarray   # accepted-step count
    converged: jnp.ndarray    # bool
    cost_trace: jnp.ndarray   # (max_iterations,) cost after each sweep


def numeric_jacobian(residual_fn: Callable, eps: float = 1e-6) -> Callable:
    """Central-difference Jacobian of ``residual_fn`` w.r.t. its first arg.

    Parity: Ceres NumericDiffCostFunction (CENTRAL) as used in
    ceres_examples.cpp ``NumericalDiffCostFunctor``. Fixed-shape, jit-able:
    perturbs each coordinate via one vmapped evaluation pair.
    """

    def jac(x, *args):
        x = jnp.asarray(x)
        eye = jnp.eye(x.shape[0], dtype=x.dtype) * eps

        def col(dx):
            return (residual_fn(x + dx, *args) - residual_fn(x - dx, *args)) / (
                2.0 * eps
            )

        return jax.vmap(col)(eye).T  # (n_res, n_params)

    return jac


@f32_matmuls
def lm_solve(
    residual_fn: Callable,
    x0,
    args: tuple = (),
    jac: Optional[Callable] = None,
    config: LMConfig = LMConfig(),
) -> LMResult:
    """Dense Levenberg-Marquardt: minimize 0.5*||residual_fn(x, *args)||^2.

    ``jac(x, *args) -> (n_res, n_params)`` may be analytic (parity with the
    reference's ``AnalyticalCostFunction``, ceres_examples.cpp), the result of
    :func:`numeric_jacobian`, or None to use ``jax.jacfwd`` (autodiff parity
    with ``AutoDiffCostFunction``).
    """
    x0 = jnp.atleast_1d(jnp.asarray(x0))
    if jac is None:
        jac = jax.jacfwd(residual_fn, argnums=0)

    def cost_of(x):
        r = residual_fn(x, *args)
        return 0.5 * jnp.sum(r * r)

    n = x0.shape[0]
    eye = jnp.eye(n, dtype=x0.dtype)

    def step(carry, _):
        x, lam, cost, iters, done = carry
        r = residual_fn(x, *args)
        J = jnp.atleast_2d(jac(x, *args))
        g = J.T @ r
        H = J.T @ J
        dx = -jnp.linalg.solve(H + lam * eye, g)
        x_new = x + dx
        cost_new = cost_of(x_new)
        accept = cost_new < cost
        x = jnp.where(accept & ~done, x_new, x)
        cost_out = jnp.where(accept & ~done, cost_new, cost)
        lam = jnp.where(
            accept, lam * config.lambda_down, lam * config.lambda_up
        )
        lam = jnp.clip(lam, 1e-12, 1e12)
        converged = (jnp.max(jnp.abs(g)) < config.gradient_tol) | (
            jnp.linalg.norm(dx) < config.step_tol
        )
        iters = iters + jnp.where(accept & ~done, 1, 0)
        done = done | converged
        return (x, lam, cost_out, iters, done), cost_out

    init = (
        x0,
        jnp.asarray(config.lambda_init, x0.dtype),
        cost_of(x0),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    (x, _, cost, iters, done), trace = jax.lax.scan(
        step, init, None, length=config.max_iterations
    )
    return LMResult(x=x, cost=cost, iterations=iters, converged=done,
                    cost_trace=trace)


def exp_curve_residual(params, x, y):
    """Residuals of the Ceres curve-fitting tutorial model ``y = exp(m*x+c)``
    (parity: ceres_examples.cpp ExponentialResidual)."""
    m, c = params[0], params[1]
    return y - jnp.exp(m * x + c)


def curve_fit(
    model: Callable,
    x,
    y,
    p0,
    jac: Optional[Callable] = None,
    config: LMConfig = LMConfig(max_iterations=100),
) -> LMResult:
    """Fit ``model(params, x) ~= y`` by LM (parity: the runCurveFitting
    example, ceres_examples.cpp). ``model`` is vectorized over x."""

    def residual(params, x, y):
        return y - model(params, x)

    return lm_solve(residual, p0, args=(jnp.asarray(x), jnp.asarray(y)),
                    jac=jac, config=config)
