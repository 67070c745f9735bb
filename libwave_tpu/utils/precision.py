"""Full-f32 matmul accumulation for numerics-critical code.

TPU matmuls/einsums default to bf16 passes (`DEFAULT` precision) — fine for
neural nets, poisonous for solver-grade linear algebra: pairwise-distance
matmuls mis-rank nearest neighbors at lidar coordinate scales, normal
equations and CG dot products lose the digits Levenberg-Marquardt acceptance
depends on. Measured on v5e: the EuRoC VIO pipeline converged to ATE 0.23 m
under DEFAULT vs 0.0038 m under HIGHEST (CPU-identical).

Decorate the *entry points* of solver/geometry code with
:func:`f32_matmuls`; everything traced beneath inherits the setting. CPU and
f64 paths are unaffected (already exact).
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Trace ``fn`` under ``jax.default_matmul_precision("highest")``."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


def allow_explicit_f64():
    """Permit *explicitly requested* float64 arrays without enabling x64.

    ``jax_explicit_x64_dtypes="allow"`` (jax >= 0.9) honors
    ``dtype=jnp.float64`` requests while leaving every implicit conversion
    and literal at f32 — measured here: ``jnp.asarray(np_f64)`` still gives
    f32, ``jnp.asarray(1.0)`` stays f32, and f32 x f64 ops promote to f64.
    This is the enabler for the mixed-precision stiff-Hessian path
    (optim.schur ``sum_dtype``): f32 linearization, f64 summation +
    factorization — without the global dtype-semantics change of
    ``jax_enable_x64``. No-op (returns False) when the flag doesn't exist;
    callers then need x64 enabled for the f64 path.
    """
    try:
        jax.config.update("jax_explicit_x64_dtypes", "allow")
        return True
    except Exception:
        return False
