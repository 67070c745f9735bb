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
