"""Generic dense LM solver + tutorial residuals.

Mirrors the reference's ceres_examples coverage
(wave_optimization/tests/ceres/ceres_examples_test.cpp: runAutoDiffExample,
runNumericalDiffExample, runAnalyticalExample, runCurveFittingExample) plus
wave_test.hpp-style predicate checks and the new angles/file utilities.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu import testing
from libwave_tpu.optim.nlls import (
    LMConfig,
    curve_fit,
    exp_curve_residual,
    lm_solve,
    numeric_jacobian,
)
from libwave_tpu.utils import (
    file_exists,
    path_split,
    paths_combine,
    remove_dir,
    wrap_to_pi,
    wrap_to_two_pi,
)


def hello_residual(x):
    # Ceres hello-world: f(x) = 10 - x, minimum at x = 10
    # (parity: ceres_examples.cpp AutoDiffCostFunctor).
    return 10.0 - x


class TestLMSolve:
    def test_autodiff(self):
        res = lm_solve(hello_residual, jnp.array([0.5]))
        assert abs(float(res.x[0]) - 10.0) < 1e-6
        assert float(res.cost) < 1e-12

    def test_numeric_diff(self):
        jac = numeric_jacobian(hello_residual)
        res = lm_solve(hello_residual, jnp.array([0.5]), jac=jac)
        assert abs(float(res.x[0]) - 10.0) < 1e-5

    def test_analytic_jacobian(self):
        # parity: AnalyticalCostFunction (ceres_examples.cpp)
        def jac(x):
            return -jnp.ones((1, 1), x.dtype)

        res = lm_solve(hello_residual, jnp.array([0.5]), jac=jac)
        assert abs(float(res.x[0]) - 10.0) < 1e-6

    def test_jit_and_vmap(self):
        solve = jax.jit(lambda x0: lm_solve(hello_residual, x0).x)
        xs = jax.vmap(lambda v: solve(v))(jnp.linspace(-3, 3, 4)[:, None])
        np.testing.assert_allclose(np.asarray(xs), 10.0, atol=1e-5)

    def test_rosenbrock_style_2d(self):
        def residual(p):
            return jnp.array([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])

        res = lm_solve(residual, jnp.array([-1.2, 1.0]),
                       config=LMConfig(max_iterations=200))
        np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-4)


class TestCurveFit:
    def test_exponential_curve(self):
        # parity: ceres curve-fitting tutorial (m=0.3, c=0.1, sigma=0.2 data)
        rng = np.random.default_rng(0)
        x = np.linspace(0, 5, 68)
        y = np.exp(0.3 * x + 0.1) + 0.02 * rng.standard_normal(x.shape)

        res = lm_solve(
            exp_curve_residual,
            jnp.array([0.0, 0.0]),
            args=(jnp.asarray(x), jnp.asarray(y)),
            config=LMConfig(max_iterations=100),
        )
        m, c = np.asarray(res.x)
        assert abs(m - 0.3) < 0.02
        assert abs(c - 0.1) < 0.05

    def test_curve_fit_wrapper(self):
        def model(p, x):
            return p[0] * x + p[1]

        x = np.linspace(-1, 1, 32)
        y = 2.0 * x - 0.5
        res = curve_fit(model, x, y, jnp.array([0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(res.x), [2.0, -0.5], atol=1e-6)


class TestAngles:
    def test_wrap_to_pi(self):
        th = jnp.array([0.0, math.pi, -math.pi, 3 * math.pi, -3 * math.pi,
                        2 * math.pi + 0.1])
        w = np.asarray(wrap_to_pi(th))
        assert np.all(w > -math.pi - 1e-12) and np.all(w <= math.pi + 1e-12)
        np.testing.assert_allclose(np.cos(w), np.cos(np.asarray(th)),
                                   atol=1e-12)
        np.testing.assert_allclose(np.sin(w), np.sin(np.asarray(th)),
                                   atol=1e-12)
        assert abs(float(wrap_to_pi(2 * math.pi + 0.1)) - 0.1) < 1e-12

    def test_wrap_to_two_pi(self):
        th = jnp.array([-0.1, 2 * math.pi + 0.3, -7.0, 13.0])
        w = np.asarray(wrap_to_two_pi(th))
        assert np.all(w >= 0) and np.all(w < 2 * math.pi)
        np.testing.assert_allclose(np.cos(w), np.cos(np.asarray(th)),
                                   atol=1e-12)


class TestFileUtils:
    def test_roundtrip(self, tmp_path):
        d = tmp_path / "a" / "b"
        d.mkdir(parents=True)
        f = d / "x.txt"
        f.write_text("hi")
        assert file_exists(str(f))
        assert not file_exists(str(d))
        assert path_split("/a/b/c.txt") == ["a", "b", "c.txt"]
        assert paths_combine("/a/b", "../c") == "/a/c"
        assert remove_dir(str(d))
        assert not file_exists(str(f))
        assert not remove_dir(str(d))  # already gone


class TestPredicates:
    def test_vectors_near(self):
        assert testing.vectors_near([1.0, 2.0], [1.0, 2.00001], prec=1e-4)
        assert not testing.vectors_near([1.0], [1.1])
        assert not testing.vectors_near([1.0], [[1.0]])  # shape mismatch

    def test_assert_raises(self):
        with pytest.raises(AssertionError):
            testing.assert_matrices_near(np.eye(2), np.eye(2) * 2)
        testing.assert_vectors_near(jnp.ones(3), np.ones(3))
        with pytest.raises(AssertionError):
            testing.assert_vectors_near([np.nan], [0.0])
