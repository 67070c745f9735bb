"""Schur-complement marginalization (optim.marginalization).

The primitive behind the windowed solvers' prior chain: marginalizing
coordinates out of a Gaussian information form must reproduce the exact
profile (minimized-over) quadratic, and the device-side reduced-Hessian
builders it consumes must agree with autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu.optim.marginalization import schur_marginalize


class TestSchurMarginalize:
    def test_profile_quadratic_exact(self, rng):
        """min over x_o of 0.5 x^T H x - b^T x equals
        0.5 x_k^T Lam x_k - b_m^T x_k + const for every x_k."""
        n, k = 12, 5
        A = rng.standard_normal((n, n))
        H = A @ A.T + 0.5 * np.eye(n)
        b = rng.standard_normal(n)
        Lam, b_m = schur_marginalize(H, b, keep_dim=k)

        def full(x):
            return 0.5 * x @ H @ x - b @ x

        def profile(xk):
            Hoo = H[: n - k, : n - k]
            xo = np.linalg.solve(Hoo, b[: n - k] - H[: n - k, n - k :] @ xk)
            return full(np.concatenate([xo, xk]))

        const = profile(np.zeros(k))
        for _ in range(4):
            xk = rng.standard_normal(k)
            got = 0.5 * xk @ Lam @ xk - b_m @ xk + const
            np.testing.assert_allclose(got, profile(xk), rtol=1e-8,
                                       atol=1e-10)

    def test_psd_projection(self, rng):
        """Indefinite input curvature (f32 accumulation noise) is clipped
        to PSD and the rhs projected onto the surviving range."""
        n, k = 8, 4
        A = rng.standard_normal((n, n))
        H = A @ A.T + 0.5 * np.eye(n)
        # corrupt the keep-block so the complement has a negative eigenvalue
        H[n - 1, n - 1] -= 500.0
        b = rng.standard_normal(n)
        Lam, b_m = schur_marginalize(H, b, keep_dim=k)
        w = np.linalg.eigvalsh(Lam)
        assert w.min() >= -1e-9
        # b_m lies in the range of Lam (no unbounded linear directions)
        x = np.linalg.lstsq(Lam, b_m, rcond=None)[0]
        np.testing.assert_allclose(Lam @ x, b_m, atol=1e-8 * max(
            1.0, np.abs(b_m).max()))

    def test_keep_all_is_identity(self, rng):
        H = np.eye(3) * 2.0
        b = rng.standard_normal(3)
        Lam, b_m = schur_marginalize(H, b, keep_dim=3)
        np.testing.assert_allclose(Lam, H)
        np.testing.assert_allclose(b_m, b)


class TestVIOPriorFactor:
    """The dense head prior in the VIO solver: its cost/gradient/Hessian
    contributions must match autodiff of 0.5 d^T Lam d - b^T d."""

    def _problem(self, rng, O=2, N=4):
        from libwave_tpu.optim.imu import (
            imu_sqrt_info,
            preintegrate_imu,
            simulate_imu,
        )
        from libwave_tpu.pipelines.vio import (
            VIOProblem,
            VIOState,
            vio_cost,
        )
        from libwave_tpu.optim import schur

        # minimal consistent problem: static states, small obs bank
        M = 6
        lm = jnp.asarray(rng.uniform(-2, 2, (M, 3))) + jnp.asarray(
            [0.0, 0.0, 8.0]
        )
        q = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (N, 1))
        p = jnp.asarray(rng.uniform(-0.1, 0.1, (N, 3)))
        Kc = jnp.asarray([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
        pose_idx = np.repeat(np.arange(N, dtype=np.int32), M)
        lm_idx = np.tile(np.arange(M, dtype=np.int32), N)
        uv = rng.uniform(0, 200, (N * M, 2))
        pose_ell, lm_ell, pad_mask, ell, uv_p = schur.pack_observations(
            pose_idx, lm_idx, N, M, uv
        )
        z3 = jnp.zeros(3)
        gyro = jnp.asarray(rng.normal(0, 1e-3, (N - 1, 5, 3)))
        acc = jnp.asarray(
            rng.normal(0, 1e-2, (N - 1, 5, 3))
        ) + jnp.asarray([0.0, 0, 9.81])
        pim = jax.vmap(
            lambda g, a: preintegrate_imu(g, a, 0.01, z3, z3)
        )(gyro, acc)
        sq = jax.vmap(imu_sqrt_info)(pim)

        P = O * 15
        A = rng.standard_normal((P, P))
        Lam = jnp.asarray(A @ A.T + np.eye(P))
        b = jnp.asarray(rng.standard_normal(P))
        mean_q = jax.vmap(
            lambda v: jnp.asarray([1.0, 0, 0, 0])
        )(jnp.arange(O))
        problem = VIOProblem(
            K=Kc, pose_idx=pose_ell, lm_idx=lm_ell, uv=uv_p,
            obs_weight=pad_mask,
            pim=pim,
            imu_i=jnp.arange(N - 1, dtype=jnp.int32),
            imu_j=jnp.arange(1, N, dtype=jnp.int32),
            imu_sqrt_info=sq,
            bias_walk_sqrt_info=jnp.full((6,), 10.0),
            free_pose=jnp.ones((N, 15)),
            ell=ell,
            prior_Lambda=Lam,
            prior_b=b,
            prior_q=mean_q,
            prior_p=jnp.asarray(rng.uniform(-0.05, 0.05, (O, 3))),
            prior_v=jnp.asarray(rng.uniform(-0.05, 0.05, (O, 3))),
            prior_bg=jnp.zeros((O, 3)),
            prior_ba=jnp.zeros((O, 3)),
        )
        state = VIOState(
            q=q, p=p, v=jnp.zeros((N, 3)),
            bg=jnp.zeros((N, 3)), ba=jnp.zeros((N, 3)), lm=lm,
        )
        return problem, state

    def test_prior_cost_matches_quadratic(self, rng):
        from libwave_tpu.pipelines.vio import _prior_delta, vio_cost

        problem, state = self._problem(rng)
        base = problem._replace(
            prior_Lambda=None, prior_b=None, prior_q=None, prior_p=None,
            prior_v=None, prior_bg=None, prior_ba=None,
        )
        d = np.asarray(_prior_delta(problem, state))
        Lam = np.asarray(problem.prior_Lambda)
        b = np.asarray(problem.prior_b)
        expect = 0.5 * d @ Lam @ d - b @ d
        got = float(vio_cost(problem, state) - vio_cost(base, state))
        np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-8)

    def test_reduced_hessian_prior_block_matches_autodiff(self, rng):
        """vio_reduced_hessian with ONLY the prior live (obs + IMU silenced)
        must return exactly (Lambda, b - Lambda d) in the head block."""
        from libwave_tpu.pipelines.vio import (
            _prior_delta,
            vio_reduced_hessian,
        )

        problem, state = self._problem(rng)
        silent = problem._replace(
            obs_weight=jnp.zeros_like(problem.obs_weight),
            imu_sqrt_info=jnp.zeros_like(problem.imu_sqrt_info),
            bias_walk_sqrt_info=jnp.zeros_like(
                problem.bias_walk_sqrt_info
            ),
        )
        H, b = vio_reduced_hessian(silent, state)
        P = problem.prior_Lambda.shape[0]
        np.testing.assert_allclose(
            np.asarray(H)[:P, :P], np.asarray(problem.prior_Lambda),
            rtol=1e-7, atol=1e-7,
        )
        assert np.abs(np.asarray(H)[P:, P:]).max() < 1e-6
        d = np.asarray(_prior_delta(problem, state))
        expect_b = np.asarray(problem.prior_b) - np.asarray(
            problem.prior_Lambda
        ) @ d
        np.testing.assert_allclose(
            np.asarray(b)[:P], expect_b, rtol=1e-7, atol=1e-7
        )
        assert np.abs(np.asarray(b)[P:]).max() < 1e-8
