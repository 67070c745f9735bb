"""Full VIO factor-graph tests (BASELINE config 4 in synthetic form):
reprojection + IMU preintegration + bias random walk over combined keyframe
states, solved with Schur elimination. The solver must recover trajectory,
velocities, and landmark structure from perturbed initialization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu.geometry import so3
from libwave_tpu.pipelines import (VIOConfig, VIOState, solve_vio,
                                   solve_vio_staged, vio_from_sim)
from libwave_tpu.pipelines.vio import vio_cost
from libwave_tpu.sim import VoSimParams, generate_vo_dataset

pytestmark = pytest.mark.slow  # full VIO solves (compile-heavy)


@pytest.fixture(scope="module")
def vio_setup():
    ds = generate_vo_dataset(
        VoSimParams(nb_landmarks=60, steps=200, fx=200.0, fy=200.0, hz=10.0),
        jax.random.key(4),
    )
    problem, gt = vio_from_sim(
        ds, pixel_noise=0.5, imu_gyro_sigma=1e-4, imu_accel_sigma=1e-3,
        key=jax.random.key(8),
    )
    return problem, gt


class TestVIO:
    def test_cost_near_zero_at_truth(self, vio_setup):
        problem, gt = vio_setup
        c = float(vio_cost(problem, gt))
        # noise-level cost only (pixels ~ 0.5 px whitened, IMU whitened)
        n_obs = problem.uv.shape[0]
        assert c < 6.0 * n_obs, c

    def test_perturb_and_recover(self, vio_setup):
        problem, gt = vio_setup
        N = gt.q.shape[0]
        M = gt.lm.shape[0]
        key = jax.random.key(13)
        ks = jax.random.split(key, 5)
        free = problem.free_pose[:, 0:3]
        init = VIOState(
            q=so3.quat_boxplus(
                gt.q, 0.02 * jax.random.normal(ks[0], (N, 3), gt.p.dtype) * free
            ),
            p=gt.p + 0.05 * jax.random.normal(ks[1], (N, 3), gt.p.dtype) * free,
            v=gt.v + 0.1 * jax.random.normal(ks[2], (N, 3), gt.p.dtype),
            bg=jnp.zeros((N, 3), gt.p.dtype),
            ba=jnp.zeros((N, 3), gt.p.dtype),
            lm=gt.lm + 0.3 * jax.random.normal(ks[4], (M, 3), gt.p.dtype),
        )
        state, info = jax.jit(
            lambda pr, st: solve_vio(
                pr, st, VIOConfig(max_iterations=25, cg_max_iters=150)
            )
        )(problem, init)

        assert float(info["final_cost"]) < float(info["initial_cost"]) * 0.01

        pos_err = jnp.linalg.norm(state.p - gt.p, axis=-1)
        rot_err = so3.rotation_distance(state.q, gt.q)
        vel_err = jnp.linalg.norm(state.v - gt.v, axis=-1)
        assert float(jnp.max(pos_err)) < 0.05, pos_err
        assert float(jnp.max(rot_err)) < 0.02, rot_err
        assert float(jnp.max(vel_err)) < 0.2, vel_err

    def test_gauge_mask_pose_only(self, vio_setup):
        """Only the first keyframe's 6 pose coordinates are gauge-fixed;
        its velocity and biases stay free (freezing them strands the solve
        in a high-cost valley when the initial velocity is wrong)."""
        problem, gt = vio_setup
        free = np.asarray(problem.free_pose)
        assert free.shape[1] == 15
        assert (free[0, 0:6] == 0).all()
        assert (free[0, 6:] == 1).all()
        assert (free[1:] == 1).all()
