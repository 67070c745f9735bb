"""Distributed BA on the virtual 8-device mesh.

The multi-device analog of the reference's only concurrency test
(wave_matching/tests/multi_matcher_tests.cpp:31-44, 8 threads): same solve,
N devices, identical numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu.optim import BAConfig, BAState, ba_cost, ba_from_dataset
from libwave_tpu.optim.ba import _lm_iteration
from libwave_tpu.parallel import (
    MeshConfig,
    distributed_lm_step,
    make_mesh,
    shard_ba_problem,
)
from libwave_tpu.sim import VoSimParams, generate_vo_dataset
from libwave_tpu.geometry import so3


@pytest.fixture(scope="module")
def problem_state():
    ds = generate_vo_dataset(
        VoSimParams(nb_landmarks=64, steps=120, fx=200.0, fy=200.0, hz=10.0),
        jax.random.key(5),
    )
    problem, gt = ba_from_dataset(ds)
    key = jax.random.key(9)
    k1, k2, k3 = jax.random.split(key, 3)
    N, M = gt.q.shape[0], gt.lm.shape[0]
    free = jnp.asarray(np.asarray(problem.free_pose))[:, None]
    init = BAState(
        q=so3.quat_boxplus(gt.q, 0.02 * jax.random.normal(k1, (N, 3), gt.p.dtype) * free),
        p=gt.p + 0.05 * jax.random.normal(k2, (N, 3), gt.p.dtype) * free,
        lm=gt.lm + 0.3 * jax.random.normal(k3, (M, 3), gt.p.dtype),
    )
    return problem, gt, init


class TestMesh:
    def test_make_mesh_8(self):
        mesh = make_mesh(MeshConfig(dp=-1, tp=2))
        assert mesh.shape == {"dp": 4, "tp": 2}

    def test_bad_factorization(self):
        with pytest.raises(ValueError):
            make_mesh(MeshConfig(dp=3, tp=2))


class TestDistributedBA:
    def test_matches_single_device(self, problem_state):
        """The sharded LM step must produce the same numbers as the local
        one (same algorithm, just distributed)."""
        problem, gt, init = problem_state
        cfg = BAConfig(cg_max_iters=50)

        # local reference step
        cost0 = ba_cost(problem, init)
        carry = (init, jnp.asarray(1e-4, init.p.dtype), cost0, jnp.asarray(False))
        carry, _ = _lm_iteration(problem, cfg, carry, None)
        local_state, _, local_cost, _ = carry

        mesh = make_mesh(MeshConfig(dp=4, tp=2))
        sp, ss = shard_ba_problem(problem, init, mesh)
        dist_state, dist_cost = distributed_lm_step(sp, ss, cfg)

        np.testing.assert_allclose(float(dist_cost), float(local_cost), rtol=1e-7)
        M = gt.lm.shape[0]
        np.testing.assert_allclose(
            np.asarray(dist_state.lm)[:M], np.asarray(local_state.lm), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(dist_state.p), np.asarray(local_state.p), atol=1e-8
        )

    def test_step_reduces_cost(self, problem_state):
        problem, gt, init = problem_state
        mesh = make_mesh(MeshConfig(dp=8, tp=1))
        sp, ss = shard_ba_problem(problem, init, mesh)
        state, cost = distributed_lm_step(sp, ss, BAConfig())
        assert float(cost) < float(ba_cost(problem, init))
