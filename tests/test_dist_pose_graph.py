"""Sequence-parallel pose graph: block solve == single-device solve.

The distributed analog of the reference's only concurrency test
(wave_matching/tests/multi_matcher_tests.cpp:31-44): the same optimization,
partitioned over the virtual 8-device mesh, must produce the same numbers.
Covers the three communication paths explicitly: halo (adjacent-block
factors in both directions), separators (long-range loop closures including
an end-to-start wrap), and padding (N not divisible by the block count).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from libwave_tpu.geometry import so3
from libwave_tpu.optim.pose_graph import (
    BetweenBank,
    PoseGraphConfig,
    PriorBank,
    between_from_trajectory,
    pose_graph_cost,
    solve_pose_graph,
)
from libwave_tpu.parallel import (
    partition_pose_graph,
    solve_pose_graph_blocks,
    unpartition,
)

pytestmark = pytest.mark.slow  # distributed solves on the 8-device mesh

N_POSES = 197  # deliberately not divisible by 8: exercises block padding


def _circle_trajectory(n, dtype=jnp.float64):
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    p = np.stack(
        [10 * np.cos(theta), 10 * np.sin(theta), 0.1 * np.sin(3 * theta)],
        axis=-1,
    )
    yaw = theta + np.pi / 2
    q = np.stack(
        [np.cos(yaw / 2), 0 * yaw, 0 * yaw, np.sin(yaw / 2)], axis=-1
    )
    return jnp.asarray(q, dtype), jnp.asarray(p, dtype)


def _closure(q, p, i, j, sigma_rot=1e-2, sigma_trans=1e-2):
    """Ground-truth relative-pose measurement i -> j."""
    qi_inv = so3.quat_inverse(q[i])
    dq = so3.quat_multiply(qi_inv, q[j])
    dp = so3.quat_rotate(qi_inv, p[j] - p[i])
    si = jnp.concatenate(
        [jnp.full(3, 1.0 / sigma_rot, p.dtype), jnp.full(3, 1.0 / sigma_trans, p.dtype)]
    )
    return dq, dp, si


def _concat_banks(a: BetweenBank, b: BetweenBank) -> BetweenBank:
    return BetweenBank(*[
        jnp.concatenate([x, y], axis=0) for x, y in zip(a, b)
    ])


@pytest.fixture(scope="module")
def graph():
    """Noisy odometry + loop closures spanning every communication path."""
    q, p = _circle_trajectory(N_POSES)
    key = jax.random.key(3)
    odo = between_from_trajectory(
        q, p, sigmas_rot=1e-3, sigmas_trans=1e-3, noise_key=key
    )
    # loop closures (all ground-truth):
    #  (75, 74): span -1, backward halo across a block boundary (nb = 25)
    #  (10, 160), (30, 120): long-range separators
    #  (190, 2): end-to-start wrap — separator, not ring halo
    #  (60, 110), (110, 60): both directions onto the same separator pose
    pairs = [(75, 74), (10, 160), (30, 120), (190, 2), (60, 110), (110, 60)]
    cl_i, cl_j, cl_dq, cl_dp, cl_si = [], [], [], [], []
    for i, j in pairs:
        dq, dp, si = _closure(q, p, i, j)
        cl_i.append(i)
        cl_j.append(j)
        cl_dq.append(dq)
        cl_dp.append(dp)
        cl_si.append(si)
    closures = BetweenBank(
        i=jnp.asarray(cl_i, jnp.int32),
        j=jnp.asarray(cl_j, jnp.int32),
        dq=jnp.stack(cl_dq),
        dp=jnp.stack(cl_dp),
        sqrt_info=jnp.stack(cl_si),
    )
    between = _concat_banks(odo, closures)

    # perturbed initial estimate (gauge pose 0 stays exact)
    k1, k2 = jax.random.split(jax.random.key(7))
    mask = jnp.ones((N_POSES, 1), p.dtype).at[0].set(0.0)
    q0 = so3.quat_boxplus(
        q, 0.03 * jax.random.normal(k1, (N_POSES, 3), p.dtype) * mask
    )
    p0 = p + 0.1 * jax.random.normal(k2, (N_POSES, 3), p.dtype) * mask
    return q, p, q0, p0, between


def _mesh8():
    return Mesh(np.asarray(jax.devices()[:8]), ("sp",))


class TestEquivalence:
    def test_matches_single_device(self, graph):
        """Core claim of dist_pose_graph (docstring at
        solve_pose_graph_blocks): block solve == solve_pose_graph to float
        tolerance, with halos, separators, wrap closure, and padding."""
        q, p, q0, p0, between = graph
        cfg = PoseGraphConfig(max_iterations=10, cg_max_iters=80)

        q_ref, p_ref, info_ref = solve_pose_graph(
            q0, p0, between, cfg=cfg
        )

        g = partition_pose_graph(q0, p0, between, None, n_blocks=8)
        qb, pb, info = solve_pose_graph_blocks(g, _mesh8(), cfg=cfg)
        q_d, p_d = unpartition(qb, pb, N_POSES)

        np.testing.assert_allclose(
            float(info["final_cost"]), float(info_ref["final_cost"]),
            rtol=1e-8,
        )
        np.testing.assert_allclose(np.asarray(p_d), np.asarray(p_ref), atol=1e-7)
        # quaternion sign is a gauge freedom; compare rotations
        dq = np.abs(np.sum(np.asarray(q_d) * np.asarray(q_ref), axis=-1))
        np.testing.assert_allclose(dq, 1.0, atol=1e-9)

    def test_matches_with_priors(self, graph):
        """Soft-gauge variant: priors on the first two poses, all poses free
        (the gtsam_offline_example gauge, gtsam_offline_example.cpp:123-130)."""
        q, p, q0, p0, between = graph
        priors = PriorBank(
            i=jnp.asarray([0, 1], jnp.int32),
            q=q[:2],
            p=p[:2],
            sqrt_info=jnp.full((2, 6), 1e4, p.dtype),
        )
        cfg = PoseGraphConfig(max_iterations=8, cg_max_iters=80)
        q_ref, p_ref, info_ref = solve_pose_graph(
            q0, p0, between, priors, cfg=cfg
        )
        g = partition_pose_graph(q0, p0, between, priors, n_blocks=8)
        qb, pb, info = solve_pose_graph_blocks(g, _mesh8(), cfg=cfg)
        q_d, p_d = unpartition(qb, pb, N_POSES)
        np.testing.assert_allclose(
            float(info["final_cost"]), float(info_ref["final_cost"]),
            rtol=1e-8,
        )
        np.testing.assert_allclose(np.asarray(p_d), np.asarray(p_ref), atol=1e-7)

    def test_solve_improves_cost(self, graph):
        q, p, q0, p0, between = graph
        g = partition_pose_graph(q0, p0, between, None, n_blocks=8)
        qb, pb, info = solve_pose_graph_blocks(
            g, _mesh8(), cfg=PoseGraphConfig(max_iterations=10)
        )
        c0 = pose_graph_cost(q0, p0, between, None)
        assert float(info["final_cost"]) < 1e-3 * float(c0)


class TestBlockCountGuard:
    def test_mismatch_raises(self, graph):
        """Blocks != devices must be a loud error, not silent truncation
        (ADVICE.md round 1: 8 blocks on a 4-device mesh returned half the
        trajectory)."""
        q, p, q0, p0, between = graph
        g = partition_pose_graph(q0, p0, between, None, n_blocks=4)
        with pytest.raises(ValueError, match="blocks"):
            solve_pose_graph_blocks(g, _mesh8())


class TestPartitioner:
    def test_roundtrip_unpartition(self, graph):
        q, p, q0, p0, between = graph
        g = partition_pose_graph(q0, p0, between, None, n_blocks=8)
        qr, pr = unpartition(g.q, g.p, N_POSES)
        np.testing.assert_array_equal(np.asarray(qr), np.asarray(q0))
        np.testing.assert_array_equal(np.asarray(pr), np.asarray(p0))
        # padding poses are frozen
        free_flat = np.asarray(g.free).reshape(-1)
        assert (free_flat[N_POSES:] == 0).all()

    def test_separators_found(self, graph):
        q, p, q0, p0, between = graph
        g = partition_pose_graph(q0, p0, between, None, n_blocks=8)
        # long-range targets 160, 120, 2, 110, 60 -> 5 separators + dummy
        assert g.sep_mask.shape[0] == 6
        assert float(g.sep_mask[0]) == 0.0
        sep_global = (
            np.asarray(g.sep_block) * g.q.shape[1] + np.asarray(g.sep_local)
        )
        assert set(sep_global[1:].tolist()) == {160, 120, 2, 110, 60}
