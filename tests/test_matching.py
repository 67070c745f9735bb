"""Scan-registration tests: perturb-and-recover on a synthetic structured
scan, matching the reference's test design (wave_matching/tests/
icp_tests.cpp:13-197, gicp_tests.cpp, ndt_tests.cpp on testscan.pcd with
threshold ||T_est - T_true|| < 0.1; multi_matcher_tests.cpp for the batch
path; information-matrix sanity from icp_tests covariance cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu.geometry import se3, so3
from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.matching import (
    GICPParams,
    ICPParams,
    NDTParams,
    estimate_info_censi,
    estimate_info_lum,
    gicp_match,
    icp_match,
    knn,
    make_cloud,
    multi_match,
    ndt_match,
    nearest_neighbor,
    synthetic_scan,
    transform_cloud,
    voxel_downsample,
)
from libwave_tpu.utils.config import ConfigError, validate

THRESHOLD = 0.1  # reference icp_tests.cpp threshold


@pytest.fixture(scope="module")
def scan():
    return synthetic_scan(jax.random.key(0), n=4096, dtype=jnp.float64)


def perturbed(scan, dx=(0.0, 0.0, 0.0), drot=(0.0, 0.0, 0.0)):
    T = SE3(
        q=so3.exp_quat(jnp.asarray(drot, scan.points.dtype)),
        t=jnp.asarray(dx, scan.points.dtype),
    )
    return transform_cloud(T, scan), T


def t_diff(Ta: SE3, Tb: SE3):
    return float(jnp.linalg.norm(Ta.matrix() - Tb.matrix()))


class TestKNN:
    def test_matches_exact_oracle(self, rng):
        q = jnp.asarray(rng.normal(size=(64, 3)))
        t = jnp.asarray(rng.normal(size=(257, 3)))
        qm = jnp.ones(64, bool)
        tm = jnp.ones(257, bool)
        idx, d2 = nearest_neighbor(q, qm, t, tm, chunk=64)
        D = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(t)[None], axis=-1)
        np.testing.assert_array_equal(np.asarray(idx), np.argmin(D, axis=1))
        np.testing.assert_allclose(np.asarray(d2), np.min(D, axis=1) ** 2, atol=1e-9)

    def test_knn_k3(self, rng):
        q = jnp.asarray(rng.normal(size=(32, 3)))
        t = jnp.asarray(rng.normal(size=(100, 3)))
        idx, d2 = knn(q, jnp.ones(32, bool), t, jnp.ones(100, bool), k=3, chunk=32)
        D = np.linalg.norm(np.asarray(q)[:, None] - np.asarray(t)[None], axis=-1) ** 2
        expect = np.sort(D, axis=1)[:, :3]
        np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), expect, atol=1e-9)

    def test_masked_targets_excluded(self, rng):
        q = jnp.zeros((1, 3))
        t = jnp.asarray([[0.1, 0, 0], [5.0, 0, 0]])
        tm = jnp.asarray([False, True])
        idx, d2 = nearest_neighbor(q, jnp.ones(1, bool), t, tm)
        assert int(idx[0]) == 1


class TestVoxel:
    def test_downsample_merges(self):
        pts = jnp.asarray(
            [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [5.0, 5.0, 5.0]]
        )
        c = voxel_downsample(make_cloud(pts), leaf=0.1)
        assert int(c.count()) == 2

    def test_downsample_means(self):
        pts = jnp.asarray([[0.0, 0.0, 0.0], [0.08, 0.0, 0.0]])
        c = voxel_downsample(make_cloud(pts), leaf=0.1)
        kept = np.asarray(c.points)[np.asarray(c.mask)]
        np.testing.assert_allclose(kept, [[0.04, 0.0, 0.0]], atol=1e-9)


class TestICP:
    def test_param_validation(self):
        with pytest.raises(ConfigError):
            validate(ICPParams(max_iter=0))
        with pytest.raises(ConfigError):
            validate(ICPParams(covar_estimator="nope"))

    def test_null_displacement_fullres(self, scan):
        target, T_true = perturbed(scan)
        res = icp_match(scan, target, ICPParams(res=-1, multiscale_steps=0, max_iter=30))
        assert bool(res.converged)
        assert t_diff(res.transform, T_true) < THRESHOLD

    def test_small_displacement_downsampled(self, scan):
        target, T_true = perturbed(scan, dx=(0.2, 0.1, 0.0))
        res = icp_match(
            scan, target, ICPParams(res=0.05, multiscale_steps=0, max_iter=50)
        )
        assert bool(res.converged)
        assert t_diff(res.transform, T_true) < THRESHOLD

    @pytest.mark.slow
    def test_multiscale_larger_displacement(self, scan):
        """icp_tests.cpp:126-146 multiscale case."""
        target, T_true = perturbed(scan, dx=(0.5, 0.3, 0.0), drot=(0, 0, 0.05))
        res = icp_match(
            scan, target, ICPParams(res=0.1, multiscale_steps=3, max_iter=50)
        )
        assert bool(res.converged)
        assert t_diff(res.transform, T_true) < THRESHOLD

    def test_jit(self, scan):
        target, T_true = perturbed(scan, dx=(0.1, 0.0, 0.0))
        f = jax.jit(
            lambda r, t: icp_match(
                r, t, ICPParams(res=0.1, multiscale_steps=1, max_iter=30)
            )
        )
        res = f(scan, target)
        assert t_diff(res.transform, T_true) < THRESHOLD


class TestICPInfo:
    def test_lum_positive_definite(self, scan):
        target, _ = perturbed(scan, dx=(0.1, 0.05, 0.0))
        res = icp_match(scan, target, ICPParams(res=0.1, multiscale_steps=1))
        info = estimate_info_lum(res)
        w = np.linalg.eigvalsh(np.asarray(info))
        assert (w > 0).all(), w

    @pytest.mark.slow
    def test_censi_positive_definite(self, scan):
        target, _ = perturbed(scan, dx=(0.1, 0.0, 0.0))
        params = ICPParams(res=0.2, multiscale_steps=0, covar_estimator="CENSI")
        res = icp_match(scan, target, params)
        info = estimate_info_censi(res, params)
        w = np.linalg.eigvalsh(np.asarray(info))
        assert (w > 0).all(), w

    def test_more_points_more_information(self, scan):
        """Information should grow with correspondence count (LUM scales
        with N)."""
        target, _ = perturbed(scan, dx=(0.05, 0.0, 0.0))
        res_fine = icp_match(scan, target, ICPParams(res=0.05, multiscale_steps=0))
        res_coarse = icp_match(scan, target, ICPParams(res=1.0, multiscale_steps=0))
        i_fine = np.trace(np.asarray(estimate_info_lum(res_fine)))
        i_coarse = np.trace(np.asarray(estimate_info_lum(res_coarse)))
        assert i_fine > i_coarse


class TestGICP:
    def test_param_validation(self):
        with pytest.raises(ConfigError):
            validate(GICPParams(k_neighbors=2))

    def test_small_displacement(self, scan):
        target, T_true = perturbed(scan, dx=(0.2, 0.0, 0.1), drot=(0, 0, 0.02))
        res = gicp_match(
            scan, target, GICPParams(res=0.1, max_iter=50)
        )
        assert t_diff(res.transform, T_true) < THRESHOLD


class TestNDT:
    def test_param_validation(self):
        with pytest.raises(ConfigError):
            validate(NDTParams(res=0.01))

    def test_small_displacement(self, scan):
        target, T_true = perturbed(scan, dx=(0.3, 0.2, 0.0))
        res = ndt_match(scan, target, NDTParams(res=2.0, max_iter=60))
        assert t_diff(res.transform, T_true) < THRESHOLD, t_diff(
            res.transform, T_true
        )


@pytest.mark.slow
class TestMultiMatcher:
    def test_batch_of_8(self, scan):
        """8 simultaneous registrations (multi_matcher_tests.cpp:31-44 runs
        8 threads; here one vmapped program)."""
        B = 8
        shifts = np.linspace(-0.2, 0.2, B)
        targets, T_trues = [], []
        for s in shifts:
            t, T = perturbed(scan, dx=(s, 0.05, 0.0))
            targets.append(t)
            T_trues.append(T)
        refs = jax.tree.map(lambda *xs: jnp.stack(xs), *([scan] * B))
        tgts = jax.tree.map(lambda *xs: jnp.stack(xs), *targets)
        res = multi_match(
            refs, tgts, ICPParams(res=0.2, multiscale_steps=1, max_iter=30)
        )
        for b in range(B):
            Tb = SE3(q=res.transform.q[b], t=res.transform.t[b])
            assert t_diff(Tb, T_trues[b]) < THRESHOLD

    def test_sharded_over_mesh_matches_vmap(self, scan):
        """The multi-DEVICE promotion: one registration pair per device of
        the 8-device mesh, identical results to the single-device vmap."""
        from jax.sharding import Mesh

        from libwave_tpu.matching import multi_match_sharded

        B = 8
        shifts = np.linspace(-0.2, 0.2, B)
        targets = [perturbed(scan, dx=(s, 0.05, 0.0))[0] for s in shifts]
        refs = jax.tree.map(lambda *xs: jnp.stack(xs), *([scan] * B))
        tgts = jax.tree.map(lambda *xs: jnp.stack(xs), *targets)
        params = ICPParams(res=-1.0, multiscale_steps=0, max_iter=20)
        mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        res_s = multi_match_sharded(refs, tgts, mesh, params)
        res_v = multi_match(refs, tgts, params)
        np.testing.assert_allclose(
            np.asarray(res_s.transform.t), np.asarray(res_v.transform.t),
            atol=1e-8,
        )
        assert len(res_s.transform.t.sharding.device_set) == 8
        with pytest.raises(ValueError, match="divisible by the .* devices"):
            multi_match_sharded(
                jax.tree.map(lambda x: x[:3], refs),
                jax.tree.map(lambda x: x[:3], tgts), mesh, params,
            )
