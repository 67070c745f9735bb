"""Real-sensor fixture tests on the reference's own data.

The reference validates registration on one real lidar scan
(wave_matching/tests/data/testscan.pcd, used by every bound in
icp_tests.cpp:13-197 / gicp_tests.cpp / ndt_tests.cpp) and the vision stack
on real images (image_center.png / image_right.png matcher tests and the
10-frame tracker_test_sequence, tracker_tests.cpp:35-101). These tests run
the TPU-native implementations on exactly those fixtures — real sensor data
has structure (ground planes, outlier returns, repeated texture) synthetic
clouds/blobs don't.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu import native
from libwave_tpu.geometry import so3
from libwave_tpu.geometry.se3 import SE3
from libwave_tpu.matching import (
    GICPParams,
    ICPParams,
    NDTParams,
    estimate_info_censi,
    estimate_info_lum,
    gicp_match,
    icp_match,
    make_cloud,
    ndt_match,
    transform_cloud,
)
from libwave_tpu.vision.descriptor import BRISKParams, brisk_describe
from libwave_tpu.vision.detector import FASTParams, detect_fast
from libwave_tpu.vision.images import load_image, read_image_sequence
from libwave_tpu.vision.matcher import MatcherParams, match_descriptors

_REF = "/root/reference"
_SCAN = os.path.join(_REF, "wave_matching/tests/data/testscan.pcd")
_VISION_DATA = os.path.join(_REF, "wave_vision/tests/data")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF), reason="reference fixtures not mounted"
)

THRESHOLD = 0.1  # icp_tests.cpp:37 recovery bound


@pytest.fixture(scope="module")
def real_scan():
    """testscan.pcd voxel-downsampled to the fixed device capacity.

    The raw scan is 55,067 returns (including far-field outliers out to
    255 m); a 0.3 m exact voxel grid brings it to ~4,058 points, padded to
    a 4,096-point masked cloud. The reference feeds the raw scan and lets
    PCL's VoxelGrid downsample inside the matcher (icp.cpp:80-90); here the
    capacity reduction happens once on the host.
    """
    pts = native.load_pcd(_SCAN)
    pts = pts[np.isfinite(pts).all(axis=1)]
    ds = native.voxel_downsample_exact(pts, 0.3).astype(np.float64)
    cap = 4096
    assert len(ds) <= cap, len(ds)
    out = np.zeros((cap, 3))
    out[: len(ds)] = ds
    mask = np.arange(cap) < len(ds)
    return make_cloud(jnp.asarray(out), jnp.asarray(mask))


def _perturb(scan, dx=(0.0, 0.0, 0.0), drot=(0.0, 0.0, 0.0)):
    T = SE3(
        q=so3.exp_quat(jnp.asarray(drot, scan.points.dtype)),
        t=jnp.asarray(dx, scan.points.dtype),
    )
    return transform_cloud(T, scan), T


def _t_diff(Ta: SE3, Tb: SE3):
    return float(jnp.linalg.norm(Ta.matrix() - Tb.matrix()))


class TestICPRealScan:
    def test_null_displacement(self, real_scan):
        """icp_tests.cpp:44-61 fullResNullMatch on the real scan."""
        target, T_true = _perturb(real_scan)
        res = icp_match(
            real_scan, target,
            ICPParams(res=-1, multiscale_steps=0, max_iter=30),
        )
        assert bool(res.converged)
        assert _t_diff(res.transform, T_true) < THRESHOLD

    def test_small_displacement(self, real_scan):
        """icp_tests.cpp:126-146 0.2 m perturbation, recovered within 0.1."""
        target, T_true = _perturb(real_scan, dx=(0.2, 0.0, 0.0))
        res = icp_match(
            real_scan, target,
            ICPParams(res=-1, multiscale_steps=0, max_iter=50),
        )
        assert bool(res.converged)
        assert _t_diff(res.transform, T_true) < THRESHOLD

    @pytest.mark.slow
    def test_multiscale(self, real_scan):
        """Multiscale schedule on a bigger perturbation (rot + trans)."""
        target, T_true = _perturb(
            real_scan, dx=(0.3, 0.2, 0.0), drot=(0.0, 0.0, 0.03)
        )
        res = icp_match(
            real_scan, target,
            ICPParams(res=0.3, multiscale_steps=2, max_iter=50),
        )
        assert bool(res.converged)
        assert _t_diff(res.transform, T_true) < THRESHOLD

    def test_lum_info_on_distorted_scan(self, real_scan, rng):
        """icp_tests.cpp:152-197 lumvslum: distort the target with uniform
        noise (exact alignment would give infinite information), then the
        LUM information must be finite and positive definite."""
        target, _ = _perturb(real_scan, dx=(0.2, 0.0, 0.0))
        noisy = target._replace(
            points=target.points
            + jnp.asarray(rng.uniform(-0.3, 0.3, target.points.shape))
            * target.mask[:, None]
        )
        res = icp_match(
            real_scan, noisy,
            ICPParams(res=-1, multiscale_steps=0, max_iter=30),
        )
        info = np.asarray(estimate_info_lum(res))
        assert np.isfinite(info).all()
        assert info[0, 0] > 0  # EXPECT_GT(info1(0,0), 0)
        w = np.linalg.eigvalsh(info)
        assert (w > 0).all(), w

    @pytest.mark.slow
    def test_censi_info_positive_definite(self, real_scan):
        target, _ = _perturb(real_scan, dx=(0.1, 0.0, 0.0))
        params = ICPParams(res=-1, multiscale_steps=0, covar_estimator="CENSI")
        res = icp_match(real_scan, target, params)
        info = np.asarray(estimate_info_censi(res, params))
        assert np.isfinite(info).all()
        w = np.linalg.eigvalsh(info)
        assert (w > 0).all(), w


class TestGICPRealScan:
    @pytest.mark.slow
    def test_small_displacement(self, real_scan):
        """gicp_tests.cpp:82-99: 0.2 m perturbation within 0.1."""
        target, T_true = _perturb(real_scan, dx=(0.2, 0.0, 0.0))
        res = gicp_match(
            real_scan, target, GICPParams(res=-1.0, max_iter=50)
        )
        assert _t_diff(res.transform, T_true) < THRESHOLD


class TestNDTRealScan:
    @pytest.mark.slow
    def test_small_displacement(self, real_scan):
        """ndt_tests.cpp:84-101: 0.2 m perturbation within 0.12 (the NDT
        threshold is looser in the reference too)."""
        target, T_true = _perturb(real_scan, dx=(0.2, 0.0, 0.0))
        res = ndt_match(real_scan, target, NDTParams(res=5.0, max_iter=60))
        assert _t_diff(res.transform, T_true) < 0.12


class TestGroundSegmentationRealScan:
    @pytest.mark.slow
    def test_gp_insac_on_real_scan(self):
        """GP-INSAC on the real vehicle-lidar scan: the labeled ground
        must sit clearly below the obstacle mass (the structure synthetic
        clouds can't provide — slopes, clutter, far returns)."""
        from libwave_tpu.matching import (
            GroundSegmentationParams,
            segment_ground,
        )

        raw = native.load_pcd(_SCAN)
        raw = raw[np.isfinite(raw).all(axis=1)]
        near = raw[
            (np.linalg.norm(raw[:, :2], axis=1) < 50)
            & (raw[:, 2] > -5) & (raw[:, 2] < 5)
        ]
        ds = native.voxel_downsample_exact(near, 0.25).astype(np.float64)
        n = 8192
        pts = np.zeros((n, 3))
        m = np.zeros(n, bool)
        k = min(len(ds), n)
        pts[:k] = ds[:k]
        m[:k] = True
        res = segment_ground(
            make_cloud(jnp.asarray(pts), jnp.asarray(m)),
            GroundSegmentationParams(rmax=50.0),
        )
        g = np.asarray(res.ground_mask)[:k]
        o = np.asarray(res.obstacle_mask)[:k]
        z = pts[:k, 2]
        assert 0.05 <= g.mean() <= 0.6, g.mean()
        assert o.mean() >= 0.1, o.mean()
        # ground must be genuinely below the obstacles around it
        assert z[g].mean() < z[o].mean() - 0.5, (z[g].mean(), z[o].mean())


class TestRealImageMatching:
    """BruteForce matcher tests on image_center.png / image_right.png —
    the reference's two-view matcher fixtures
    (wave_vision/tests/matcher_tests and the tracker test images)."""

    @pytest.fixture(scope="class")
    def pair(self):
        c = load_image(os.path.join(_VISION_DATA, "image_center.png"))
        r = load_image(os.path.join(_VISION_DATA, "image_right.png"))
        return jnp.asarray(c, jnp.float32), jnp.asarray(r, jnp.float32)

    def test_fast_brisk_match_real_pair(self, pair):
        img1, img2 = pair
        fp = FASTParams(threshold=20.0, num_features=512)
        xy1, _, m1 = detect_fast(img1, fp)
        xy2, _, m2 = detect_fast(img2, fp)
        assert int(m1.sum()) >= 300, int(m1.sum())
        assert int(m2.sum()) >= 300, int(m2.sum())
        d1, m1 = brisk_describe(img1, xy1, m1, BRISKParams())
        d2, m2 = brisk_describe(img2, xy2, m2, BRISKParams())
        idx2, valid, diag = match_descriptors(
            d1, d2, xy1, xy2, m1, m2, jax.random.key(0),
            MatcherParams(use_fused_top2=False),
        )
        good = int(diag["num_good_matches"])
        filtered = int(diag["num_filtered_matches"])
        # real-texture pair: a healthy fraction must survive ratio test +
        # RANSAC (the reference asserts non-empty; be stricter)
        assert filtered >= 50, filtered
        assert good >= 30, good
        # epipolar-consistent matches of a mostly-horizontal camera motion:
        # median vertical displacement stays small vs horizontal spread
        disp = np.asarray(xy2[idx2] - xy1)[np.asarray(valid)]
        assert abs(np.median(disp[:, 1])) < 30.0, np.median(disp, axis=0)


class TestTrackerRealSequence:
    """Tracker behavior on the real 10-frame sequence
    (tracker_tests.cpp:35-101): persistent IDs across frames and the
    sliding-window purge."""

    @pytest.fixture(scope="class")
    def frames(self):
        seq = read_image_sequence(
            os.path.join(_VISION_DATA, "tracker_test_sequence")
        )
        assert seq.shape == (10, 1024, 1280)
        return jnp.asarray(seq, jnp.float32)

    @pytest.fixture(scope="class")
    def tracked(self, frames):
        from libwave_tpu.vision.tracker import (
            TrackerParams, add_image_features, tracker_init,
        )

        fp = FASTParams(threshold=20.0, num_features=256)
        params = TrackerParams(
            num_features=256, buffer_capacity=8192,
            matcher=MatcherParams(use_fused_top2=False),
        )
        state = tracker_init(params, desc_words=len(_brisk_words()))
        key = jax.random.key(3)
        for i in range(frames.shape[0]):
            xy, _, m = detect_fast(frames[i], fp)
            d, m = brisk_describe(frames[i], xy, m, BRISKParams())
            key, k = jax.random.split(key)
            state = add_image_features(
                state, xy, d, m, float(i) * 0.1, k, params
            )
        return state, params

    def test_tracks_exist_and_persist(self, tracked):
        from libwave_tpu.containers.landmark import get_landmark_ids

        state, params = tracked
        buf = state.landmarks
        n_meas = int(buf.valid.sum())
        ids, count = get_landmark_ids(buf, max_ids=4096)
        n_ids = int(count)
        assert n_meas >= 200, n_meas
        assert n_ids >= 50, n_ids
        # multi-frame tracks: measurements outnumber ids by a real margin
        # (tracker_tests track-length assertions)
        assert n_meas >= 2 * n_ids, (n_meas, n_ids)
        # at least some landmarks persist >= 4 frames on real texture
        lm = np.asarray(buf.landmark_ids)[np.asarray(buf.valid)]
        lengths = np.bincount(lm)
        assert (lengths >= 4).sum() >= 10, lengths.max()

    def test_sliding_window_purges(self, frames):
        """window_size=3 keeps only the newest 3 images' measurements
        (impl/tracker.hpp:90-101)."""
        from libwave_tpu.vision.tracker import (
            TrackerParams, add_image_features, tracker_init,
        )

        fp = FASTParams(threshold=20.0, num_features=128)
        params = TrackerParams(
            window_size=3, num_features=128, buffer_capacity=4096,
            matcher=MatcherParams(use_fused_top2=False),
        )
        state = tracker_init(params, desc_words=len(_brisk_words()))
        key = jax.random.key(4)
        n_use = 6
        for i in range(n_use):
            xy, _, m = detect_fast(frames[i], fp)
            d, m = brisk_describe(frames[i], xy, m, BRISKParams())
            key, k = jax.random.split(key)
            state = add_image_features(
                state, xy, d, m, float(i) * 0.1, k, params
            )
        buf = state.landmarks
        imgs = np.asarray(buf.images)[np.asarray(buf.valid)]
        assert imgs.size > 0
        assert imgs.min() >= n_use - 3, imgs.min()


def _brisk_words():
    """Descriptor word count for the default BRISK pattern."""
    from libwave_tpu.vision.descriptor import _brisk_pattern

    pts, _, short, _ = _brisk_pattern(BRISKParams())
    n_bits = len(short)
    return range((n_bits + 31) // 32)
