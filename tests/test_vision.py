"""Vision front-end tests on synthetic imagery.

Parity with the reference's detector/descriptor/matcher/tracker tests
(wave_vision/tests/*): param validation (constructor throws), detection on
known corners, match correctness under translation, RANSAC outlier rejection,
tracker ID persistence and sliding-window purge. The reference uses real
image fixtures; here images are synthesized (random blob textures with known
warps) so expected geometry is exact.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu.utils.config import ConfigError, validate
from libwave_tpu.vision import (
    BRISKParams,
    FASTParams,
    MatcherParams,
    ORBDescriptorParams,
    ORBDetectorParams,
    TrackerParams,
    add_image_features,
    brisk_describe,
    detect_fast,
    detect_orb,
    find_fundamental_ransac,
    hamming_distance_matrix,
    match_descriptors,
    orb_describe,
    tracker_init,
)
from libwave_tpu.vision.detector import fast_score, nonmax_suppress
from libwave_tpu.containers.landmark import get_track, landmark_size


def blob_image(rng, H=120, W=160, n_blobs=40, seed_shift=(0, 0)):
    """Random Gaussian blob texture; translate by shifting blob centers."""
    ys = rng.uniform(10, H - 10, n_blobs) + seed_shift[0]
    xs = rng.uniform(10, W - 10, n_blobs) + seed_shift[1]
    amps = rng.uniform(50, 200, n_blobs)
    sig = rng.uniform(1.5, 3.0, n_blobs)
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.zeros((H, W))
    for y, x, a, s in zip(ys, xs, amps, sig):
        img += a * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * s * s))
    return jnp.asarray(img, dtype=jnp.float32)


@pytest.fixture(scope="module")
def img_pair():
    rng = np.random.default_rng(0)
    state = rng.bit_generator.state
    img1 = blob_image(rng)
    rng.bit_generator.state = state  # same blobs
    img2 = blob_image(rng, seed_shift=(3, 5))  # shift dy=3, dx=5
    return img1, img2


class TestParamValidation:
    """Constructor-throws parity (e.g. fast_tests.cpp:9-80)."""

    def test_fast_bad_threshold(self):
        with pytest.raises(ConfigError):
            validate(FASTParams(threshold=0))

    def test_fast_bad_type(self):
        with pytest.raises(ConfigError):
            validate(FASTParams(type="9_17"))

    def test_orb_bad_levels(self):
        with pytest.raises(ConfigError):
            validate(ORBDetectorParams(num_levels=0))

    def test_brisk_mismatched_lists(self):
        with pytest.raises(ConfigError):
            validate(BRISKParams(radius_list=(0.0, 1.0), number_list=(1,)))

    def test_brisk_dmax_dmin(self):
        with pytest.raises(ConfigError):
            validate(BRISKParams(d_max=9.0, d_min=8.0))

    def test_matcher_bad_ratio(self):
        with pytest.raises(ConfigError):
            validate(MatcherParams(ratio_threshold=1.5))

    def test_matcher_bad_fm(self):
        with pytest.raises(ConfigError):
            validate(MatcherParams(fm_method="7point-nope"))

    def test_tracker_negative_window(self):
        with pytest.raises(ConfigError):
            validate(TrackerParams(window_size=-1))


class TestFAST:
    def test_detects_synthetic_corner(self):
        """A bright square on dark background has corners at its corners."""
        img = jnp.zeros((64, 64), dtype=jnp.float32)
        img = img.at[20:40, 20:40].set(200.0)
        xy, resp, mask = detect_fast(img, FASTParams(num_features=16))
        found = np.asarray(xy)[np.asarray(mask)]
        assert len(found) >= 4
        corners = np.asarray([[20, 20], [39, 20], [20, 39], [39, 39]])
        for c in corners:
            d = np.min(np.linalg.norm(found - c, axis=-1))
            assert d <= 2.0, f"corner {c} not found (nearest {d})"

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        _, _, mask = detect_fast(img, FASTParams(num_features=16))
        assert not bool(jnp.any(mask))

    def test_nonmax_reduces_count(self, img_pair):
        img, _ = img_pair
        s, _ = fast_score(img, FASTParams())
        dense = int(jnp.sum(s > 0))
        nms = int(jnp.sum(nonmax_suppress(s) > 0))
        assert 0 < nms < dense

    def test_jit_and_shapes(self, img_pair):
        img, _ = img_pair
        f = jax.jit(lambda im: detect_fast(im, FASTParams(num_features=64)))
        xy, resp, mask = f(img)
        assert xy.shape == (64, 2) and mask.shape == (64,)


class TestDescriptorsAndMatching:
    def _detect_describe(self, img, n=64, brisk=True):
        xy, resp, mask = detect_fast(img, FASTParams(num_features=n))
        if brisk:
            desc, _ = brisk_describe(img, xy, mask)
        else:
            from libwave_tpu.vision.detector import orb_orientation

            ang = orb_orientation(img, xy)
            desc, _ = orb_describe(img, xy, ang, mask)
        return xy, desc, mask

    @pytest.mark.parametrize("brisk", [True, False])
    def test_translation_matching(self, img_pair, brisk):
        """Features in a translated image match back with the known shift."""
        img1, img2 = img_pair
        xy1, d1, m1 = self._detect_describe(img1, brisk=brisk)
        xy2, d2, m2 = self._detect_describe(img2, brisk=brisk)
        idx2, valid, diag = match_descriptors(
            d1, d2, xy1, xy2, m1, m2, jax.random.key(0),
            MatcherParams(auto_remove_outliers=False),
        )
        v = np.asarray(valid)
        assert v.sum() >= 10, f"too few matches: {v.sum()}"
        # blobs shifted by (dy=3, dx=5) -> xy shift (dx=-5? no: features move
        # by (+5, +3) in (x, y))
        delta = np.asarray(xy2)[np.asarray(idx2)[v]] - np.asarray(xy1)[v]
        med = np.median(delta, axis=0)
        np.testing.assert_allclose(med, [5.0, 3.0], atol=1.0)

    def test_hamming_distance_identity(self, rng):
        d = jnp.asarray(rng.integers(0, 2**32, (10, 8), dtype=np.uint64).astype(np.uint32))
        m = jnp.ones(10, bool)
        dist = hamming_distance_matrix(d, d, m, m)
        assert np.all(np.diag(np.asarray(dist)) == 0)
        assert np.all(np.asarray(dist) >= 0)

    def test_ransac_rejects_planted_outliers(self, img_pair):
        """Corrupt a third of the correspondences; RANSAC must drop them."""
        # Proper two-view geometry with parallax (a pure 2D shift is
        # homography-degenerate: F is then a 3-parameter family and can
        # absorb arbitrary outliers — cv::findFundamentalMat has the same
        # property). Random 3D points seen by two cameras with translation
        # + rotation.
        from libwave_tpu.geometry import so3
        from libwave_tpu.vision.camera import pinhole_project

        rng = np.random.default_rng(3)
        n = 60
        X = np.stack(
            [
                rng.uniform(-5, 5, n),
                rng.uniform(-4, 4, n),
                rng.uniform(6, 20, n),
            ],
            axis=-1,
        )
        K = jnp.asarray([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
        q1 = so3.quat_identity((), jnp.float64)
        p1_cam = jnp.zeros(3)
        q2 = so3.exp_quat(jnp.asarray([0.02, -0.05, 0.01]))
        p2_cam = jnp.asarray([1.0, 0.2, 0.1])
        uv1, _ = pinhole_project(K, q1, p1_cam, jnp.asarray(X))
        uv2, _ = pinhole_project(K, q2, p2_cam, jnp.asarray(X))
        uv1 = np.array(uv1)
        uv2 = np.array(uv2)
        outliers = rng.choice(n, 15, replace=False)
        uv2[outliers] += rng.uniform(15, 60, (15, 2)) * rng.choice(
            [-1, 1], (15, 2)
        )
        valid = jnp.ones(n, dtype=bool)
        F, inl = find_fundamental_ransac(
            jnp.asarray(uv1), jnp.asarray(uv2), valid, jax.random.key(1),
            reproj_px=1.5,
        )
        inl = np.asarray(inl)
        # every clean correspondence kept, outliers overwhelmingly rejected
        clean = np.setdiff1d(np.arange(n), outliers)
        assert inl[clean].sum() >= len(clean) - 2
        kept_outliers = inl[outliers].sum()
        assert kept_outliers <= 2, f"{kept_outliers} outliers survived"


class TestTracker:
    def test_id_persistence_and_tracks(self, img_pair):
        """Track across 4 frames of a drifting texture; IDs persist and
        tracks accumulate (tracker_tests.cpp behavior)."""
        rng = np.random.default_rng(0)
        state_bits = rng.bit_generator.state
        frames = []
        for i in range(4):
            rng.bit_generator.state = state_bits
            frames.append(blob_image(rng, seed_shift=(i * 2.0, i * 3.0)))

        params = TrackerParams(num_features=64, buffer_capacity=2048)
        st = tracker_init(params, desc_words=16, dtype=jnp.float32)

        def dd(img):
            xy, resp, mask = detect_fast(img, FASTParams(num_features=64))
            desc, _ = brisk_describe(img, xy, mask)
            return xy, desc, mask

        for i, img in enumerate(frames):
            xy, desc, mask = dd(img)
            st = add_image_features(
                st, xy, desc, mask, float(i) * 0.1, jax.random.key(i), params
            )

        assert int(st.image_count) == 4
        n_ids = int(st.next_id)
        assert n_ids >= 10, f"expected persistent tracks, got {n_ids} ids"
        assert int(landmark_size(st.landmarks)) >= 3 * 10

        # some landmark should have a full 4-frame track
        lengths = []
        for lid in range(min(n_ids, 40)):
            _, imgs, _, mask = get_track(st.landmarks, 0, lid, max_len=8)
            lengths.append(int(mask.sum()))
        assert max(lengths) == 4, f"longest track {max(lengths)}"

    def test_sliding_window_purges(self, img_pair):
        rng = np.random.default_rng(0)
        state_bits = rng.bit_generator.state
        frames = []
        for i in range(5):
            rng.bit_generator.state = state_bits
            frames.append(blob_image(rng, seed_shift=(i * 1.0, i * 1.0)))

        params = TrackerParams(
            window_size=2, num_features=64, buffer_capacity=2048
        )
        st = tracker_init(params, desc_words=16, dtype=jnp.float32)

        def dd(img):
            xy, resp, mask = detect_fast(img, FASTParams(num_features=64))
            desc, _ = brisk_describe(img, xy, mask)
            return xy, desc, mask

        for i, img in enumerate(frames):
            xy, desc, mask = dd(img)
            st = add_image_features(
                st, xy, desc, mask, float(i) * 0.1, jax.random.key(i), params
            )
        # with window 2 after 5 images, only measurements at images >= 3 remain
        imgs = np.asarray(st.landmarks.images)[np.asarray(st.landmarks.valid)]
        assert imgs.min() >= 3, f"stale images kept: {sorted(set(imgs))[:5]}"


class TestImageSequence:
    def test_roundtrip_and_natural_order(self, tmp_path):
        from PIL import Image

        from libwave_tpu.vision import list_image_sequence, read_image_sequence

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (3, 16, 24), dtype=np.uint8)
        # write out of order with unpadded names: natural sort must fix it
        for i, name in [(2, "frame10.png"), (0, "frame2.png"), (1, "frame3.png")]:
            Image.fromarray(frames[i]).save(tmp_path / name)
        (tmp_path / "notes.txt").write_text("ignored")

        paths = list_image_sequence(str(tmp_path))
        assert [p.split("/")[-1] for p in paths] == [
            "frame2.png", "frame3.png", "frame10.png"
        ]
        stack = read_image_sequence(str(tmp_path))
        assert stack.shape == (3, 16, 24) and stack.dtype == np.uint8
        np.testing.assert_array_equal(stack, frames)

    def test_shape_mismatch_raises(self, tmp_path):
        from PIL import Image

        from libwave_tpu.vision import read_image_sequence

        Image.fromarray(np.zeros((8, 8), np.uint8)).save(tmp_path / "a.png")
        Image.fromarray(np.zeros((9, 8), np.uint8)).save(tmp_path / "b.png")
        with pytest.raises(ValueError):
            read_image_sequence(str(tmp_path))


class TestORBPyramid:
    """Multi-level ORB (orb_detector.hpp:29-112 parity): scale-change
    matching that single-level detection fails — VERDICT r1 item 5."""

    def _scale_pair(self, factor=1.5):
        rng = np.random.default_rng(7)
        img1 = blob_image(rng, H=140, W=180, n_blobs=50)
        H, W = img1.shape
        img2 = jax.image.resize(
            img1, (int(H * factor), int(W * factor)), method="bilinear"
        )
        return img1, img2

    def _consistent_matches(self, img1, img2, det_params, factor):
        from libwave_tpu.vision import (
            detect_orb_pyramid,
            orb_describe_pyramid,
        )

        out1 = detect_orb_pyramid(img1, det_params)
        out2 = detect_orb_pyramid(img2, det_params)
        xy1, _, a1, l1, m1 = out1
        xy2, _, a2, l2, m2 = out2
        d1, _ = orb_describe_pyramid(
            img1, xy1, a1, l1, m1,
            det_params.scale_factor, det_params.num_levels,
        )
        d2, _ = orb_describe_pyramid(
            img2, xy2, a2, l2, m2,
            det_params.scale_factor, det_params.num_levels,
        )
        idx2, valid, _ = match_descriptors(
            d1, d2, xy1, xy2, m1, m2, jax.random.key(0),
            MatcherParams(auto_remove_outliers=False),
        )
        v = np.asarray(valid)
        p1 = np.asarray(xy1)[v]
        p2 = np.asarray(xy2)[np.asarray(idx2)[v]]
        err = np.linalg.norm(p2 - factor * p1, axis=-1)
        return int((err < 3.0).sum())

    def test_budgets_sum_to_capacity(self):
        from libwave_tpu.vision.detector import _level_budgets

        budgets = _level_budgets(2000, 1.2, 8)
        assert len(budgets) == 8
        assert sum(budgets) == 2000
        assert budgets[0] > budgets[-1] > 0

    @pytest.mark.slow
    def test_scale_matching_needs_pyramid(self):
        """Keypoints across a 1.5x scaled pair: the pyramid matches them,
        single-level does not."""
        factor = 1.5
        img1, img2 = self._scale_pair(factor)
        pyr = ORBDetectorParams(
            num_features=200, scale_factor=1.5, num_levels=4,
            fast_threshold=5.0,
        )
        single = dataclasses.replace(pyr, num_levels=1)
        n_pyr = self._consistent_matches(img1, img2, pyr, factor)
        n_single = self._consistent_matches(img1, img2, single, factor)
        assert n_pyr >= 10, f"pyramid found only {n_pyr} scale matches"
        assert n_pyr >= 2 * max(n_single, 1), (n_pyr, n_single)

    def test_detect_orb_honors_num_levels(self):
        """detect_orb with num_levels>1 runs the pyramid: coarse-level
        keypoints appear (level > 0 in the 5-output variant)."""
        from libwave_tpu.vision import detect_orb_pyramid

        img1, _ = self._scale_pair()
        params = ORBDetectorParams(
            num_features=128, scale_factor=1.5, num_levels=3,
            fast_threshold=5.0,
        )
        xy, resp, ang, lvl, mask = detect_orb_pyramid(img1, params)
        lv = np.asarray(lvl)[np.asarray(mask)]
        assert (lv > 0).any(), "no keypoints from coarse levels"
        # 4-output compatibility wrapper dispatches to the pyramid
        from libwave_tpu.vision import detect_orb

        xy4, r4, a4, m4 = detect_orb(img1, params)
        assert xy4.shape == (128, 2)
        np.testing.assert_array_equal(np.asarray(m4), np.asarray(mask))

    def test_cross_level_nms_drops_duplicates(self):
        img1, _ = self._scale_pair()
        base = ORBDetectorParams(
            num_features=128, scale_factor=1.5, num_levels=3,
            fast_threshold=5.0,
        )
        on = dataclasses.replace(base, cross_level_nms=True)
        _, _, _, _, m_off = __import__(
            "libwave_tpu.vision", fromlist=["detect_orb_pyramid"]
        ).detect_orb_pyramid(img1, base)
        _, _, _, _, m_on = __import__(
            "libwave_tpu.vision", fromlist=["detect_orb_pyramid"]
        ).detect_orb_pyramid(img1, on)
        assert int(m_on.sum()) <= int(m_off.sum())
