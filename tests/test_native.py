"""Native host-layer tests: the C++ oracles must agree with numpy, and the
device-side kernels must agree with the C++ oracles (SURVEY.md §7's
"verify vs a host C++ exact oracle" strategy)."""

import numpy as np
import pytest

from libwave_tpu import native


@pytest.fixture(scope="module")
def built():
    ok = native.available()
    if not ok:
        pytest.skip("native toolchain unavailable")
    return ok


class TestBuild:
    def test_builds_and_loads(self, built):
        assert native.load() is not None


class TestKNNOracle:
    def test_matches_numpy(self, built, rng):
        q = rng.normal(size=(50, 3)).astype(np.float32)
        t = rng.normal(size=(200, 3)).astype(np.float32)
        idx, d2 = native.knn_exact(q, t, k=4)
        D = ((q[:, None] - t[None]) ** 2).sum(-1)
        expect_idx = np.argsort(D, axis=1)[:, :4]
        expect_d2 = np.take_along_axis(D, expect_idx, axis=1)
        np.testing.assert_allclose(d2, expect_d2, rtol=1e-5)
        # indices may differ on exact ties; distances decide
        np.testing.assert_allclose(
            np.take_along_axis(D, idx.astype(np.int64), axis=1), expect_d2,
            rtol=1e-5,
        )

    def test_device_knn_matches_native_oracle(self, built, rng):
        import jax.numpy as jnp

        from libwave_tpu.matching import knn

        q = rng.normal(size=(64, 3)).astype(np.float32)
        t = rng.normal(size=(300, 3)).astype(np.float32)
        idx_dev, d2_dev = knn(
            jnp.asarray(q), jnp.ones(64, bool),
            jnp.asarray(t), jnp.ones(300, bool), k=3, chunk=128,
        )
        idx_nat, d2_nat = native.knn_exact(q, t, k=3)
        np.testing.assert_allclose(
            np.sort(np.asarray(d2_dev), axis=1), np.sort(d2_nat, axis=1),
            rtol=1e-4, atol=1e-5,
        )


class TestVoxelOracle:
    def test_matches_numpy(self, built, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32) * 5
        out_nat = native.voxel_downsample_exact(pts, 0.5)
        keys = np.floor(pts / 0.5).astype(np.int64)
        uniq = np.unique(keys, axis=0)
        assert len(out_nat) == len(uniq)
        # every output voxel mean reproduces the numpy mean of its cell
        for c in out_nat[:20]:
            cell = np.floor(c / 0.5).astype(np.int64)
            members = pts[(keys == cell).all(axis=1)]
            np.testing.assert_allclose(c, members.mean(0), atol=1e-4)


class TestPCD:
    def _write_ascii(self, path, pts):
        with open(path, "w") as f:
            f.write("# .PCD v0.7 - Point Cloud Data file format\n")
            f.write("VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n")
            f.write(f"COUNT 1 1 1\nWIDTH {len(pts)}\nHEIGHT 1\n")
            f.write(f"VIEWPOINT 0 0 0 1 0 0 0\nPOINTS {len(pts)}\nDATA ascii\n")
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")

    def _write_binary(self, path, pts):
        with open(path, "wb") as f:
            hdr = (
                "# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\n"
                f"TYPE F F F\nCOUNT 1 1 1\nWIDTH {len(pts)}\nHEIGHT 1\n"
                f"VIEWPOINT 0 0 0 1 0 0 0\nPOINTS {len(pts)}\nDATA binary\n"
            )
            f.write(hdr.encode())
            f.write(pts.astype("<f4").tobytes())

    def test_ascii_roundtrip(self, built, tmp_path, rng):
        pts = rng.normal(size=(37, 3)).astype(np.float32)
        p = tmp_path / "a.pcd"
        self._write_ascii(str(p), pts)
        out = native.load_pcd(str(p))
        np.testing.assert_allclose(out, pts, rtol=1e-5)

    def test_binary_roundtrip(self, built, tmp_path, rng):
        pts = rng.normal(size=(41, 3)).astype(np.float32)
        p = tmp_path / "b.pcd"
        self._write_binary(str(p), pts)
        out = native.load_pcd(str(p))
        np.testing.assert_allclose(out, pts)

    def test_missing_file(self, built):
        with pytest.raises(FileNotFoundError):
            native.load_pcd("/nonexistent/scan.pcd")


class TestCSV:
    def test_euroc_style(self, built, tmp_path):
        """EuRoC sensor CSVs: '#' header + timestamped rows."""
        p = tmp_path / "imu.csv"
        p.write_text(
            "#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n"
            "1403636579758555392,-0.1,0.2,0.3,9.8,-0.1,0.05\n"
            "1403636579763555584,-0.11,0.21,0.31,9.81,-0.11,0.06\n"
        )
        out = native.load_csv(str(p))
        assert out.shape == (2, 7)
        np.testing.assert_allclose(out[0, 1:4], [-0.1, 0.2, 0.3])
        assert out[1, 0] == 1403636579763555584.0

    def test_matches_numpy(self, built, tmp_path, rng):
        m = rng.normal(size=(20, 5))
        p = tmp_path / "m.csv"
        np.savetxt(str(p), m, delimiter=",")
        out = native.load_csv(str(p))
        np.testing.assert_allclose(out, m, rtol=1e-12)
