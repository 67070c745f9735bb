"""Tests for the auxiliary subsystems: math helpers, tracing counters,
checkpointing, viz (headless)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libwave_tpu.utils import checkpoint, math as wmath, trace
from libwave_tpu import viz


class TestMathHelpers:
    def test_fltcmp(self):
        assert int(wmath.fltcmp(1.0, 1.00001)) == 0
        assert int(wmath.fltcmp(2.0, 1.0)) == 1
        assert int(wmath.fltcmp(1.0, 2.0)) == -1

    def test_median(self):
        np.testing.assert_allclose(wmath.median(jnp.asarray([3.0, 1.0, 2.0])), 2.0)
        np.testing.assert_allclose(
            wmath.median(jnp.asarray([4.0, 1.0, 3.0, 2.0])), 2.5
        )

    def test_vec2mat_column_major(self):
        m = wmath.vec2mat(jnp.arange(6.0), 2, 3)
        np.testing.assert_allclose(m, [[0, 2, 4], [1, 3, 5]])
        np.testing.assert_allclose(wmath.mat2vec(m), jnp.arange(6.0))

    def test_rand(self):
        v = wmath.randf(jax.random.key(0), -2.0, 3.0, (100,))
        assert float(v.min()) >= -2.0 and float(v.max()) < 3.0


class TestCounters:
    def test_accumulate_in_jit(self):
        def step(c, x):
            return c.add(total=jnp.sum(x), frames=1)

        c = trace.Counters.zeros("total", "frames")
        c = jax.jit(step)(c, jnp.arange(5))
        assert c.as_floats() == {"total": 10.0, "frames": 1.0}

    def test_pytree_roundtrip(self):
        c = trace.Counters.zeros("a", "b").add(a=3)
        leaves, treedef = jax.tree.flatten(c)
        c2 = jax.tree.unflatten(treedef, leaves)
        assert c2.as_floats()["a"] == 3.0


class TestCheckpoint:
    def test_roundtrip_namedtuple_state(self, tmp_path, rng):
        from libwave_tpu.optim import BAState

        st = BAState(
            q=jnp.asarray(rng.normal(size=(4, 4))),
            p=jnp.asarray(rng.normal(size=(4, 3))),
            lm=jnp.asarray(rng.normal(size=(10, 3))),
        )
        path = str(tmp_path / "ckpt_0001.npz")
        checkpoint.save_checkpoint(path, st)
        restored = checkpoint.load_checkpoint(path, st)
        assert isinstance(restored, BAState)
        np.testing.assert_allclose(restored.q, st.q)
        np.testing.assert_allclose(restored.lm, st.lm)

    def test_latest(self, tmp_path):
        for i in (1, 3, 2):
            checkpoint.save_checkpoint(
                str(tmp_path / f"ckpt_{i:04d}.npz"), {"x": jnp.zeros(2)}
            )
        latest = checkpoint.latest_checkpoint(str(tmp_path))
        assert latest.endswith("ckpt_0003.npz")

    def test_latest_empty(self, tmp_path):
        assert checkpoint.latest_checkpoint(str(tmp_path / "nope")) is None


class TestViz:
    def test_pointcloud_display_writes_frames(self, tmp_path, rng):
        disp = viz.PointCloudDisplay(str(tmp_path))
        disp.add_pointcloud(rng.normal(size=(100, 3)), cloud_id=0)
        disp.add_line([0, 0, 0], [1, 1, 1])
        disp.render()
        disp.stop()
        files = os.listdir(str(tmp_path))
        assert any(f.endswith(".png") for f in files)

    def test_draw_tracks(self, tmp_path, rng):
        img = rng.normal(size=(60, 80))
        xy = [rng.uniform(0, 60, (5, 2)) for _ in range(3)]
        mask = [np.ones(5, bool)] * 3
        out = str(tmp_path / "tracks.png")
        viz.draw_tracks(img, xy, mask, out)
        assert os.path.exists(out)


class TestPeriodicSolverCheckpoints:
    """solve_with_checkpoints: chunked BA solve with snapshots after every
    chunk; killing and resuming continues from the latest snapshot and
    reaches the same optimum (SURVEY 5.3-5.4)."""

    def _setup(self):
        from libwave_tpu.optim import (
            BAConfig, BAState, ba_from_dataset, solve_ba,
        )
        from libwave_tpu.sim import VoSimParams, generate_vo_dataset
        from libwave_tpu.geometry import so3

        ds = generate_vo_dataset(
            VoSimParams(nb_landmarks=40, steps=100, fx=200.0, fy=200.0,
                        hz=10.0),
            jax.random.key(31),
        )
        problem, gt = ba_from_dataset(ds)
        ks = jax.random.split(jax.random.key(32), 3)
        N, M = gt.q.shape[0], gt.lm.shape[0]
        free = jnp.asarray(np.asarray(problem.free_pose))[:, None]
        init = BAState(
            q=so3.quat_boxplus(
                gt.q, 0.02 * jax.random.normal(ks[0], (N, 3), gt.p.dtype)
                * free
            ),
            p=gt.p + 0.05 * jax.random.normal(ks[1], (N, 3), gt.p.dtype)
            * free,
            lm=gt.lm + 0.2 * jax.random.normal(ks[2], (M, 3), gt.p.dtype),
        )

        def solve_chunk(state, carry, n):
            lam = carry[0] if carry is not None else jnp.asarray(
                1e-4, state.p.dtype
            )
            cfg = BAConfig(
                max_iterations=n, cg_max_iters=40,
                init_lambda=float(lam),
            )
            state, info = jax.jit(
                lambda pr, st: solve_ba(pr, st, cfg)
            )(problem, state)
            return state, (info["final_lambda"],)

        return problem, init, solve_chunk

    def test_chunked_solve_and_resume(self, tmp_path):
        problem, init, solve_chunk = self._setup()
        d = str(tmp_path / "ckpts")

        # run the first 6 of 12 iterations, then "crash"
        s_mid, carry_mid, start = checkpoint.solve_with_checkpoints(
            solve_chunk, init, total_iterations=6, directory=d, every=3
        )
        assert start == 0
        assert len(os.listdir(d)) == 2  # snapshots at 3 and 6

        # resume: picks up at iteration 6 and finishes
        s_end, carry_end, start2 = checkpoint.solve_with_checkpoints(
            solve_chunk, init, total_iterations=12, directory=d, every=3
        )
        assert start2 == 6
        assert len(os.listdir(d)) == 4

        # uninterrupted reference run
        import shutil
        shutil.rmtree(d)
        s_ref, _, _ = checkpoint.solve_with_checkpoints(
            solve_chunk, init, total_iterations=12, directory=d, every=3,
            resume=False,
        )
        np.testing.assert_allclose(
            np.asarray(s_end.p), np.asarray(s_ref.p), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(s_end.lm), np.asarray(s_ref.lm), atol=1e-10
        )
