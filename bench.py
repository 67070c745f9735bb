"""Benchmark: BA LM iterations/s at 10k landmarks (BASELINE.md north star).

Runs the flagship solve — full LM iterations (linearize, Schur elimination,
PCG with SCHUR_JACOBI preconditioning, retraction) — on a synthetic problem
with 10,000 landmarks on the default jax backend (the real TPU chip under the
driver), and compares against the same computation on host CPU (the
reference is a CPU library; this is the closest available
apples-to-apples denominator since libwave publishes no numbers).

Problem construction is pure numpy on the host: through a remote TPU tunnel
every extra compile costs minutes and large device->host fetches can fail, so
the device sees exactly one program — the timed solve.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


# --- host-side (numpy) quaternion/pinhole helpers -------------------------
# Mirror libwave_tpu.geometry.so3 (w-first Hamilton) without touching jax.

def _quat_multiply_np(a, b):
    w1, x1, y1, z1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    w2, x2, y2, z2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def _quat_to_rot_np(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    R = np.empty(q.shape[:-1] + (3, 3), dtype=q.dtype)
    R[..., 0, 0] = 1 - 2 * (yy + zz)
    R[..., 0, 1] = 2 * (xy - wz)
    R[..., 0, 2] = 2 * (xz + wy)
    R[..., 1, 0] = 2 * (xy + wz)
    R[..., 1, 1] = 1 - 2 * (xx + zz)
    R[..., 1, 2] = 2 * (yz - wx)
    R[..., 2, 0] = 2 * (xz - wy)
    R[..., 2, 1] = 2 * (yz + wx)
    R[..., 2, 2] = 1 - 2 * (xx + yy)
    return R


def _q_bc_np(dtype=np.float64):
    """Body->camera mount (vo_dataset.q_BC): Rz(-90deg) * Rx(-90deg)."""
    c = np.cos(np.pi / 4).astype(dtype)
    s = np.sin(np.pi / 4).astype(dtype)
    qz = np.array([c, 0, 0, -s], dtype=dtype)
    qx = np.array([c, -s, 0, 0], dtype=dtype)
    return _quat_multiply_np(qz, qx)


def make_problem(num_poses=200, num_landmarks=10_000, obs_per_pose=300,
                 seed=0):
    """Synthetic BA problem with ~num_poses*obs_per_pose observations,
    built entirely on the host."""
    import jax.numpy as jnp

    from libwave_tpu.optim import BAProblem, BAState

    rng = np.random.default_rng(seed)
    # landmarks in a ring around a circular trajectory
    lm = np.stack(
        [
            rng.uniform(-50, 50, num_landmarks),
            rng.uniform(-50, 50, num_landmarks),
            rng.uniform(-2, 2, num_landmarks),
        ],
        axis=-1,
    ).astype(np.float64)
    theta = np.linspace(0, 2 * np.pi, num_poses, endpoint=False)
    p = np.stack(
        [10 * np.cos(theta), 10 * np.sin(theta), np.zeros_like(theta)],
        axis=-1,
    )
    # camera yaw follows the tangent; q = exp([0,0,yaw]) * q_BC
    yaw = theta + np.pi / 2
    q_yaw = np.stack(
        [
            np.cos(yaw / 2),
            np.zeros_like(yaw),
            np.zeros_like(yaw),
            np.sin(yaw / 2),
        ],
        axis=-1,
    )
    q = _quat_multiply_np(q_yaw, _q_bc_np())

    Kmat = np.array(
        [[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], dtype=np.float64
    )

    # Observations must be *genuinely visible* (inside the image, sane
    # depth): sampling landmark ids blindly produces points microns in
    # front of the camera that project to megapixel coordinates, the
    # initial cost explodes, and LM never accepts a step — the benchmark
    # would then be timing a solver that goes nowhere. Project everything
    # once (host numpy) and sample per-pose from the in-image set.
    R = _quat_to_rot_np(q)  # (N, 3, 3) camera-to-world
    d = lm[None, :, :] - p[:, None, :]  # (N, M, 3)
    pc = np.einsum("nji,nmj->nmi", R, d)  # R^T (X - p)
    h = np.einsum("ij,nmj->nmi", Kmat, pc)
    z = h[..., 2]
    in_front = z > 0
    uv_all = h[..., :2] / np.where(np.abs(z) < 1e-12, 1e-12, z)[..., None]
    depth_ok = np.linalg.norm(d, axis=-1) > 1.0
    in_img = (
        in_front
        & depth_ok
        & (uv_all[..., 0] >= 0) & (uv_all[..., 0] < 640)
        & (uv_all[..., 1] >= 0) & (uv_all[..., 1] < 480)
    )

    pose_idx_l, lm_idx_l, uv_l, w_l = [], [], [], []
    for n in range(num_poses):
        ids = np.nonzero(in_img[n])[0]
        rng.shuffle(ids)
        take = ids[:obs_per_pose]
        pad = obs_per_pose - take.size
        pose_idx_l.append(np.full(obs_per_pose, n, dtype=np.int32))
        lm_idx_l.append(
            np.concatenate([take, np.zeros(pad, dtype=np.int64)]).astype(
                np.int32
            )
        )
        uv_l.append(
            np.concatenate(
                [uv_all[n, take], np.zeros((pad, 2))]
            ).astype(np.float32)
        )
        w_l.append(
            np.concatenate(
                [np.ones(take.size, np.float32), np.zeros(pad, np.float32)]
            )
        )
    pose_idx = np.concatenate(pose_idx_l)
    lm_idx = np.concatenate(lm_idx_l)
    uv = np.concatenate(uv_l, axis=0)
    weight = np.concatenate(w_l)

    from libwave_tpu.optim import schur as schur_mod

    free = np.ones(num_poses, dtype=np.float32)
    free[:2] = 0
    pose_ell, lm_ell, pad_mask, ell, uv_p, w_p = schur_mod.pack_observations(
        pose_idx, lm_idx, num_poses, num_landmarks, uv, weight
    )
    problem = BAProblem(
        K=jnp.asarray(Kmat, jnp.float32),
        pose_idx=pose_ell,
        lm_idx=lm_ell,
        uv=uv_p,
        weight=w_p,
        free_pose=jnp.asarray(free),
        ell=ell,
    )
    state = BAState(
        q=jnp.asarray(q, jnp.float32),
        p=jnp.asarray(p, jnp.float32),
        lm=jnp.asarray(lm + 0.1, jnp.float32),
    )
    return problem, state


def bench_backend(problem, state, iters=10, repeats=3):
    """Time full LM iterations. The whole iteration loop runs as ONE jitted
    lax.scan (solve_ba) so device dispatch overhead is excluded — this is the
    production calling convention."""
    import jax

    from libwave_tpu.optim import BAConfig, solve_ba

    cfg = BAConfig(
        max_iterations=iters,
        cg_max_iters=20,
        cg_tol=1e-5,
        # benchmark all iterations: disable the convergence freeze
        relative_decrease_tol=0.0,
        absolute_decrease_tol=0.0,
    )
    solve = jax.jit(lambda pr, st: solve_ba(pr, st, cfg))

    def run_once():
        t0 = time.perf_counter()
        out, info = solve(problem, state)
        # fetch a scalar: block_until_ready alone does not reliably wait on
        # remote runtimes — materializing a value forces the round trip
        cost = float(info["final_cost"])
        return time.perf_counter() - t0, cost

    run_once()  # compile + warm
    times = []
    cost = 0.0
    for _ in range(repeats):
        dt, cost = run_once()
        times.append(dt)
    times.sort()
    # true median (averaging the middle pair for even counts) so small
    # repeat counts don't bias toward the slower run
    m = len(times) // 2
    median = times[m] if len(times) % 2 else 0.5 * (times[m - 1] + times[m])
    return iters / median, cost


def main():
    import jax

    t0 = time.time()
    problem, state = make_problem()
    _log(f"make_problem (host) done in {time.time() - t0:.1f}s")

    t0 = time.time()
    device_rate, cost = bench_backend(problem, state)
    backend = jax.default_backend()
    _log(
        f"{backend} solve: {device_rate:.2f} iter/s, cost {cost:.4g}, "
        f"wall {time.time() - t0:.1f}s"
    )

    # CPU denominator (reference-class hardware), same computation. Fewer
    # LM iterations (rate is per-iteration; the scan compile cost does not
    # depend on the trip count) and fewer repeats keep total wall-time sane.
    cpu_rate = None
    try:
        cpu = jax.devices("cpu")
        cpu_problem = jax.device_put(problem, cpu[0])
        cpu_state = jax.device_put(state, cpu[0])
        t0 = time.time()
        with jax.default_device(cpu[0]):
            cpu_rate, _ = bench_backend(
                cpu_problem, cpu_state, iters=3, repeats=2
            )
        _log(
            f"cpu denominator: {cpu_rate:.2f} iter/s, "
            f"wall {time.time() - t0:.1f}s"
        )
    except Exception as e:  # no cpu backend under this runtime
        _log(f"cpu denominator unavailable: {e!r}")

    vs = device_rate / cpu_rate if cpu_rate else 1.0
    print(
        json.dumps(
            {
                "metric": f"ba_lm_iterations_per_s_10k_landmarks_{backend}",
                "value": round(device_rate, 3),
                "unit": "iter/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
