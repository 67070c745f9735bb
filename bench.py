"""Benchmark: BA LM iterations/s at 10k landmarks (BASELINE.md north star).

Runs the flagship solve — full LM iterations (linearize, Schur elimination,
PCG with SCHUR_JACOBI preconditioning, retraction) — on a synthetic problem
with 10,000 landmarks on the default jax backend (the real TPU chip under the
driver), and compares against the same computation on host CPU (the
reference is a CPU library; this is the closest available
apples-to-apples denominator since libwave publishes no numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def make_problem(num_poses=200, num_landmarks=10_000, obs_per_pose=300, seed=0):
    """Synthetic BA problem with ~num_poses*obs_per_pose observations."""
    import jax
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
    ).astype(np.float32)
    theta = np.linspace(0, 2 * np.pi, num_poses, endpoint=False)
    p = np.stack(
        [10 * np.cos(theta), 10 * np.sin(theta), np.zeros_like(theta)], axis=-1
    ).astype(np.float32)
    # camera yaw follows the tangent; q = exp([0,0,yaw]) * q_BC
    from libwave_tpu.geometry import so3
    from libwave_tpu.sim.vo_dataset import q_BC

    yaw = theta + np.pi / 2
    omega = np.zeros((num_poses, 3), dtype=np.float32)
    omega[:, 2] = yaw
    q = so3.quat_multiply(
        so3.exp_quat(jnp.asarray(omega)), q_BC(jnp.float32)
    )

    Kmat = jnp.asarray(
        [[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], dtype=jnp.float32
    )
    from libwave_tpu.vision.camera import pinhole_project

    # Observations must be *genuinely visible* (inside the image, sane
    # depth): sampling landmark ids blindly produces points microns in
    # front of the camera that project to megapixel coordinates, the
    # initial cost explodes, and LM never accepts a step — the benchmark
    # would then be timing a solver that goes nowhere. Project everything
    # once and sample per-pose from the in-image set.
    uv_all, in_front = jax.vmap(
        lambda qn, pn: pinhole_project(Kmat, qn, pn, jnp.asarray(lm))
    )(q, jnp.asarray(p))  # (N, M, 2), (N, M)
    uv_all = np.asarray(uv_all)
    depth_ok = (
        np.linalg.norm(lm[None, :, :] - np.asarray(p)[:, None, :], axis=-1)
        > 1.0
    )
    in_img = (
        np.asarray(in_front)
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
                [uv_all[n, take], np.zeros((pad, 2), dtype=np.float32)]
            )
        )
        w_l.append(
            np.concatenate(
                [np.ones(take.size, np.float32), np.zeros(pad, np.float32)]
            )
        )
    pose_idx = np.concatenate(pose_idx_l)
    lm_idx = np.concatenate(lm_idx_l)
    uv = jnp.asarray(np.concatenate(uv_l, axis=0).astype(np.float32))
    weight = jnp.asarray(np.concatenate(w_l))

    from libwave_tpu.optim import schur as schur_mod

    free = np.ones(num_poses, dtype=np.float32)
    free[:2] = 0
    pose_ell, lm_ell, pad_mask, ell, uv_p, w_p = schur_mod.pack_observations(
        pose_idx, lm_idx, num_poses, num_landmarks, uv, weight
    )
    problem = BAProblem(
        K=Kmat,
        pose_idx=pose_ell,
        lm_idx=lm_ell,
        uv=uv_p,
        weight=w_p,
        free_pose=jnp.asarray(free),
        ell=ell,
    )
    state = BAState(
        q=q.astype(jnp.float32),
        p=jnp.asarray(p),
        lm=jnp.asarray(lm) + 0.1,
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
    for _ in range(max(repeats, 3)):
        dt, cost = run_once()
        times.append(dt)
    times.sort()
    median = times[len(times) // 2]
    return iters / median, cost


def main():
    import jax

    problem, state = make_problem()
    device_rate, cost = bench_backend(problem, state)
    backend = jax.default_backend()

    # CPU denominator (reference-class hardware), same computation
    cpu_rate = None
    try:
        cpu = jax.devices("cpu")
        cpu_problem = jax.device_put(problem, cpu[0])
        cpu_state = jax.device_put(state, cpu[0])
        with jax.default_device(cpu[0]):
            cpu_rate, _ = bench_backend(cpu_problem, cpu_state, repeats=2)
    except Exception:
        pass

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
