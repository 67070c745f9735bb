"""Worker process for the 2-process CPU multihost smoke test.

Launched (twice) by tests/test_multihost_smoke.py:

    python multihost_worker.py <process_id> <coordinator_port> <out.npz>

Each process joins a 2-process ``jax.distributed`` group over localhost
(gloo CPU collectives), builds the same deterministic BA problem, and runs
``solve_ba_multihost`` over the (2 hosts x 4 local devices) mesh. Process 0
writes the solved state + cost for the parent to compare against the
single-process solve.
"""

import sys


def build_problem():
    import jax
    import jax.numpy as jnp

    from libwave_tpu.geometry import so3
    from libwave_tpu.optim import BAState, ba_from_dataset
    from libwave_tpu.sim import VoSimParams, generate_vo_dataset

    ds = generate_vo_dataset(
        VoSimParams(
            nb_landmarks=48, steps=80, fx=200.0, fy=200.0, hz=10.0
        ),
        jax.random.key(0),
    )
    problem, gt = ba_from_dataset(ds)
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    N, M = gt.q.shape[0], gt.lm.shape[0]
    free = problem.free_pose[:, None]
    init = BAState(
        q=so3.quat_boxplus(
            gt.q, 0.02 * jax.random.normal(k1, (N, 3), gt.p.dtype) * free
        ),
        p=gt.p + 0.05 * jax.random.normal(k2, (N, 3), gt.p.dtype) * free,
        lm=gt.lm + 0.3 * jax.random.normal(k3, (M, 3), gt.p.dtype),
    )
    return problem, init


def main():
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_enable_x64", True)  # match the test harness

    from libwave_tpu.optim import BAConfig
    from libwave_tpu.parallel import (
        MultiHostConfig,
        host_block_range,
        initialize_multihost,
        make_host_mesh,
        solve_ba_multihost,
    )

    ok = initialize_multihost(
        MultiHostConfig(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2,
            process_id=pid,
        )
    )
    assert ok, "initialize_multihost must report a live process group"
    assert jax.process_count() == 2, jax.process_count()

    problem, init = build_problem()
    mesh = make_host_mesh()
    assert mesh.devices.shape[0] == 2, mesh.devices.shape

    lo, hi = host_block_range(100)
    assert (lo, hi) == ((0, 50) if pid == 0 else (50, 100)), (lo, hi)

    state, info = solve_ba_multihost(
        problem, init, BAConfig(max_iterations=5, cg_max_iters=30),
        mesh=mesh,
    )
    jax.block_until_ready(state)

    if pid == 0:
        import numpy as np

        np.savez(
            out_path,
            final_cost=float(info["final_cost"]),
            initial_cost=float(info["initial_cost"]),
            q=np.asarray(jax.device_get(state.q)),
            p=np.asarray(jax.device_get(state.p)),
            lm=np.asarray(jax.device_get(state.lm)),
        )
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
