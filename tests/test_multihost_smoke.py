"""Two-process multihost execution smoke (§5.8 comm backend).

Launches two real ``jax.distributed``-initialized CPU processes (localhost
coordinator, gloo collectives, 4 virtual devices each) from a test, runs
``solve_ba_multihost`` over the resulting (2 x 4) host mesh, and asserts
the result matches the single-process solve — turning the multi-process
code path from "written" into "executed with process_count > 1".
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_multihost_matches_single(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "mh.npz")
    port = _free_port()

    env = dict(
        os.environ,
        PYTHONPATH=repo,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), out],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outputs.append(stdout)
    for p, stdout in zip(procs, outputs):
        if p.returncode != 0:
            low = stdout.lower()
            if "unavailable" in low or "not supported" in low:
                pytest.skip(
                    f"backend refused multi-process init:\n{stdout[-800:]}"
                )
            pytest.fail(f"worker rc={p.returncode}:\n{stdout[-2000:]}")
    assert os.path.exists(out), outputs[0][-1000:]
    mh = np.load(out)

    # single-process reference on the identical problem
    from multihost_worker import build_problem

    import jax

    from libwave_tpu.optim import BAConfig, solve_ba

    problem, init = build_problem()
    state, info = jax.jit(
        lambda pr, st: solve_ba(pr, st, BAConfig(max_iterations=5,
                                                 cg_max_iters=30))
    )(problem, init)

    ref_cost = float(info["final_cost"])
    np.testing.assert_allclose(
        float(mh["final_cost"]), ref_cost, rtol=1e-5,
        err_msg="2-process multihost cost diverged from single-process",
    )
    N = state.q.shape[0]
    np.testing.assert_allclose(np.asarray(mh["p"])[:N], np.asarray(state.p),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(mh["lm"]), np.asarray(state.lm),
                               atol=1e-5)
