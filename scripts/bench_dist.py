"""Config 5 runner: distributed BA + pose-graph solve on the virtual mesh.

Launched by bench.py in a subprocess with
``PYTHONPATH= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``
(the axon sitecustomize pins the parent to the single-chip TPU tunnel, and
XLA device-count flags only apply before backend init — hence a fresh
process).

This host has too few cores for virtual-mesh wall-clock scaling to mean
anything (8 virtual devices oversubscribe 2 cores), so this measures what
the virtual mesh *can* measure honestly:

- numerical parity: sharded ELL solve == single-device solve on the same
  problem (the distributed solver's core claim);
- the sharded program's wall overhead vs the single-device program on the
  same hardware budget (an upper bound on the orchestration overhead);
- the distributed pose-graph block solve running end to end.

Prints ONE JSON line consumed by bench.py. The chip-scaling *prediction*
(collective bytes vs ICI bandwidth) is computed analytically in bench.py —
it needs no mesh.
"""

import json
import re
import sys
import time

sys.path.insert(0, ".")


_DTYPE_BYTES = {
    "f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
    "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
}


def _shape_bytes(s: str) -> int:
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", s):
        dt, dims = m.groups()
        if dt not in _DTYPE_BYTES:
            continue
        el = 1
        for d in dims.split(","):
            if d:
                el *= int(d)
        total += el * _DTYPE_BYTES[dt]
    return total


def collective_wire_bytes(hlo: str, n: int) -> dict:
    """Sum the wire bytes of every collective instruction in an HLO dump,
    using ring-algorithm cost factors: all-reduce moves 2(n-1)/n of the
    buffer, all-gather/reduce-scatter (n-1)/n, collective-permute 1x.
    Static instruction count == dynamic when every loop trip count is 1."""
    out = {"all-reduce": 0.0, "all-gather": 0.0, "reduce-scatter": 0.0,
           "collective-permute": 0.0}
    for line in hlo.splitlines():
        mm = re.search(
            r"=\s+(.*?)\s+(all-reduce|all-gather|reduce-scatter|"
            r"collective-permute)(-start)?\(",
            line,
        )
        if not mm or "-done" in line.split("=")[1][:60]:
            continue
        b = _shape_bytes(mm.group(1))
        op = mm.group(2)
        if op == "all-reduce":
            out[op] += 2 * (n - 1) / n * b
        elif op in ("all-gather", "reduce-scatter"):
            out[op] += (n - 1) / n * b
        else:
            out[op] += b
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from bench import make_problem
    from libwave_tpu.optim import BAConfig, solve_ba
    from libwave_tpu.parallel import partition_ba_problem, solve_ba_sharded

    n_dev = len(jax.devices())
    problem, state = make_problem(
        num_poses=64, num_landmarks=2000, obs_per_pose=150
    )
    cfg = BAConfig(
        max_iterations=6, cg_max_iters=20, cg_tol=1e-5, solver="pcg",
        relative_decrease_tol=0.0, absolute_decrease_tol=0.0,
    )

    # single-device reference
    f1 = jax.jit(lambda pr, st: solve_ba(pr, st, cfg))
    out1, info1 = f1(problem, state)
    jax.block_until_ready(out1)
    t0 = time.perf_counter()
    out1, info1 = f1(problem, state)
    c1 = float(info1["final_cost"])
    t1 = time.perf_counter() - t0

    # sharded ELL solve over the full virtual mesh
    stacked, padded = partition_ba_problem(problem, state, n_dev)
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    fs = jax.jit(
        lambda st_, pd: solve_ba_sharded(st_, pd, mesh, cfg)
    )
    outs, infos = fs(stacked, padded)
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs, infos = fs(stacked, padded)
    cs = float(infos["final_cost"])
    ts = time.perf_counter() - t0

    # ICI-model validation against the compiler: static collective wire
    # bytes of a 1-LM-iteration / 1-CG-step sharded solve (every loop trip
    # count is 1, so static == dynamic) vs the analytic model bench.py uses
    # for chip-scaling prediction, on the same program.
    cfg1 = BAConfig(
        max_iterations=1, cg_max_iters=1, cg_tol=0.0, solver="pcg",
        relative_decrease_tol=0.0, absolute_decrease_tol=0.0,
    )
    hlo = jax.jit(
        lambda st_, pd: solve_ba_sharded(st_, pd, mesh, cfg1)
    ).lower(stacked, padded).compile().as_text()
    wire = collective_wire_bytes(hlo, n_dev)
    hlo_bytes = sum(wire.values())
    M_, D_, f_ = 2000, 6, 4
    N_ = int(padded.q.shape[0])  # pose count after block padding
    nr = (n_dev - 1) / n_dev
    model_bytes = (
        1 * (2 * nr * 3 * M_ * f_ + nr * D_ * N_ * f_)  # 1 CG matvec
        + (2 * nr * 3 * M_ * f_ + nr * D_ * N_ * f_)  # Schur-rhs pass
        + 2 * nr * 9 * M_ * f_  # landmark-side assembly psum (6+3, M)
        + nr * (D_ * D_ + D_) * N_ * f_  # Hpp/bp gather
    )

    # distributed pose graph over the same mesh
    from libwave_tpu.optim.pose_graph import (
        PoseGraphConfig,
        between_from_trajectory,
    )
    from libwave_tpu.parallel import (
        partition_pose_graph,
        solve_pose_graph_blocks,
        unpartition,
    )

    n = 32 * n_dev
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    p = jnp.asarray(
        np.stack([np.cos(theta), np.sin(theta), 0 * theta], axis=-1)
    )
    q = jnp.asarray(
        np.stack(
            [np.cos(theta / 2), 0 * theta, 0 * theta, np.sin(theta / 2)],
            axis=-1,
        )
    )
    between = between_from_trajectory(
        q, p, sigmas_rot=1e-2, sigmas_trans=1e-2,
        noise_key=jax.random.key(0),
    )
    g = partition_pose_graph(q, p, between, None, n_blocks=n_dev)
    pg_cfg = PoseGraphConfig(max_iterations=4, cg_max_iters=20)
    sp_mesh = Mesh(np.asarray(jax.devices()), ("sp",))
    # solve_pose_graph_blocks caches its jit(shard_map) executable on
    # (mesh, axis_name, cfg), so the second (timed) call below measures
    # solve time, not compile time
    fpg = lambda g_: solve_pose_graph_blocks(g_, sp_mesh, cfg=pg_cfg)
    qb, pb, pg_info = fpg(g)
    q_out, p_out = unpartition(qb, pb, n)
    jax.block_until_ready((q_out, p_out))
    t0 = time.perf_counter()
    qb, pb, pg_info = fpg(g)
    jax.block_until_ready((qb, pb))
    t_pg = time.perf_counter() - t0

    rel = abs(cs - c1) / max(abs(c1), 1e-12)
    print(
        json.dumps(
            {
                "dist_mesh_devices": n_dev,
                "dist_ba_cost_rel_err_vs_single": round(rel, 6),
                # single-vs-sharded numerical parity is the distributed
                # solver's core claim: flag loudly if it regresses so the
                # bench JSON can't silently carry a broken solver
                "dist_ba_parity_ok": bool(rel < 1e-2),
                "dist_ba_sharded_iter_per_s": round(
                    cfg.max_iterations / ts, 2
                ),
                "dist_ba_single_iter_per_s": round(
                    cfg.max_iterations / t1, 2
                ),
                "dist_pose_graph_solves_per_s": round(1.0 / t_pg, 2),
                "dist_pose_graph_final_cost": round(
                    float(pg_info["final_cost"]), 6
                ),
                "dist_hlo_wire_bytes_1iter1cg": round(hlo_bytes),
                "dist_model_wire_bytes_1iter1cg": round(model_bytes),
                "dist_model_vs_hlo_ratio": round(
                    model_bytes / max(hlo_bytes, 1.0), 3
                ),
                "dist_hlo_wire_bytes_by_op": {
                    k: round(v) for k, v in wire.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
