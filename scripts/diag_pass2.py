"""Diagnose the pass-2 regression on stiff (20 Hz keyframe) chains.

Runs the MH_01-regime simulator at a reduced duration and compares the
windowed solver at passes=1 vs passes=2 (optionally with prior tweaks),
printing ATE plus the per-pose error profile in thirds so the growth
pattern along the chain is visible.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import _cached_euroc_sequence
from libwave_tpu.pipelines import (
    EurocVIOParams,
    WindowedVIOParams,
    run_euroc_vio_windowed,
)
from libwave_tpu.sim import EurocSimParams

DUR = float(os.environ.get("DIAG_DUR", "90"))
sim = EurocSimParams(duration=DUR, cam_hz=20.0, imu_hz=200.0,
                     nb_landmarks=900)
t0 = time.time()
root = _cached_euroc_sequence(sim, seed=0)
print(f"sequence ready in {time.time()-t0:.1f}s", flush=True)

configs = []
for spec in os.environ.get("DIAG_CONFIGS", "p1,p2").split(","):
    kw = {"window": 120, "overlap": 12, "mode": "marginalize"}
    for part in spec.split("+"):
        if part == "p1":
            kw["passes"] = 1
        elif part == "p2":
            kw["passes"] = 2
        elif part == "p3":
            kw["passes"] = 3
        elif part.startswith("ps"):
            kw["prior_scale"] = float(part[2:])
        elif part == "nog":
            kw["prior_gradient"] = False
        elif part.startswith("ov"):
            kw["overlap"] = int(part[2:])
    configs.append((spec, WindowedVIOParams(**kw)))

for name, wp in configs:
    t0 = time.time()
    est, rep = run_euroc_vio_windowed(root, EurocVIOParams(), wp)
    err = np.linalg.norm(rep["per_pose_error"], axis=-1) \
        if rep["per_pose_error"].ndim > 1 else rep["per_pose_error"]
    n = len(err)
    thirds = [float(np.sqrt(np.mean(err[i * n // 3:(i + 1) * n // 3] ** 2)))
              for i in range(3)]
    print(
        f"[{name}] ate {rep['ate_rmse']:.4f} rpe {rep['rpe_trans_rmse']:.4f}"
        f" thirds-rmse {thirds[0]:.3f}/{thirds[1]:.3f}/{thirds[2]:.3f}"
        f" max {err.max():.3f} wall {time.time()-t0:.0f}s"
        f" solve {rep['solve_seconds']:.0f}s marg"
        f" {rep['marginalization_seconds']:.0f}s", flush=True,
    )
