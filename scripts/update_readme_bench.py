#!/usr/bin/env python
"""Regenerate README.md's measured-numbers table from BENCH_full.json.

Single source of truth for published numbers: the bench artifact the driver
captured (VERDICT r3: hand-copied README numbers drifted from BENCH_r03).
Run after `python bench.py` (which writes BENCH_full.json):

    python scripts/update_readme_bench.py

Rewrites everything between the BENCH_TABLE markers in README.md; rows whose
keys are missing from the artifact are dropped rather than stale-quoted.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

START = "<!-- BENCH_TABLE_START (scripts/update_readme_bench.py) -->"
END = "<!-- BENCH_TABLE_END -->"


def _fmt(v, nd=2):
    if isinstance(v, float):
        s = f"{v:.{nd}f}"
        if "." in s:  # only strip FRACTIONAL zeros ("460" must stay "460")
            s = s.rstrip("0").rstrip(".")
        return s
    return str(v)


def build_rows(rec: dict) -> list[tuple[str, str]]:
    x = rec.get("extras", {})
    rows = []

    def need(*keys):
        return all(k in x for k in keys)

    rows.append((
        "BA LM iterations/s (10k landmarks, 60k obs, cg=20)",
        f"{_fmt(rec['value'])} ({_fmt(rec['vs_baseline'], 1)}x "
        "same-algorithm JAX on 2-core CPU)",
    ))
    if need("ba_lm_iterations_per_s_100k_landmarks",
            "ba_100k_achieved_gbps", "ba_100k_hbm_roofline_fraction"):
        rows.append((
            "BA at 100k landmarks / 600k obs",
            f"{_fmt(x['ba_lm_iterations_per_s_100k_landmarks'])} iter/s, "
            f"{_fmt(x['ba_100k_achieved_gbps'])} GB/s "
            f"({_fmt(100 * x['ba_100k_hbm_roofline_fraction'], 1)}% of HBM "
            "roofline)",
        ))
    if need("ba_batched8_iter_per_s", "ba_batched8_speedup"):
        rows.append((
            "BA batched throughput (8 x 2k-lm windows, one vmapped program)",
            f"{_fmt(x['ba_batched8_iter_per_s'])} agg iter/s "
            f"({_fmt(x['ba_batched8_speedup'], 1)}x single)",
        ))
    if need("vio_keyframes_per_s", "vio_batched8_keyframes_per_s",
            "vio_batched8_speedup"):
        rows.append((
            "VIO solve (54 keyframes, dense Schur)",
            f"{_fmt(x['vio_keyframes_per_s'])} kf/s single / "
            f"{_fmt(x['vio_batched8_keyframes_per_s'])} kf/s at B=8 "
            f"sessions ({_fmt(x['vio_batched8_speedup'], 1)}x)",
        ))
    if need("euroc_ate_rmse_m", "euroc_keyframes"):
        rows.append((
            f"EuRoC-format end-to-end ATE ({x['euroc_keyframes']} kf, "
            "sidecar tracks)",
            f"{_fmt(x['euroc_ate_rmse_m'], 4)} m",
        ))
    if need("pixels_ate_rmse_m", "pixels_frontend_frames_per_s"):
        rows.append((
            "Pixels -> trajectory (images+IMU only, own front end)",
            f"ATE {_fmt(x['pixels_ate_rmse_m'], 4)} m, "
            f"{_fmt(x['pixels_frontend_frames_per_s'], 1)} frames/s "
            "tracking steady-state",
        ))
    def _kf_rate(prefix):
        """End-to-end sequence rate when recorded (passes>1 re-solves
        divided out), annotated with the window-march rate — never quote
        the flattering window-march number alone."""
        seq = x.get(f"{prefix}_sequence_keyframes_per_s")
        march = x.get(f"{prefix}_solve_keyframes_per_s")
        if seq is not None:
            return (f"{_fmt(seq, 0)} kf/s end-to-end "
                    f"({_fmt(march, 0)} kf/s window-march)")
        return f"{_fmt(march, 0)} kf/s"

    if need("euroc_long_ate_rmse_m", "euroc_long_solve_keyframes_per_s",
            "euroc_long_keyframes", "euroc_long_windows"):
        row = (
            f"{x['euroc_long_keyframes']}-keyframe sequence (windowed "
            f"marginalizing solver, {x['euroc_long_windows']} chained "
            "windows)",
            f"ATE {_fmt(x['euroc_long_ate_rmse_m'], 4)} m at "
            f"{_kf_rate('euroc_long')}",
        )
        if "euroc_long_ate_rmse_m_freeze_ablation" in x:
            row = (row[0], row[1] + (
                f" (frozen-anchor ablation: "
                f"{_fmt(x['euroc_long_ate_rmse_m_freeze_ablation'], 4)} m)"
            ))
        rows.append(row)
    if need("euroc_mh01_scale_keyframes", "euroc_mh01_scale_ate_rmse_m",
            "euroc_mh01_scale_solve_keyframes_per_s"):
        rows.append((
            f"MH_01-length run ({x['euroc_mh01_scale_keyframes']} kf, "
            "182 s, 20 Hz cam / 200 Hz IMU, simulated — see denominators)",
            f"ATE {_fmt(x['euroc_mh01_scale_ate_rmse_m'], 4)} m at "
            f"{_kf_rate('euroc_mh01_scale')} "
            f"over {x.get('euroc_mh01_scale_windows', '?')} windows",
        ))
    if need("icp_scan_pairs_per_s", "icp_translation_err_m",
            "icp_vs_numpy_cpu"):
        rows.append((
            "ICP on the real testscan.pcd (multiscale, 4096 pts)",
            f"{_fmt(x['icp_scan_pairs_per_s'])} pairs/s, "
            f"{_fmt(x['icp_translation_err_m'], 4)} m recovery, "
            f"{_fmt(x['icp_vs_numpy_cpu'], 0)}x the C++/numpy anchor",
        ))
    if need("frontend_pairs_per_s"):
        val = f"{_fmt(x['frontend_pairs_per_s'])} pairs/s single"
        for k, v in sorted(x.items()):
            m = re.fullmatch(r"frontend_batched(\d+)_pairs_per_s", k)
            if m:
                val += f" / {_fmt(v)} pairs/s batched x{m.group(1)}"
        rows.append(("Front-end two-frame pipeline", val))
    if need("frontend_single_frames_per_s_752x480",
            "frontend_batched8_frames_per_s", "frontend_batched8_speedup"):
        rows.append((
            "Whole-sequence tracking at 752x480 (FAST->BRISK->match->track)",
            f"{_fmt(x['frontend_single_frames_per_s_752x480'], 1)} fps "
            f"single / {_fmt(x['frontend_batched8_frames_per_s'], 1)} fps "
            f"aggregate at B=8 ({_fmt(x['frontend_batched8_speedup'], 2)}x "
            "— full-res frames saturate one chip; batch at lower "
            "resolutions)",
        ))
    if need("lsh_16k_matches_per_s", "lsh_16k_recall_planted"):
        rows.append((
            "LSH matcher (16k x 16k binary descriptors)",
            f"{_fmt(x['lsh_16k_matches_per_s'], 0)} matches/s at "
            f"{_fmt(100 * x['lsh_16k_recall_planted'], 1)}% planted recall",
        ))
    if need("pp_overlap_speedup"):
        rows.append((
            "PP overlap (front-end/back-end pipelined dispatch)",
            f"{_fmt(x['pp_overlap_speedup'])}x vs serial, measured on one "
            "chip",
        ))
    if need("dist_model_vs_hlo_ratio"):
        parity = ""
        if "dist_ba_cost_rel_err_vs_single" in x:
            parity = (
                "sharded final cost within "
                f"{_fmt(100 * x['dist_ba_cost_rel_err_vs_single'], 2)}% of "
                "single-device; "
            )
        rows.append((
            "Distributed BA parity (8-dev mesh)",
            f"{parity}ICI model = "
            f"{_fmt(x['dist_model_vs_hlo_ratio'], 3)}x compiler collective "
            "bytes",
        ))
    if need("dist_predicted_scaling_eff_8chip"):
        rows.append((
            "Predicted 8-chip scaling efficiency (model, NOT measured)",
            f"{_fmt(x['dist_predicted_scaling_eff_8chip'], 3)}",
        ))
    return rows


def main():
    bench_path = os.path.join(REPO, "BENCH_full.json")
    readme_path = os.path.join(REPO, "README.md")
    with open(bench_path) as f:
        rec = json.load(f)
    with open(readme_path) as f:
        readme = f.read()
    if START not in readme or END not in readme:
        sys.exit("README.md is missing the BENCH_TABLE markers")

    rows = build_rows(rec)
    body = "\n".join([
        "| What | Number |",
        "|---|---|",
        *(f"| {k} | {v} |" for k, v in rows),
    ])
    src = rec.get("metric", "bench")
    table = (
        f"{START}\n"
        f"All numbers below are regenerated verbatim from `BENCH_full.json`"
        f" (metric `{src}`) by `scripts/update_readme_bench.py` — run-to-run"
        f" variance on the shared chip is a few percent; treat the artifact"
        f" as the record.\n\n{body}\n{END}"
    )
    new = re.sub(
        re.escape(START) + r".*?" + re.escape(END), table, readme,
        flags=re.S,
    )
    with open(readme_path, "w") as f:
        f.write(new)
    print(f"README.md table regenerated: {len(rows)} rows")


if __name__ == "__main__":
    main()
