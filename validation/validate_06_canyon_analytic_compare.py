#!/usr/bin/env python3
"""Case 06: street-canyon matrix vs the analytic unobstructed ground truth.

Every surface pair in the canyon is fully visible, so the exact F matrix
follows from view-factor closed forms (parallel-rectangles contour form for
facade pairs, cumulative perpendicular common-edge formula for road/facade;
see analytic.canyon_ground_truth). This analytic matrix agrees with the
NIST View3D numerical reference for the same scene to < 5e-6 — asserted
directly by case 09 (validate_09_canyon_view3d_compare) against the
committed View3D data — so passing here is strictly stronger than matching
View3D at the 1e-4 tolerance.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from analytic import canyon_ground_truth
from common import (
    RESULTS_ROOT,
    base_matrix,
    max_abs_pair_diff,
    run_solver,
    write_json,
)
from examples.ex00_street_canyon_geometry import build_street_canyon


def main() -> None:
    RESULTS_ROOT.mkdir(parents=True, exist_ok=True)
    meshes = build_street_canyon()
    names = [name for name, _, _ in meshes]

    samples, rays = 8, 512
    tolerance = 1.0e-4

    run = run_solver(
        meshes, samples=samples, rays=rays, min_iters=40, max_iters=500, seed=31
    )
    solver_base = base_matrix(run.vf)
    write_json(RESULTS_ROOT / "06_canyon_raystrack_tpu_raw.json", run.vf)
    write_json(RESULTS_ROOT / "06_canyon_raystrack_tpu_base.json", solver_base)

    truth = canyon_ground_truth()
    write_json(RESULTS_ROOT / "06_canyon_analytic_base.json", truth)
    max_diff, pair, got, want = max_abs_pair_diff(solver_base, truth, names=names)
    passed = max_diff <= tolerance

    lines = [
        "case: 06_canyon_analytic",
        "description: Street canyon vs analytic unobstructed ground truth",
        "  (agrees with the NIST View3D reference for this scene to < 5e-6).",
        "",
        f"max_abs_diff: {max_diff:.10f}",
        f"at_pair:      {pair[0]} -> {pair[1]}",
        f"solver:       {got:.10f}",
        f"analytic:     {want:.10f}",
        f"tolerance:    {tolerance:.10f}",
        f"passed:       {passed}",
        "",
        "settings:",
        f"  samples: {samples}",
        f"  rays: {rays}",
        f"  seed: 31",
        "",
        "convergence:",
        f"  tol_mode: {run.tol_mode}",
        f"  tol: {run.tol:.10f}",
        f"  min_iters: {run.min_iters}",
        f"  max_iters: {run.max_iters}",
        f"  converged_before_max: {run.converged_before_max}",
        "  iterations:",
    ]
    lines += [f"    {name}: {iters}" for name, iters in run.iterations.items()]
    path = RESULTS_ROOT / "06_canyon_analytic.txt"
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(path)


if __name__ == "__main__":
    main()
