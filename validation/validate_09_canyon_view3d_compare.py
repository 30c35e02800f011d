#!/usr/bin/env python3
"""Case 09: street-canyon matrix vs the committed NIST View3D reference.

The reference repo validates its canyon solve against per-face results
produced offline by the external NIST View3D tool (reference:
validation/validate_06_canyon_view3d_compare.py:31,94 comparing against
validation/view3d_reference/). This case performs the same DIRECT
cross-check here, with two assertions:

1. the analytic contour-integral ground truth (analytic.canyon_ground_truth)
   matches the area-weight-aggregated View3D matrix to < 5e-6 — this turns
   the prose claim in case 06 ("agrees with View3D to < 5e-6") into a test,
2. the solver output matches the View3D matrix to < 1e-4, the reference's
   own tolerance for this case.

``view3d_reference/canyon_view3d_raw.json`` is external-tool DATA (View3D
per-face output for this exact scene), copied from the reference repo so the
cross-check runs offline.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from analytic import canyon_ground_truth
from common import (
    RESULTS_ROOT,
    aggregate_per_face_rows,
    base_matrix,
    max_abs_pair_diff,
    run_solver,
    write_json,
)
from examples.ex00_street_canyon_geometry import build_street_canyon

VIEW3D_RAW = Path(__file__).resolve().parent / "view3d_reference" / "canyon_view3d_raw.json"


def main() -> None:
    RESULTS_ROOT.mkdir(parents=True, exist_ok=True)
    meshes = build_street_canyon()
    names = [name for name, _, _ in meshes]

    raw = json.loads(VIEW3D_RAW.read_text(encoding="utf-8"))
    view3d = aggregate_per_face_rows(raw, meshes)
    write_json(RESULTS_ROOT / "09_canyon_view3d_base.json", view3d)

    analytic_tol = 5.0e-6
    truth = canyon_ground_truth()
    a_diff, a_pair, a_got, a_want = max_abs_pair_diff(truth, view3d, names=names)
    analytic_passed = a_diff <= analytic_tol

    samples, rays = 8, 512
    solver_tol = 1.0e-4
    run = run_solver(
        meshes, samples=samples, rays=rays, min_iters=40, max_iters=500, seed=31
    )
    solver_base = base_matrix(run.vf)
    s_diff, s_pair, s_got, s_want = max_abs_pair_diff(
        solver_base, view3d, names=names
    )
    solver_passed = s_diff <= solver_tol

    lines = [
        "case: 09_canyon_view3d",
        "description: Street canyon vs committed NIST View3D reference",
        "  (direct cross-check; View3D per-face rows aggregated area-weighted).",
        "",
        "analytic_vs_view3d:",
        f"  max_abs_diff: {a_diff:.10f}",
        f"  at_pair:      {a_pair[0]} -> {a_pair[1]}",
        f"  analytic:     {a_got:.10f}",
        f"  view3d:       {a_want:.10f}",
        f"  tolerance:    {analytic_tol:.10f}",
        f"  passed:       {analytic_passed}",
        "",
        "solver_vs_view3d:",
        f"  max_abs_diff: {s_diff:.10f}",
        f"  at_pair:      {s_pair[0]} -> {s_pair[1]}",
        f"  solver:       {s_got:.10f}",
        f"  view3d:       {s_want:.10f}",
        f"  tolerance:    {solver_tol:.10f}",
        f"  passed:       {solver_passed}",
        "",
        "settings:",
        f"  samples: {samples}",
        f"  rays: {rays}",
        "  seed: 31",
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
    path = RESULTS_ROOT / "09_canyon_view3d.txt"
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(path)


if __name__ == "__main__":
    main()
