#!/usr/bin/env python3
"""Case 01: two identical parallel unit squares, W/H = 1."""
from __future__ import annotations

from analytic import equal_parallel_squares
from common import rectangle_xy, row_front_to, run_solver, write_case_result


def main() -> None:
    W, H = 1.0, 1.0
    samples, rays = 32, 1024
    meshes = [
        rectangle_xy("plate_1", W, W, 0.0, normal=+1),
        rectangle_xy("plate_2", W, W, H, normal=-1),
    ]
    run = run_solver(meshes, samples=samples, rays=rays, min_iters=40, max_iters=500)
    path = write_case_result(
        "01_parallel_equal_square",
        description="Two identical parallel square plates with W/H=1.",
        formula="F = [ln(x^4/(1+2w^2)) + 4w(x atan(w/x) - atan(w))] / (pi w^2)",
        analytical=equal_parallel_squares(W, H),
        solver_value=row_front_to(run.vf["plate_1"], "plate_2"),
        tolerance=1.0e-4,
        settings={"W": W, "H": H, "samples": samples, "rays": rays},
        run=run,
    )
    print(path)


if __name__ == "__main__":
    main()
