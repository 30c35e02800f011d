#!/usr/bin/env python3
"""Case 02: two identical parallel rectangles, W1/H = 2, W2/H = 1."""
from __future__ import annotations

from analytic import equal_parallel_rectangles
from common import rectangle_xy, row_front_to, run_solver, write_case_result


def main() -> None:
    W1, W2, H = 2.0, 1.0, 1.0
    samples, rays = 16, 512
    meshes = [
        rectangle_xy("plate_1", W1, W2, 0.0, normal=+1),
        rectangle_xy("plate_2", W1, W2, H, normal=-1),
    ]
    run = run_solver(meshes, samples=samples, rays=rays, min_iters=40, max_iters=500)
    path = write_case_result(
        "02_parallel_equal_rectangle",
        description="Two identical parallel rectangular plates with W1/H=2 and W2/H=1.",
        formula="catalog equal-rectangles closed form with x=W1/H, y=W2/H",
        analytical=equal_parallel_rectangles(W1, W2, H),
        solver_value=row_front_to(run.vf["plate_1"], "plate_2"),
        tolerance=1.0e-4,
        settings={"W1": W1, "W2": W2, "H": H, "samples": samples, "rays": rays},
        run=run,
    )
    print(path)


if __name__ == "__main__":
    main()
