#!/usr/bin/env python3
"""Case 05: horizontal square to adjacent perpendicular rectangle, H/W = 1."""
from __future__ import annotations

from analytic import square_to_adjacent_rectangle
from common import (
    rectangle_xy,
    rectangle_yz,
    row_front_to,
    run_solver,
    write_case_result,
)


def main() -> None:
    W, H = 1.0, 1.0
    samples, rays = 32, 512
    meshes = [
        rectangle_xy("square", W, W, 0.0, normal=+1, center=(W / 2.0, 0.0)),
        rectangle_yz("adjacent_rectangle", W, H, 0.0, normal=+1, y_center=0.0, z_min=0.0),
    ]
    run = run_solver(meshes, samples=samples, rays=rays, min_iters=40, max_iters=500)
    path = write_case_result(
        "05_perpendicular_square_rectangle",
        description="Square plate to adjacent perpendicular rectangle with H/W=1.",
        formula="F = 1/4 + [h atan(1/h) - h1 atan(1/h1) - ln(h2)/4] / pi",
        analytical=square_to_adjacent_rectangle(H, W),
        solver_value=row_front_to(run.vf["square"], "adjacent_rectangle"),
        tolerance=1.0e-4,
        settings={"W": W, "H": H, "samples": samples, "rays": rays},
        run=run,
    )
    print(path)


if __name__ == "__main__":
    main()
