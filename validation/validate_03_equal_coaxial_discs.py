#!/usr/bin/env python3
"""Case 03: two identical coaxial parallel discs, R/H = 1."""
from __future__ import annotations

from analytic import equal_coaxial_discs
from common import disk_xy, row_front_to, run_solver, write_case_result


def main() -> None:
    R, H, segments = 1.0, 1.0, 256
    samples, rays = 16, 512
    meshes = [
        disk_xy("disc_1", R, 0.0, segments=segments, normal=+1),
        disk_xy("disc_2", R, H, segments=segments, normal=-1),
    ]
    run = run_solver(meshes, samples=samples, rays=rays, min_iters=40, max_iters=500)
    path = write_case_result(
        "03_equal_coaxial_discs",
        description="Two identical coaxial parallel discs with R/H=1.",
        formula="F = 1 + (1 - sqrt(1 + 4r^2)) / (2r^2), r = R/H",
        analytical=equal_coaxial_discs(R, H),
        solver_value=row_front_to(run.vf["disc_1"], "disc_2"),
        tolerance=1.0e-4,
        settings={"R": R, "H": H, "segments": segments, "samples": samples, "rays": rays},
        run=run,
    )
    print(path)


if __name__ == "__main__":
    main()
