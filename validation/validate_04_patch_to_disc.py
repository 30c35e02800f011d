#!/usr/bin/env python3
"""Case 04: small square patch to a parallel concentric disc, H/R = 1."""
from __future__ import annotations

from analytic import patch_to_disc
from common import disk_xy, rectangle_xy, row_front_to, run_solver, write_case_result


def main() -> None:
    R, H, patch_side, segments = 1.0, 1.0, 0.04, 256
    samples, rays = 8, 1024
    meshes = [
        rectangle_xy("patch", patch_side, patch_side, 0.0, normal=+1),
        disk_xy("disc", R, H, segments=segments, normal=-1),
    ]
    run = run_solver(meshes, samples=samples, rays=rays, min_iters=40, max_iters=500)
    path = write_case_result(
        "04_patch_to_disc",
        description="Small square patch approximating a differential patch to a parallel concentric disc.",
        formula="F = 1 / (1 + h^2), h = H/R",
        analytical=patch_to_disc(R, H),
        solver_value=row_front_to(run.vf["patch"], "disc"),
        tolerance=1.0e-4,
        settings={
            "R": R, "H": H, "patch_side": patch_side, "segments": segments,
            "samples": samples, "rays": rays,
        },
        run=run,
    )
    print(path)


if __name__ == "__main__":
    main()
