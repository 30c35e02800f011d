#!/usr/bin/env python3
"""Run all validation cases sequentially and report pass/fail."""
from __future__ import annotations

import validate_01_parallel_equal_square
import validate_02_parallel_equal_rectangle
import validate_03_equal_coaxial_discs
import validate_04_patch_to_disc
import validate_05_perpendicular_square_rectangle
import validate_06_canyon_analytic_compare
import validate_07_canyon_sky
import validate_08_cube_interior
import validate_09_canyon_view3d_compare

CASES = [
    validate_01_parallel_equal_square,
    validate_02_parallel_equal_rectangle,
    validate_03_equal_coaxial_discs,
    validate_04_patch_to_disc,
    validate_05_perpendicular_square_rectangle,
    validate_06_canyon_analytic_compare,
    validate_07_canyon_sky,
    validate_08_cube_interior,
    validate_09_canyon_view3d_compare,
]


def main() -> None:
    for case in CASES:
        print(f"== {case.__name__} ==")
        case.main()


if __name__ == "__main__":
    main()
