"""Validation ground-truth module: closed forms vs each other and quadrature."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "validation"))

from analytic import (  # noqa: E402
    canyon_ground_truth,
    equal_coaxial_discs,
    equal_parallel_rectangles,
    equal_parallel_squares,
    gauss_legendre_F,
    parallel_rectangles,
    patch_to_disc,
    perpendicular_common_edge,
    square_to_adjacent_rectangle,
)


def test_known_catalog_values():
    assert abs(equal_parallel_squares(1, 1) - 0.1998248957) < 1e-9
    assert abs(equal_parallel_rectangles(2, 1, 1) - 0.2858753849) < 1e-9
    assert abs(equal_coaxial_discs(1, 1) - 0.3819660113) < 1e-9
    assert abs(patch_to_disc(1, 1) - 0.5) < 1e-12
    assert abs(square_to_adjacent_rectangle(1, 1) - 0.2000437761) < 1e-9


def test_general_parallel_matches_catalog():
    got = parallel_rectangles((-0.5, 0.5), (-0.5, 0.5), (-0.5, 0.5), (-0.5, 0.5), 1.0)
    assert abs(got - equal_parallel_squares(1, 1)) < 1e-12
    got = parallel_rectangles((-1, 1), (-0.5, 0.5), (-1, 1), (-0.5, 0.5), 1.0)
    assert abs(got - equal_parallel_rectangles(2, 1, 1)) < 1e-12


def test_perpendicular_matches_catalog():
    got = perpendicular_common_edge(1.0, 1.0, 1.0)
    assert abs(got - square_to_adjacent_rectangle(1, 1)) < 1e-12


def test_quadrature_matches_closed_forms():
    c1 = ((-0.5, -0.5, 0), (1, 0, 0), (0, 1, 0))
    c2 = ((-0.5, 0.5, 1), (1, 0, 0), (0, -1, 0))
    got = gauss_legendre_F(c1, c2, n=32)
    assert abs(got - equal_parallel_squares(1, 1)) < 1e-10

    # offset parallel rectangles: quadrature vs contour closed form
    want = parallel_rectangles((-1, 1), (0, 1), (0.5, 2.5), (-1, 0.5), 2.0)
    c1 = ((-1, 0, 0), (2, 0, 0), (0, 1, 0))
    c2 = ((0.5, 0.5, 2), (2, 0, 0), (0, -1.5, 0))
    got = gauss_legendre_F(c1, c2, n=32)
    assert abs(got - want) < 1e-10


def test_canyon_truth_invariants():
    gt = canyon_ground_truth()
    names = list(gt.keys())
    assert len(names) == 11
    A = {n: 40.0 for n in names}
    A["road"] = 80.0
    # reciprocity
    for a in names:
        for b in names:
            assert abs(A[a] * gt[a][b] - A[b] * gt[b][a]) < 1e-9
    # same-facade pairs are zero
    assert gt["east_side_0"]["east_side_3"] == 0.0
    # symmetry between facades
    assert abs(gt["east_side_1"]["west_side_3"] - gt["west_side_1"]["east_side_3"]) < 1e-12
    # closer stories see each other more
    assert gt["east_side_0"]["west_side_0"] > gt["east_side_0"]["west_side_4"]
    # road sees the lowest story most
    assert gt["road"]["east_side_0"] > gt["road"]["east_side_1"]
    # row sums below 1 (open canyon)
    for a in names:
        assert 0.0 < sum(gt[a].values()) < 1.0


def test_canyon_panel_pair_against_quadrature():
    gt = canyon_ground_truth()
    # east story 1 -> west story 3: smooth separated pair, GL converges fast
    # (edge order chosen so the normals face into the canyon: +X and -X)
    c1 = ((-4, -5, 4), (0, 10, 0), (0, 0, 4))
    c2 = ((4, -5, 12), (0, 0, 4), (0, 10, 0))
    got = gauss_legendre_F(c1, c2, n=32)
    assert abs(got - gt["east_side_1"]["west_side_3"]) < 1e-8
