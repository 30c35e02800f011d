"""View3D cross-check machinery: per-face aggregation + committed-data parity.

The committed ``validation/view3d_reference/canyon_view3d_raw.json`` is
per-face output of the external NIST View3D tool for the canyon scene
(reference: validation/view3d_reference/). These tests pin the area-weighted
aggregation utility (reference: validation/common_validation.py:281-312) and
assert the analytic ground truth matches the aggregated View3D matrix —
without running the solver, so they are cheap enough for the unit suite. The
solver-vs-View3D check lives in validation/validate_09_canyon_view3d_compare.
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "validation"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from analytic import canyon_ground_truth  # noqa: E402
from common import (  # noqa: E402
    aggregate_per_face_rows,
    face_areas,
    max_abs_pair_diff,
)
from examples.ex00_street_canyon_geometry import build_street_canyon  # noqa: E402

VIEW3D_RAW = (
    Path(__file__).resolve().parents[1]
    / "validation" / "view3d_reference" / "canyon_view3d_raw.json"
)


def test_face_areas_triangle_and_quad():
    V = np.array([[0, 0, 0], [2, 0, 0], [2, 1, 0], [0, 1, 0]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    areas = face_areas(V, F)
    np.testing.assert_allclose(areas, [1.0, 1.0], rtol=1e-12)


def test_aggregate_weights_by_area():
    # one mesh, two faces of UNEQUAL area (1:4) -> weights 0.2 / 0.8
    V = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [3, 0, 0], [3, 2, 0], [0, 2, 0]],
        np.float32,
    )
    F = np.array([[0, 1, 2], [1, 3, 4]], np.int32)
    a = face_areas(V, F)
    assert a[1] / a[0] == 4.0
    raw = {
        "m_1": {"r_1": 0.4, "r_2": 0.2},
        "m_2": {"r_1": 0.8},
    }
    meshes = [("m", V, F)]
    out = aggregate_per_face_rows(raw, meshes)
    # receiver faces r_1/r_2 fold into base "r"
    assert set(out["m"]) == {"r"}
    expected = 0.2 * (0.4 + 0.2) + 0.8 * 0.8
    np.testing.assert_allclose(out["m"]["r"], expected, rtol=1e-12)


def test_aggregate_zero_area_mesh_uniform_weights():
    V = np.zeros((3, 3), np.float32)
    F = np.array([[0, 1, 2], [0, 2, 1]], np.int32)
    raw = {"z_1": {"r_1": 0.2}, "z_2": {"r_1": 0.6}}
    out = aggregate_per_face_rows(raw, [("z", V, F)])
    np.testing.assert_allclose(out["z"]["r"], 0.4, rtol=1e-12)


def test_canyon_analytic_matches_committed_view3d():
    """The prose claim of validation case 06, as an executable assertion:
    analytic contour-integral truth == aggregated View3D to < 5e-6."""
    meshes = build_street_canyon()
    names = [name for name, _, _ in meshes]
    raw = json.loads(VIEW3D_RAW.read_text(encoding="utf-8"))
    view3d = aggregate_per_face_rows(raw, meshes)
    truth = canyon_ground_truth()
    diff, pair, got, want = max_abs_pair_diff(truth, view3d, names=names)
    assert diff < 5.0e-6, (diff, pair, got, want)
