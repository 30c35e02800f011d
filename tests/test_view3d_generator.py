"""The View3D fixture is regenerable: the .vs3 writer reproduces the
committed input byte-for-byte and the output parser round-trips a synthetic
View3D result (reference generated its fixture the same way offline:
reference validation/generate_canyon_view3d_reference.py:20-60)."""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "validation"))

from generate_view3d_reference import (  # noqa: E402
    face_names,
    parse_view3d_output,
    write_vs3,
)


def _plates():
    V0 = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    V1 = V0 + np.array([0, 0, 1], np.float32)
    return [("bottom", V0, F), ("top", V1, F[:, ::-1].copy())]


def test_write_vs3_matches_committed_canyon(tmp_path):
    sys.path.insert(0, str(REPO))
    from examples.ex00_street_canyon_geometry import build_street_canyon

    committed = REPO / "validation" / "view3d_reference" / "canyon_view3d.vs3"
    out = write_vs3(build_street_canyon(), tmp_path / "canyon.vs3",
                    title="raystrack canyon validation reference")
    assert out.read_text() == committed.read_text()


def test_parse_view3d_output_roundtrip(tmp_path):
    meshes = _plates()
    names = face_names(meshes)
    n = len(names)
    rng = np.random.default_rng(0)
    F = rng.uniform(0, 0.3, (n, n))
    areas = np.full(n, 0.5)
    lines = [f"View3D 3.5 0 0 0 {n}",
             " ".join(f"{a:g}" for a in areas)]
    # wrap matrix rows irregularly: the parser must consume a value stream
    flat = [f"{v:.6f}" for v in F.reshape(-1)]
    lines += [" ".join(flat[:5]), " ".join(flat[5:]),
              " ".join("0.999" for _ in range(n))]
    p = tmp_path / "out.txt"
    p.write_text("\n".join(lines))
    raw, got_areas = parse_view3d_output(p, meshes)
    assert list(raw) == names
    np.testing.assert_allclose(got_areas, areas)
    for i, s in enumerate(names):
        for j, r in enumerate(names):
            assert raw[s][r] == float(f"{F[i, j]:.6f}")
