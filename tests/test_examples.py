"""Smoke guards for the examples: importable, geometry builders sane.

Full example runs happen on real hardware; these tests only pin the cheap
deterministic parts so refactors can't silently break the walkthroughs.
"""
import importlib
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

EXAMPLES = [
    "examples.ex00_street_canyon_geometry",
    "examples.ex01_compute_vf",
    "examples.ex02_compare_sky_vf",
    "examples.ex03_workflow",
    "examples.ex04_inside_enclosure",
    "examples.ex05_prepared_seed_compare",
    "examples.ex06_city_block",
    "examples.ex07_resumable_pipeline",
]


def test_examples_import():
    for name in EXAMPLES:
        assert importlib.import_module(name) is not None


def test_canyon_builder_geometry():
    mod = importlib.import_module("examples.ex00_street_canyon_geometry")
    meshes = mod.build_street_canyon()
    names = [m[0] for m in meshes]
    assert len(meshes) == 11 and names[-1] == "road"
    # facades 8 m apart, road spans the gap, panels 10 x 4
    for name, V, F in meshes:
        assert V.dtype == np.float32 and F.dtype == np.int32
        n = np.cross(V[F[0, 1]] - V[F[0, 0]], V[F[0, 2]] - V[F[0, 0]])
        if name.startswith("east"):
            assert n[0] > 0  # faces +X into the canyon
        elif name.startswith("west"):
            assert n[0] < 0
        else:
            assert n[2] > 0  # road faces up


def test_cube_builder_closed_outward():
    mod = importlib.import_module("examples.ex04_inside_enclosure")
    meshes = mod.make_box_unit_cube()
    assert len(meshes) == 6
    center = np.array([0.5, 0.5, 0.5])
    for name, V, F in meshes:
        face_center = V.mean(axis=0)
        n = np.cross(V[F[0, 1]] - V[F[0, 0]], V[F[0, 2]] - V[F[0, 0]])
        assert np.dot(n, face_center - center) > 0  # outward


def test_city_builder():
    mod = importlib.import_module("examples.ex06_city_block")
    meshes = mod.build_city(grid=3)
    assert len(meshes) == 3 * 3 * 5 + 1
    assert meshes[-1][0] == "ground"


def test_ex01_runs_end_to_end(tmp_path, capsys):
    """ex01's full body executes (tiny sampling): the output JSON parses and
    every row sums to a sane fraction."""
    import json

    mod = importlib.import_module("examples.ex01_compute_vf")
    path = mod.main(out_dir=str(tmp_path), samples=2, rays=16,
                    max_iters=3, min_iters=2, tol=1e-2)
    data = json.loads(Path(path).read_text())
    assert len(data) == 11
    for name, row in data.items():
        total = sum(row.values())
        assert 0.0 <= total <= 1.0 + 1e-6, (name, total)
    assert "Saved view-factor matrix" in capsys.readouterr().out


def test_ex03_runs_end_to_end(tmp_path):
    """ex03's workflow executes end-to-end and scene+sky+rest == 1."""
    import json

    mod = importlib.import_module("examples.ex03_workflow")
    vf_scene, sky_vf, rest_vf = mod.main(
        out_dir=str(tmp_path), samples=2, rays=16,
        max_iters=3, min_iters=2, tol=1e-2,
    )
    scene_file = json.loads((tmp_path / "vf_scene_workflow.json").read_text())
    sky_file = json.loads((tmp_path / "sky_vf_workflow.json").read_text())
    assert set(scene_file) == set(sky_file)
    for name in rest_vf:
        total = (sum(vf_scene.get(name, {}).values())
                 + sum(sky_vf.get(name, {}).values())
                 + rest_vf[name]["Rest"])
        assert abs(total - 1.0) < 1e-9, (name, total)


def test_ex07_runs_end_to_end(tmp_path):
    """ex07's pipeline executes: PLY+OBJ ingest, checkpointed solve,
    streamed output parses, and a second run restores from checkpoints."""
    import json

    mod = importlib.import_module("examples.ex07_resumable_pipeline")
    path = mod.main(out_dir=str(tmp_path), samples=2, rays=16,
                    max_iters=3, min_iters=2, tol=1e-2)
    data = json.loads(Path(path).read_text())
    assert "terrain" in data and any(k.startswith("tower") for k in data)
    for row in data.values():
        total = sum(row.values())
        assert 0.0 <= total <= 1.0 + 1e-6
    # resume: everything restores, result identical
    again = json.loads(Path(mod.main(out_dir=str(tmp_path), samples=2,
                                     rays=16, max_iters=3, min_iters=2,
                                     tol=1e-2)).read_text())
    assert again == data
