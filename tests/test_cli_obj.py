"""OBJ ingestion and the command-line interface."""
import json

import numpy as np
import pytest

from raystrack_tpu.cli import main as cli_main
from raystrack_tpu.io import save_meshes_json
from raystrack_tpu.obj import load_meshes_obj

OBJ_TEXT = """\
# two parallel unit squares
o bottom
v -0.5 -0.5 0.0
v  0.5 -0.5 0.0
v  0.5  0.5 0.0
v -0.5  0.5 0.0
f 1 2 3 4
o top
v -0.5 -0.5 1.0
v  0.5 -0.5 1.0
v  0.5  0.5 1.0
v -0.5  0.5 1.0
f 5//1 8//1 7//1 6//1
"""


def test_obj_loader_groups_and_triangulation(tmp_path):
    path = tmp_path / "scene.obj"
    path.write_text(OBJ_TEXT)
    meshes = load_meshes_obj(str(path))
    assert [m[0] for m in meshes] == ["bottom", "top"]
    for name, V, F in meshes:
        assert V.shape == (4, 3) and V.dtype == np.float32
        assert F.shape == (2, 3) and F.dtype == np.int32  # quad fan -> 2 tris
    # bottom winding gives +Z normal, top (reversed) gives -Z
    for name, want_z in (("bottom", 1.0), ("top", -1.0)):
        V, F = dict((m[0], (m[1], m[2])) for m in meshes)[name]
        n = np.cross(V[F[0, 1]] - V[F[0, 0]], V[F[0, 2]] - V[F[0, 0]])
        assert np.sign(n[2]) == want_z


def test_obj_loader_negative_indices(tmp_path):
    path = tmp_path / "neg.obj"
    path.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    (name, V, F), = load_meshes_obj(str(path))
    assert name == "mesh" and F.tolist() == [[0, 1, 2]]


def test_obj_loader_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_meshes_obj(str(tmp_path / "missing.obj"))
    empty = tmp_path / "empty.obj"
    empty.write_text("v 0 0 0\n")
    with pytest.raises(ValueError):
        load_meshes_obj(str(empty))
    bad = tmp_path / "bad.obj"
    bad.write_text("v 0 0 0\nf 1 2 9\n")
    with pytest.raises(ValueError):
        load_meshes_obj(str(bad))


def _plates_json(tmp_path):
    V1 = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0], [-0.5, 0.5, 0]],
                  np.float32)
    V2 = V1 + np.float32([0, 0, 1])
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    F_down = F[:, [0, 2, 1]].copy()
    path = tmp_path / "plates.json"
    save_meshes_json([("bottom", V1, F), ("top", V2, F_down)], str(path))
    return str(path)


def test_cli_matrix(tmp_path, capsys):
    scene = _plates_json(tmp_path)
    out = tmp_path / "vf.json"
    rc = cli_main([
        "matrix", scene, "--out", str(out), "--device", "cpu",
        "--samples", "8", "--rays", "64", "--max-iters", "5",
        "--min-iters", "2", "--tol", "1e-2",
    ])
    assert rc == 0
    vf = json.loads(out.read_text())
    assert 0.1 < vf["bottom"]["top_front"] < 0.3


def test_cli_workflow_obj_input(tmp_path):
    scene = tmp_path / "scene.obj"
    scene.write_text(OBJ_TEXT)
    rc = cli_main([
        "workflow", str(scene), "--out-prefix", str(tmp_path / "w_"),
        "--device", "cpu", "--samples", "8", "--rays", "64",
        "--max-iters", "5", "--min-iters", "2", "--tol", "1e-2",
    ])
    assert rc == 0
    scene_vf = json.loads((tmp_path / "w_vf_scene.json").read_text())
    sky_vf = json.loads((tmp_path / "w_sky_vf.json").read_text())
    rest_vf = json.loads((tmp_path / "w_rest_vf.json").read_text())
    total = (
        sum(scene_vf.get("bottom", {}).values())
        + sum(sky_vf.get("bottom", {}).values())
        # zero-valued Rest entries are pruned from the JSON by design
        + rest_vf.get("bottom", {}).get("Rest", 0.0)
    )
    assert abs(total - 1.0) < 1e-9


def test_cli_matrix_stream_out(tmp_path, capsys):
    """--stream-out writes the matrix row-by-row; file loads and matches a
    non-streamed solve with reciprocity off."""
    import json

    import numpy as np

    from raystrack_tpu.cli import main
    from raystrack_tpu.io import save_meshes_json

    def square(name, z, flip):
        V = np.array([[-0.5, -0.5, z], [0.5, -0.5, z], [0.5, 0.5, z],
                      [-0.5, 0.5, z]], np.float32)
        F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        if flip:
            F = F[:, [0, 2, 1]].copy()
        return name, V, F

    scene_path = save_meshes_json(
        [square("bottom", 0.0, False), square("top", 1.0, True)],
        str(tmp_path / "scene"),
    )
    common = [scene_path, "--samples", "2", "--rays", "16", "--max-iters",
              "3", "--min-iters", "2", "--device", "cpu", "--no-reciprocity"]
    main(["matrix", *common, "--out", str(tmp_path / "plain.json")])
    main(["matrix", *common, "--stream-out", "--out",
          str(tmp_path / "streamed.json")])
    plain = json.loads((tmp_path / "plain.json").read_text())
    streamed = json.loads((tmp_path / "streamed.json").read_text())
    assert streamed == {k: v for k, v in plain.items() if v} or streamed == plain
    assert "(streamed)" in capsys.readouterr().out


def test_obj_writer_roundtrip(tmp_path):
    import numpy as np

    from raystrack_tpu.obj import load_meshes_obj, save_meshes_obj

    V1 = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    F1 = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    V2 = (V1 + np.float32([0, 0, 2.5]))[:3]
    F2 = np.array([[0, 2, 1]], np.int32)
    meshes = [("floor", V1, F1), ("tilted", V2, F2)]
    path = save_meshes_obj(meshes, str(tmp_path / "scene"))
    assert path.endswith(".obj")
    loaded = load_meshes_obj(path)
    assert [m[0] for m in loaded] == ["floor", "tilted"]
    for (n0, Va, Fa), (n1, Vb, Fb) in zip(meshes, loaded):
        np.testing.assert_array_equal(Va, Vb)
        np.testing.assert_array_equal(Fa, Fb)
