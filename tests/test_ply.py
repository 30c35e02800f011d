"""PLY ingestion: ascii + binary_little_endian, triangulation, errors."""
import struct

import numpy as np
import pytest

from raystrack_tpu.ply import load_meshes_ply

VERTS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0.5, 0.5, 1]], np.float32
)


def _ascii_ply(tmp_path, *, faces, extra_vertex_prop=False, fmt="ascii"):
    lines = ["ply", f"format {fmt} 1.0", "comment made by tests",
             f"element vertex {len(VERTS)}",
             "property float x", "property float y", "property float z"]
    if extra_vertex_prop:
        lines.append("property uchar red")
    lines += [f"element face {len(faces)}",
              "property list uchar int vertex_indices", "end_header"]
    for v in VERTS:
        row = f"{v[0]} {v[1]} {v[2]}"
        if extra_vertex_prop:
            row += " 255"
        lines.append(row)
    for f in faces:
        lines.append(f"{len(f)} " + " ".join(str(i) for i in f))
    path = tmp_path / "scene.ply"
    path.write_text("\n".join(lines) + "\n", encoding="ascii")
    return str(path)


def _binary_ply(tmp_path, *, faces):
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {len(VERTS)}\n"
              "property float x\nproperty float y\nproperty float z\n"
              f"element face {len(faces)}\n"
              "property list uchar int vertex_indices\nend_header\n")
    blob = header.encode("ascii")
    for v in VERTS:
        blob += struct.pack("<fff", *v)
    for f in faces:
        blob += struct.pack("<B", len(f)) + struct.pack(f"<{len(f)}i", *f)
    path = tmp_path / "scene_bin.ply"
    path.write_bytes(blob)
    return str(path)


def test_ascii_triangles(tmp_path):
    path = _ascii_ply(tmp_path, faces=[[0, 1, 4], [1, 2, 4]])
    [(name, V, F)] = load_meshes_ply(path)
    assert name == "scene"
    np.testing.assert_allclose(V, VERTS)
    np.testing.assert_array_equal(F, [[0, 1, 4], [1, 2, 4]])
    assert V.dtype == np.float32 and F.dtype == np.int32


def test_ascii_quad_fan_triangulated(tmp_path):
    path = _ascii_ply(tmp_path, faces=[[0, 1, 2, 3]])
    [(_, V, F)] = load_meshes_ply(path)
    np.testing.assert_array_equal(F, [[0, 1, 2], [0, 2, 3]])


def test_ascii_extra_vertex_properties_skipped(tmp_path):
    path = _ascii_ply(tmp_path, faces=[[0, 1, 2]], extra_vertex_prop=True)
    [(_, V, F)] = load_meshes_ply(path)
    np.testing.assert_allclose(V, VERTS)


def test_binary_matches_ascii(tmp_path):
    faces = [[0, 1, 4], [0, 1, 2, 3]]
    [(_, Va, Fa)] = load_meshes_ply(_ascii_ply(tmp_path, faces=faces))
    [(_, Vb, Fb)] = load_meshes_ply(_binary_ply(tmp_path, faces=faces))
    np.testing.assert_array_equal(Va, Vb)
    np.testing.assert_array_equal(Fa, Fb)


def test_custom_name(tmp_path):
    path = _ascii_ply(tmp_path, faces=[[0, 1, 2]])
    [(name, _, _)] = load_meshes_ply(path, name="roof")
    assert name == "roof"


def test_solvable_geometry(tmp_path):
    """A PLY quad facing another plate solves to a sane view factor."""
    from raystrack_tpu import MatrixParams, view_factor_matrix

    path = _ascii_ply(tmp_path, faces=[[0, 1, 2, 3]])
    [mesh] = load_meshes_ply(path, name="bottom")
    top = ("top",
           np.array([[0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32),
           np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    vf = view_factor_matrix([mesh, top], params=MatrixParams(
        samples=4, rays=64, seed=3, device="cpu", max_iters=6, min_iters=3,
        tol=1e-3))
    assert 0.05 < vf["bottom"]["top_front"] < 0.6


def test_rejects_big_endian(tmp_path):
    path = tmp_path / "bad.ply"
    path.write_text("ply\nformat binary_big_endian 1.0\n"
                    "element vertex 0\nelement face 0\nend_header\n")
    with pytest.raises(ValueError, match="unsupported PLY format"):
        load_meshes_ply(str(path))


def test_rejects_out_of_range_index(tmp_path):
    path = _ascii_ply(tmp_path, faces=[[0, 1, 9]])
    with pytest.raises(ValueError, match="undefined vertex"):
        load_meshes_ply(path)


def test_rejects_missing_elements(tmp_path):
    path = tmp_path / "noface.ply"
    path.write_text("ply\nformat ascii 1.0\nelement vertex 0\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "end_header\n")
    with pytest.raises(ValueError, match="'vertex' and 'face'"):
        load_meshes_ply(str(path))


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        load_meshes_ply("/nonexistent/scene.ply")


def test_cli_accepts_ply(tmp_path, capsys):
    from raystrack_tpu.cli import main

    path = _ascii_ply(tmp_path, faces=[[0, 1, 2, 3]])
    out = tmp_path / "vf.json"
    main(["matrix", path, "--out", str(out), "--samples", "2", "--rays", "8",
          "--max-iters", "2", "--min-iters", "1", "--device", "cpu"])
    assert out.exists()


def test_ply_writer_roundtrip(tmp_path):
    from raystrack_tpu.ply import save_mesh_ply

    F = np.array([[0, 1, 2], [0, 2, 4], [1, 3, 2]], np.int32)
    path = save_mesh_ply(("panel", VERTS, F), str(tmp_path / "panel"))
    assert path.endswith(".ply")
    [(name, V2, F2)] = load_meshes_ply(path)
    assert name == "panel"
    np.testing.assert_array_equal(V2, VERTS)
    np.testing.assert_array_equal(F2, F)


def test_ply_writer_validates(tmp_path):
    from raystrack_tpu.ply import save_mesh_ply

    with pytest.raises(ValueError, match="must be"):
        save_mesh_ply(("bad", VERTS[:, :2], np.zeros((1, 3), np.int32)),
                      str(tmp_path / "bad"))
