"""JSON I/O round trips, pruning and merge semantics."""
import json

import numpy as np
import pytest

from raystrack_tpu.io import (
    load_meshes_json,
    load_vf_matrix_json,
    merge_vf_matrix,
    save_meshes_json,
    save_vf_matrix_json,
)


def test_merge_list_of_dicts():
    a = {"s1": {"r1": 0.1}, "s2": {"r1": 0.2}}
    b = {"s1": {"r2": 0.3, "r1": 0.15}}
    merged = merge_vf_matrix([a, b])
    assert merged == {"s1": {"r1": 0.15, "r2": 0.3}, "s2": {"r1": 0.2}}


def test_merge_rejects_bad_types():
    with pytest.raises(TypeError):
        merge_vf_matrix(42)
    with pytest.raises(TypeError):
        merge_vf_matrix([{"a": {}}, "nope"])


def test_save_drops_zeros_and_roundtrips(tmp_path):
    vf = {"s": {"hit": 0.5, "miss": 0.0}}
    path = save_vf_matrix_json(vf, str(tmp_path / "vf"))
    assert path.endswith(".json")
    loaded = load_vf_matrix_json(path)
    assert loaded == {"s": {"hit": 0.5}}


def test_save_strip_dir_merges_directions(tmp_path):
    vf = {"s": {"r_front": 0.25, "r_back": 0.5, "other": 0.1}}
    path = save_vf_matrix_json(vf, str(tmp_path / "vf.json"), strip_dir=True)
    data = json.loads(open(path).read())
    assert data == {"s": {"r": 0.75, "other": 0.1}}


def test_mesh_roundtrip(tmp_path):
    V = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32)
    F = np.array([[0, 1, 2]], dtype=np.int32)
    path = save_meshes_json([("tri", V, F)], str(tmp_path / "meshes"))
    loaded = load_meshes_json(path)
    assert len(loaded) == 1
    name, V2, F2 = loaded[0]
    assert name == "tri"
    np.testing.assert_array_equal(V2, V)
    np.testing.assert_array_equal(F2, F)
    assert V2.dtype == np.float32 and F2.dtype == np.int32


def test_mesh_save_validates(tmp_path):
    with pytest.raises(TypeError):
        save_meshes_json("nope", str(tmp_path / "x"))
    with pytest.raises(TypeError):
        save_meshes_json([("", np.zeros((3, 3)), np.zeros((1, 3), np.int32))], str(tmp_path / "x"))
    with pytest.raises(ValueError):
        save_meshes_json([("m", np.zeros((3, 2)), np.zeros((1, 3), np.int32))], str(tmp_path / "x"))


def test_load_missing_file():
    with pytest.raises(FileNotFoundError):
        load_vf_matrix_json("/nonexistent/file.json")
    with pytest.raises(FileNotFoundError):
        load_meshes_json("/nonexistent/file.json")


def test_stream_writer_matches_save(tmp_path):
    """A streamed matrix loads back equal to save_vf_matrix_json's output,
    including zero pruning and strip_dir folding."""
    from raystrack_tpu.io import VFMatrixStreamWriter

    vf = {
        "a": {"b_front": 0.25, "b_back": 0.05, "c_front": 0.0},
        "b": {"a_front": 0.5},
        "empty": {},
    }
    for strip_dir in (False, True):
        ref_path = save_vf_matrix_json(
            vf, str(tmp_path / f"ref_{strip_dir}"), strip_dir=strip_dir
        )
        with VFMatrixStreamWriter(
            str(tmp_path / f"stream_{strip_dir}"), strip_dir=strip_dir
        ) as w:
            for sender, row in vf.items():
                w.write_row(sender, row)
        streamed = load_vf_matrix_json(str(tmp_path / f"stream_{strip_dir}.json"))
        assert streamed == load_vf_matrix_json(ref_path)


def test_stream_writer_rejects_duplicates_and_bad_rows(tmp_path):
    from raystrack_tpu.io import VFMatrixStreamWriter

    with VFMatrixStreamWriter(str(tmp_path / "vf")) as w:
        w.write_row("a", {"b": 0.5})
        with pytest.raises(ValueError, match="duplicate"):
            w.write_row("a", {"c": 0.1})
        with pytest.raises(TypeError):
            w.write_row("c", {"d": "not a number"})
        w.write_row("c", {"d": 0.1})
    assert load_vf_matrix_json(str(tmp_path / "vf.json")) == {
        "a": {"b": 0.5}, "c": {"d": 0.1},
    }


def test_stream_writer_abort_leaves_no_output(tmp_path):
    from raystrack_tpu.io import VFMatrixStreamWriter

    target = tmp_path / "partial.json"
    try:
        with VFMatrixStreamWriter(str(target)) as w:
            w.write_row("a", {"b": 0.5})
            raise RuntimeError("interrupted")
    except RuntimeError:
        pass
    assert not target.exists()
    assert not list(tmp_path.glob("*.tmp"))


def test_stream_writer_empty_matrix(tmp_path):
    from raystrack_tpu.io import VFMatrixStreamWriter

    with VFMatrixStreamWriter(str(tmp_path / "empty")) as w:
        pass
    assert load_vf_matrix_json(str(tmp_path / "empty.json")) == {}
