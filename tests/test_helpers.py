"""Reciprocity/row-sum enforcement invariants."""
import numpy as np

from raystrack_tpu.utils.helpers import (
    enforce_reciprocity_and_rowsum,
    enforce_reciprocity_only,
    grid_from_density,
    mesh_areas,
)


def _square(name, size, z):
    V = np.array(
        [[0, 0, z], [size, 0, z], [size, size, z], [0, size, z]], dtype=np.float32
    )
    F = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    return name, V, F


def _totals(row):
    out = {}
    for k, v in row.items():
        base = k[:-6] if k.endswith("_front") else (k[:-5] if k.endswith("_back") else k)
        out[base] = out.get(base, 0.0) + v
    return out


def test_grid_from_density():
    assert grid_from_density(1.0, 16) == 4
    assert grid_from_density(4.0, 16) == 8
    assert grid_from_density(0.0, 100) == 4
    assert grid_from_density(2.0, 32) == 8


def test_mesh_areas():
    meshes = [_square("a", 1.0, 0.0), _square("b", 2.0, 1.0)]
    np.testing.assert_allclose(mesh_areas(meshes), [1.0, 4.0])


def test_rowsum_enforcement_hits_targets_and_reciprocity():
    meshes = [_square("a", 1.0, 0.0), _square("b", 1.0, 1.0), _square("c", 1.0, 2.0)]
    result = {
        "a": {"b_front": 0.4, "c_front": 0.3},
        "b": {"a_front": 0.45, "c_front": 0.35},
        "c": {"a_front": 0.28, "b_front": 0.42},
    }
    enforce_reciprocity_and_rowsum(result, meshes, None)
    A = mesh_areas(meshes)
    names = ["a", "b", "c"]
    F = np.zeros((3, 3))
    for i, s in enumerate(names):
        for j, r in enumerate(names):
            F[i, j] = _totals(result[s]).get(r, 0.0)
    # rows sum to 1 and A_i F_ij == A_j F_ji
    np.testing.assert_allclose(F.sum(axis=1), 1.0, atol=1e-8)
    G = A[:, None] * F
    np.testing.assert_allclose(G, G.T, atol=1e-10)


def test_rowsum_enforcement_respects_custom_targets():
    meshes = [_square("a", 1.0, 0.0), _square("b", 1.0, 1.0)]
    result = {"a": {"b_front": 0.5}, "b": {"a_front": 0.5}}
    enforce_reciprocity_and_rowsum(result, meshes, None, row_targets=[0.25, 0.25])
    assert abs(sum(result["a"].values()) - 0.25) < 1e-8
    assert abs(sum(result["b"].values()) - 0.25) < 1e-8


def test_reciprocity_only_pairwise_average():
    meshes = [_square("a", 1.0, 0.0), _square("b", 2.0, 1.0)]  # areas 1 and 4
    result = {"a": {"b_front": 0.8}, "b": {"a_front": 0.1}}
    enforce_reciprocity_only(result, meshes)
    # g = (1*0.8 + 4*0.1)/2 = 0.6 -> F_ab = 0.6, F_ba = 0.15
    assert abs(result["a"]["b_front"] - 0.6) < 1e-12
    assert abs(result["b"]["a_front"] - 0.15) < 1e-12


def test_reciprocity_only_prunes_tiny_pairs():
    meshes = [_square("a", 1.0, 0.0), _square("b", 1.0, 1.0)]
    result = {"a": {"b_front": 1e-15}, "b": {}}
    enforce_reciprocity_only(result, meshes)
    assert result["a"] == {}
    assert result["b"] == {}


def test_front_back_split_preserved_proportionally():
    meshes = [_square("a", 1.0, 0.0), _square("b", 1.0, 1.0)]
    result = {"a": {"b_front": 0.3, "b_back": 0.1}, "b": {"a_front": 0.6}}
    enforce_reciprocity_only(result, meshes)
    # totals: g = (0.4 + 0.6)/2 = 0.5 each; a's 3:1 front/back split kept
    assert abs(result["a"]["b_front"] - 0.375) < 1e-12
    assert abs(result["a"]["b_back"] - 0.125) < 1e-12
    assert abs(result["b"]["a_front"] - 0.5) < 1e-12
