"""JSON persistence for view-factor matrices and mesh geometry.

Format parity with the reference (src/raystrack/io.py:23-238):

- VF matrix JSON: ``{sender: {receiver: value}}``, exact zeros dropped,
  optional ``strip_dir`` merging of ``_front``/``_back`` keys, sorted keys.
- Mesh JSON: ``{"meshes": [{"name", "vertices", "faces"}, ...]}`` with
  float32 vertices and int32 triangle faces.
- ``merge_vf_matrix`` deep-merges a list of VF dicts (later entries win only
  on overlapping receiver keys).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Tuple, Union

import numpy as np

from .utils.helpers import strip_direction

VFDict = Dict[str, Dict[str, float]]
VFInput = Union[VFDict, List[VFDict]]
MeshTuple = Tuple[str, np.ndarray, np.ndarray]
Meshes = List[MeshTuple]


def merge_vf_matrix(vf_matrix: VFInput) -> VFDict:
    """Normalize a dict or list of dicts into one ``{sender: {recv: v}}``.

    When a list is given, nested receiver maps for repeated senders are
    merged (not replaced); later entries overwrite earlier ones only for
    overlapping receiver keys.
    """
    if isinstance(vf_matrix, dict):
        return vf_matrix
    if isinstance(vf_matrix, list):
        merged: VFDict = {}
        for part in vf_matrix:
            if not isinstance(part, dict):
                raise TypeError("All elements of vf_matrix list must be dicts")
            for sender, receivers in part.items():
                merged.setdefault(sender, {}).update(receivers)
        return merged
    raise TypeError("vf_matrix must be a dict or list of dicts")


def _normalize_path(save_path: str) -> Path:
    path = Path(save_path)
    if path.suffix.lower() == "":
        path = path.with_suffix(".json")
    if path.parent and not path.parent.exists():
        path.parent.mkdir(parents=True, exist_ok=True)
    return path


def save_vf_matrix_json(vf_matrix: VFInput, save_path: str, *, strip_dir: bool = False) -> str:
    """Save a view-factor matrix to JSON; returns the resolved path.

    Receivers whose value is exactly ``0.0`` are omitted. With
    ``strip_dir=True``, direction suffixes are removed and same-base values
    are summed per sender row before serialization.
    """
    flat = merge_vf_matrix(vf_matrix)

    for sender, row in flat.items():
        if not isinstance(sender, str):
            raise TypeError("Sender keys must be strings")
        if not isinstance(row, dict):
            raise TypeError(f"Row for '{sender}' must be a dict mapping receiver->value")
        for recv, val in row.items():
            if not isinstance(recv, str):
                raise TypeError("Receiver keys must be strings")
            try:
                float(val)
            except Exception:
                raise TypeError(f"Value for '{sender}'->'{recv}' must be numeric")

    cleaned: VFDict = {}
    for sender, row in flat.items():
        pruned: Dict[str, float] = {}
        for key, value in row.items():
            value_f = float(value)
            if value_f == 0.0:
                continue
            out_key = strip_direction(key) if strip_dir else key
            pruned[out_key] = pruned.get(out_key, 0.0) + value_f
        cleaned[sender] = pruned

    path = _normalize_path(save_path)
    with path.open("w", encoding="utf-8") as fh:
        json.dump(cleaned, fh, ensure_ascii=False, indent=2, sort_keys=True)
    return str(path.resolve())


def load_vf_matrix_json(load_path: str) -> VFDict:
    """Load a view-factor matrix JSON file into ``{sender: {recv: float}}``."""
    path = Path(load_path)
    if not path.exists():
        raise FileNotFoundError(f"File not found: {load_path}")

    with path.open("r", encoding="utf-8") as fh:
        data = json.load(fh)
    if not isinstance(data, dict):
        raise TypeError("Loaded JSON must be a dict of dicts")

    out: VFDict = {}
    for sender, row in data.items():
        if not isinstance(sender, str) or not isinstance(row, dict):
            raise TypeError("Invalid structure: expected {str: {str: number}}")
        new_row: Dict[str, float] = {}
        for recv, val in row.items():
            if not isinstance(recv, str):
                raise TypeError("Receiver keys must be strings")
            try:
                new_row[recv] = float(val)
            except Exception:
                raise TypeError(f"Value for '{sender}'->'{recv}' must be numeric")
        out[sender] = new_row
    return out


def save_meshes_json(meshes: Meshes, save_path: str) -> str:
    """Save ``[(name, V, F), ...]`` meshes to JSON; returns the resolved path."""
    if not isinstance(meshes, list):
        raise TypeError("meshes must be a list of (name, V, F) tuples")

    payload = {"meshes": []}
    for item in meshes:
        if not (isinstance(item, tuple) and len(item) == 3):
            raise TypeError("Each mesh must be a (name, V, F) tuple")
        name, V, F = item
        if not isinstance(name, str) or name.strip() == "":
            raise TypeError("Mesh name must be a non-empty string")
        V = np.asarray(V, dtype=np.float32)
        F = np.asarray(F, dtype=np.int32)
        if V.ndim != 2 or V.shape[1] != 3:
            raise ValueError(f"Vertices for '{name}' must have shape (N,3)")
        if F.ndim != 2 or F.shape[1] != 3:
            raise ValueError(f"Faces for '{name}' must have shape (M,3) of triangles")
        payload["meshes"].append(
            {"name": name, "vertices": V.tolist(), "faces": F.tolist()}
        )

    path = _normalize_path(save_path)
    with path.open("w", encoding="utf-8") as fh:
        json.dump(payload, fh, ensure_ascii=False, indent=2)
    return str(path.resolve())


def load_meshes_json(load_path: str) -> Meshes:
    """Load meshes saved by :func:`save_meshes_json`.

    Returns ``[(name, V, F), ...]`` with float32 vertices, int32 faces.
    """
    path = Path(load_path)
    if not path.exists():
        raise FileNotFoundError(f"File not found: {load_path}")

    with path.open("r", encoding="utf-8") as fh:
        data = json.load(fh)
    if not isinstance(data, dict) or "meshes" not in data:
        raise TypeError("Invalid mesh JSON: expected an object with 'meshes' list")
    meshes_raw = data["meshes"]
    if not isinstance(meshes_raw, list):
        raise TypeError("'meshes' must be a list")

    out: Meshes = []
    for i, entry in enumerate(meshes_raw):
        if not isinstance(entry, dict):
            raise TypeError("Each entry in 'meshes' must be an object")
        name = entry.get("name")
        if not isinstance(name, str) or name.strip() == "":
            raise TypeError(f"Entry {i}: 'name' must be a non-empty string")
        V = np.asarray(entry.get("vertices"), dtype=np.float32)
        F = np.asarray(entry.get("faces"), dtype=np.int32)
        if V.ndim != 2 or V.shape[1] != 3:
            raise ValueError(f"Entry {i} ('{name}'): vertices must have shape (N,3)")
        if F.ndim != 2 or F.shape[1] != 3:
            raise ValueError(f"Entry {i} ('{name}'): faces must have shape (M,3)")
        out.append((name, V, F))
    return out


__all__ = [
    "merge_vf_matrix",
    "save_vf_matrix_json",
    "load_vf_matrix_json",
    "save_meshes_json",
    "load_meshes_json",
]
