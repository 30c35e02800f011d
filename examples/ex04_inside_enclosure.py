#!/usr/bin/env python3
"""ex04: inside-enclosure view factors with ``flip_faces=True``.

A closed unit cube built with OUTWARD normals; flipping emitter winding
during sampling makes every face emit inward, so each row of the interior
view-factor matrix must sum to ~1 (up to Monte-Carlo noise and seam-grazing
rays).
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from raystrack_tpu import MatrixParams, save_vf_matrix_json, view_factor_matrix


def make_box_unit_cube():
    """Six quads forming the closed unit cube [0,1]^3, outward normals."""

    def face(name, p0, p1, p2, p3, outward):
        V = np.array([p0, p1, p2, p3], dtype=np.float32)
        F = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
        n = np.cross(V[1] - V[0], V[2] - V[0])
        if np.dot(n, np.asarray(outward, np.float64)) < 0.0:
            F = F[:, [0, 2, 1]].copy()
        return name, V, F

    c = lambda x, y, z: (float(x), float(y), float(z))
    return [
        face("Bottom", c(0, 0, 0), c(1, 0, 0), c(1, 1, 0), c(0, 1, 0), (0, 0, -1)),
        face("Top", c(0, 0, 1), c(1, 0, 1), c(1, 1, 1), c(0, 1, 1), (0, 0, +1)),
        face("Front", c(0, 0, 0), c(1, 0, 0), c(1, 0, 1), c(0, 0, 1), (0, -1, 0)),
        face("Back", c(0, 1, 0), c(1, 1, 0), c(1, 1, 1), c(0, 1, 1), (0, +1, 0)),
        face("Left", c(0, 0, 0), c(0, 1, 0), c(0, 1, 1), c(0, 0, 1), (-1, 0, 0)),
        face("Right", c(1, 0, 0), c(1, 1, 0), c(1, 1, 1), c(1, 0, 1), (+1, 0, 0)),
    ]


def main():
    meshes = make_box_unit_cube()
    params = MatrixParams(
        samples=16,
        rays=128,
        seed=42,
        bvh="auto",
        device="auto",
        flip_faces=True,
        reciprocity=False,
        max_iters=1000,
        tol=1e-3,
        tol_mode="stderr",
        min_iters=10,
    )
    vf = view_factor_matrix(meshes, params=params)

    for name in vf:
        row = vf[name]
        print(f"{name}: receivers={len(row):2d}, sum={sum(row.values()):.6f}")

    out = Path(__file__).resolve().parent / "inside_vf_matrix.json"
    print("Saved:", save_vf_matrix_json(vf, str(out)))


if __name__ == "__main__":
    main()
