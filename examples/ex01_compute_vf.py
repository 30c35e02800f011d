#!/usr/bin/env python3
"""ex01: compute the view-factor matrix for the street canyon and save it."""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from examples.ex00_street_canyon_geometry import build_street_canyon
from raystrack_tpu import MatrixParams, save_vf_matrix_json, view_factor_matrix


def main(*, out_dir: str | None = None, **overrides):
    """Solve the canyon matrix and save it.

    ``overrides`` feed straight into MatrixParams (CI runs this end-to-end
    with tiny sampling); ``out_dir`` redirects the output JSON.
    """
    meshes = build_street_canyon()
    config = dict(
        samples=16,
        rays=256,
        seed=7,
        bvh="auto",
        device="auto",
        max_iters=200,
        tol=1e-4,
        tol_mode="stderr",
        min_iters=10,
        reciprocity=True,
    )
    config.update(overrides)
    vf = view_factor_matrix(meshes, params=MatrixParams(**config))

    for name, _, _ in meshes:
        row = vf.get(name, {})
        print(f"{name}: {len(row)} receivers, row sum = {sum(row.values()):.4f}")

    out = Path(out_dir or Path(__file__).resolve().parent) / "vf_matrix.json"
    path = save_vf_matrix_json(vf, str(out))
    print(f"Saved view-factor matrix to: {path}")
    return path


if __name__ == "__main__":
    main()
