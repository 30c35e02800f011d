#!/usr/bin/env python3
"""ex06: production-scale scene — view factors in a procedural city block.

Builds an N x N grid of box buildings with varied heights over a ground
plane (thousands of triangles, heavy occlusion) and computes, for a street-
level facade panel and for the ground:

- the view-factor row against every other surface (reciprocity off: the
  emitter is traced against the full city), and
- the merged sky view factor.

At this triangle count the solver runs the fused Pallas sweep with Morton
tile culling; the whole solve is a handful of device dispatches.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

GRID = 5  # GRID x GRID buildings
LOT = 20.0  # lot pitch (m)
STREET = 8.0  # street width between buildings


def _quad(p0, p1, p2, p3, flip=False):
    V = np.asarray([p0, p1, p2, p3], dtype=np.float32)
    F = np.asarray([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    if flip:
        F = F[:, [0, 2, 1]].copy()
    return V, F


def _box(name, x0, y0, w, d, h):
    """Five outward-facing faces of a building (no floor)."""
    x1, y1 = x0 + w, y0 + d
    faces = [
        (f"{name}_south", _quad((x0, y0, 0), (x1, y0, 0), (x1, y0, h), (x0, y0, h))),
        (f"{name}_north", _quad((x0, y1, 0), (x1, y1, 0), (x1, y1, h), (x0, y1, h), flip=True)),
        (f"{name}_west", _quad((x0, y0, 0), (x0, y1, 0), (x0, y1, h), (x0, y0, h), flip=True)),
        (f"{name}_east", _quad((x1, y0, 0), (x1, y1, 0), (x1, y1, h), (x1, y0, h))),
        (f"{name}_roof", _quad((x0, y0, h), (x1, y0, h), (x1, y1, h), (x0, y1, h))),
    ]
    return [(n, V, F) for n, (V, F) in faces]


def build_city(grid: int = GRID):
    rng = np.random.default_rng(42)
    meshes = []
    size = grid * LOT
    for i in range(grid):
        for j in range(grid):
            x0 = i * LOT + STREET / 2
            y0 = j * LOT + STREET / 2
            w = d = LOT - STREET
            # quantized story heights: same-shape facades share solver
            # dispatches (the grouped emitter scheduler batches them)
            h = float(rng.choice([12.0, 20.0, 28.0, 36.0]))
            meshes += _box(f"b{i}{j}", x0, y0, w, d, h)
    V, F = _quad((0, 0, 0), (size, 0, 0), (size, size, 0), (0, size, 0))
    meshes.append(("ground", V, F))
    return meshes


def main():
    from raystrack_tpu import MatrixParams, SkyParams, view_factor_to_tregenza_sky

    meshes = build_city()
    n_tris = sum(F.shape[0] for _, _, F in meshes)
    print(f"City: {len(meshes)} surfaces, {n_tris} triangles")

    # street-level facade of the center building: solve just this emitter's
    # row against the whole city via the partition API
    from raystrack_tpu.parallel.distribute import view_factor_matrix_partition

    center = GRID // 2
    target = f"b{center}{center}_south"
    target_idx = next(i for i, m in enumerate(meshes) if m[0] == target)

    params = MatrixParams(
        samples=4, rays=256, seed=5, bvh="auto", device="auto",
        max_iters=40, min_iters=10, tol=5e-4, reciprocity=False,
    )
    t0 = time.time()
    row = view_factor_matrix_partition(
        meshes, params, n_parts=len(meshes), part=target_idx
    )[target]
    t_matrix = time.time() - t0

    top = sorted(row.items(), key=lambda kv: -kv[1])[:8]
    print(f"\n[{target}] row sum {sum(row.values()):.4f} "
          f"({len(row)} visible surfaces, {t_matrix:.1f}s)")
    for key, value in top:
        print(f"  {key:24s} {value:.4f}")

    sky_params = SkyParams(
        samples=4, rays=256, seed=5, bvh="auto", device="auto",
        max_iters=40, min_iters=10, tol=5e-4,
    )
    t0 = time.time()
    sky = view_factor_to_tregenza_sky(meshes, params=sky_params)
    t_sky = time.time() - t0
    print(f"\nSky view factors ({t_sky:.1f}s for all {len(meshes)} emitters):")
    print(f"  {target:24s} {sky[target]['Sky']:.4f}  (street canyon)")
    print(f"  {'ground':24s} {sky['ground']['Sky']:.4f}")
    roof = f"b{center}{center}_roof"
    print(f"  {roof:24s} {sky[roof]['Sky']:.4f}  (unobstructed roof)")


if __name__ == "__main__":
    main()
