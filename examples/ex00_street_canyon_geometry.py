#!/usr/bin/env python3
"""ex00: build the street-canyon scene and save it as JSON.

Geometry (matching the reference example scene so the committed View3D
cross-check applies — reference: examples/ex00_street_canyon_geometry.py:68-102):

- two opposing facades, 8 m apart, each five stacked 10 m x 4 m story
  panels (20 m total height); the facade at x=-4 faces +X ("east_side_i"),
  the facade at x=+4 faces -X ("west_side_i"),
- a 10 m x 8 m road at z=0 facing up.

Axes: x East(+)/West(-), y North(+)/South(-), z Up(+).
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STORY_HEIGHT = 4.0
STORIES = 5
FACADE_WIDTH = 10.0
CANYON_GAP = 8.0


def _quad(corners, *, flip: bool):
    """(V, F) for a quad given 4 CCW corners; flip reverses the normal."""
    V = np.asarray(corners, dtype=np.float32)
    F = np.asarray([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    if flip:
        F = F[:, [0, 2, 1]].copy()
    return V, F


def facade_panel(x: float, z0: float, z1: float, *, faces_east: bool):
    """One story panel in the plane x=const spanning the facade width.

    The base winding (BL, BR, TR, TL walked with y increasing) has a +X
    normal; ``faces_east=False`` flips it to -X.
    """
    half = FACADE_WIDTH / 2.0
    corners = [
        (x, -half, z0),
        (x, +half, z0),
        (x, +half, z1),
        (x, -half, z1),
    ]
    return _quad(corners, flip=not faces_east)


def road_surface():
    """The ground plane between the facades, normal up."""
    half_w = FACADE_WIDTH / 2.0
    half_g = CANYON_GAP / 2.0
    corners = [
        (-half_g, -half_w, 0.0),
        (+half_g, -half_w, 0.0),
        (+half_g, +half_w, 0.0),
        (-half_g, +half_w, 0.0),
    ]
    return _quad(corners, flip=False)


def build_street_canyon():
    """11 meshes: east_side_0..4, west_side_0..4 (interleaved), road."""
    meshes = []
    for story in range(STORIES):
        z0, z1 = story * STORY_HEIGHT, (story + 1) * STORY_HEIGHT
        V, F = facade_panel(-CANYON_GAP / 2.0, z0, z1, faces_east=True)
        meshes.append((f"east_side_{story}", V, F))
        V, F = facade_panel(+CANYON_GAP / 2.0, z0, z1, faces_east=False)
        meshes.append((f"west_side_{story}", V, F))
    V, F = road_surface()
    meshes.append(("road", V, F))
    return meshes


def main():
    from raystrack_tpu.io import save_meshes_json

    meshes = build_street_canyon()
    out = Path(__file__).resolve().parent / "street_canyon.json"
    path = save_meshes_json(meshes, str(out))
    print(f"Saved street canyon geometry to: {path}")
    print(f"Meshes: {[name for name, _, _ in meshes]}")


if __name__ == "__main__":
    main()
