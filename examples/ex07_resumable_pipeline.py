#!/usr/bin/env python3
"""ex07: a production pipeline — external geometry, resumable solve, streaming output.

The shape of a real deployment:

1. geometry arrives as mesh FILES (here a binary PLY terrain tile and an
   OBJ building written by this script; swap in your own exports),
2. the matrix solve runs with ``checkpoint_dir=...`` so a preempted job
   resumes where it stopped — finished emitters replay from their
   checkpoint files, and emitters that were still converging resume
   mid-stream from their exact monitor-state snapshots,
3. the result streams to disk row by row (``VFMatrixStreamWriter``), so the
   output file never requires holding the whole matrix in memory.

Run it twice: the second run restores every emitter from the checkpoint
directory and only re-writes the output file.
"""
from __future__ import annotations

import struct
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def write_demo_ply(path: Path, *, n: int = 12, extent: float = 30.0) -> None:
    """A bumpy terrain tile as binary_little_endian PLY (n x n vertex grid)."""
    xs = np.linspace(-extent, extent, n, dtype=np.float32)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    zz = (0.6 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.float32)
    verts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    quads = [
        (i * n + j, (i + 1) * n + j, (i + 1) * n + j + 1, i * n + j + 1)
        for i in range(n - 1) for j in range(n - 1)
    ]
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(quads)}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    blob = header.encode("ascii")
    for v in verts:
        blob += struct.pack("<fff", *v)
    for q in quads:
        blob += struct.pack("<B", 4) + struct.pack("<4i", *q)
    path.write_bytes(blob)


def write_demo_obj(path: Path) -> None:
    """A two-tower OBJ with named objects (one mesh per tower face set)."""
    lines = []
    v_base = 0
    for name, (x0, y0) in (("tower_a", (-12.0, -8.0)), ("tower_b", (4.0, 2.0))):
        w, d, h = 8.0, 8.0, 18.0
        x1, y1 = x0 + w, y0 + d
        vs = [(x0, y0, 0.6), (x1, y0, 0.6), (x1, y1, 0.6), (x0, y1, 0.6),
              (x0, y0, h), (x1, y0, h), (x1, y1, h), (x0, y1, h)]
        lines += [f"v {x} {y} {z}" for x, y, z in vs]
        lines.append(f"o {name}")
        b = v_base + 1
        for a, c, e, f in ((0, 1, 5, 4), (1, 2, 6, 5), (2, 3, 7, 6),
                           (3, 0, 4, 7), (4, 5, 6, 7)):
            lines.append(f"f {b + a} {b + c} {b + e} {b + f}")
        v_base += 8
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")


def main(out_dir: str | None = None, *, samples: int = 4, rays: int = 64,
         max_iters: int = 20, min_iters: int = 5, tol: float = 1e-3) -> str:
    from raystrack_tpu import (
        MatrixParams,
        VFMatrixStreamWriter,
        load_meshes_obj,
        load_meshes_ply,
        view_factor_matrix,
    )

    if out_dir:
        out = Path(out_dir)
    else:
        # Scratch artifacts (meshes, checkpoints, streamed output) go to a
        # stable temp location, NOT the examples/ source dir — re-running
        # the example must not dirty the repo. Reusing the same directory
        # across runs keeps the "run it twice, second run resumes" demo.
        import tempfile

        out = Path(tempfile.gettempdir()) / "raystrack_tpu_ex07"
    out.mkdir(parents=True, exist_ok=True)

    ply_path = out / "terrain.ply"
    obj_path = out / "towers.obj"
    write_demo_ply(ply_path)
    write_demo_obj(obj_path)

    meshes = load_meshes_ply(str(ply_path), name="terrain")
    meshes += load_meshes_obj(str(obj_path))
    print(f"Scene: {len(meshes)} meshes, "
          f"{sum(F.shape[0] for _, _, F in meshes)} triangles")

    params = MatrixParams(samples=samples, rays=rays, seed=20,
                          max_iters=max_iters, min_iters=min_iters, tol=tol,
                          reciprocity=True)
    t0 = time.time()
    vf = view_factor_matrix(
        meshes, params=params, checkpoint_dir=str(out / "ckpt")
    )
    print(f"Solve (resumable): {time.time() - t0:0.2f}s")

    stream_path = out / "vf_streamed.json"
    with VFMatrixStreamWriter(str(stream_path)) as writer:
        for sender, row in vf.items():
            writer.write_row(sender, row)
    print(f"Streamed view-factor matrix to {stream_path}")
    return str(stream_path)


if __name__ == "__main__":
    main()
