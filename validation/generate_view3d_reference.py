#!/usr/bin/env python3
"""Regenerate the NIST View3D cross-check fixture for the canyon scene.

The committed ``view3d_reference/canyon_view3d_raw.json`` is per-face output
of the external NIST View3D tool for the street-canyon scene (the reference
repo generated it offline the same way: reference
validation/generate_canyon_view3d_reference.py:20-60 drives a local View3D
checkout). This script makes that fixture reproducible from this repo alone
plus a public View3D binary:

1. ``write_vs3`` emits the View3D 3.x input file for any mesh list — one
   triangular surface per face, named ``{mesh}_{k}`` (1-based face index),
   with the same control settings the committed fixture was produced under
   (``encl=0 list=1 eps=0.0001 emit=0 out=0``, emissivity 0.999).
2. If a View3D executable is available (``--view3d-bin`` or ``view3d`` on
   PATH), it is run on the generated input and its text output is parsed
   into ``canyon_view3d_raw.json`` (per-face rows) and
   ``canyon_view3d_base.json`` (area-weighted per-mesh rows).

Without the binary the script still writes ``canyon_view3d.vs3`` and exits 0
— the input half of the fixture is always regenerable; run View3D elsewhere
and pass the output back through ``--parse <out.txt>``.
"""
from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from common import Mesh, aggregate_per_face_rows, write_json  # noqa: E402
from examples.ex00_street_canyon_geometry import build_street_canyon  # noqa: E402

REFERENCE_ROOT = Path(__file__).resolve().parent / "view3d_reference"


def _fmt(x: float) -> str:
    """Shortest exact-ish decimal: integers print bare (matches the fixture
    file's style; View3D's parser accepts either)."""
    f = float(x)
    return str(int(f)) if f == int(f) else repr(f)


def write_vs3(meshes: List[Mesh], path: Path, *, title: str,
              emissivity: float = 0.999) -> Path:
    """Emit a View3D 3.x ``.vs3`` input: vertex list + one triangle surface
    per mesh face. Surface records are ``s # v1 v2 v3 v4 base cmb emit name``
    with ``v4=0`` marking a triangle; ``base``/``cmb`` stay 0 (no subsurfaces
    or combined surfaces in these scenes)."""
    lines = [
        f"T {title}",
        "C encl=0 list=1 eps=0.0001 emit=0 out=0",
        "F 3",
        "! # x y z",
    ]
    surf_lines = ["! # v1 v2 v3 base cmb emit Name"]
    v_off = 0
    s_idx = 0
    for name, V, F in meshes:
        for v in np.asarray(V, dtype=np.float64):
            v_off += 1
            lines.append(f"v {v_off} {_fmt(v[0])} {_fmt(v[1])} {_fmt(v[2])}")
        base = v_off - len(V)
        for k, f in enumerate(np.asarray(F, dtype=np.int64)):
            s_idx += 1
            surf_lines.append(
                f"s {s_idx} {base + f[0] + 1} {base + f[1] + 1} "
                f"{base + f[2] + 1} 0 0 0 {emissivity} {name}_{k + 1}"
            )
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(lines + surf_lines) + "\n", encoding="utf-8")
    return path


def face_names(meshes: List[Mesh]) -> List[str]:
    return [
        f"{name}_{k + 1}"
        for name, _, F in meshes
        for k in range(len(F))
    ]


def parse_view3d_output(path: Path, meshes: List[Mesh]) -> Tuple[
    Dict[str, Dict[str, float]], np.ndarray
]:
    """Parse View3D's ``out=0`` text output into per-face VF rows.

    Layout: a ``View3D <version> <format> <encl> <didemit> <nSrf>`` header
    line, then nSrf areas, nSrf x nSrf view factors and nSrf emissivities as
    whitespace-separated floats (row wrapping is irrelevant — the values are
    consumed as one stream). Returns ``({face: {face: F}}, areas)``.
    """
    text = path.read_text(encoding="utf-8").splitlines()
    header = text[0].split()
    if not header or header[0].lower() != "view3d":
        raise ValueError(f"{path} is not a View3D output file: {text[0]!r}")
    n_srf = int(header[-1])
    names = face_names(meshes)
    if len(names) != n_srf:
        raise ValueError(
            f"surface count mismatch: output has {n_srf}, meshes have "
            f"{len(names)} faces"
        )
    vals = np.array(
        [float(tok) for line in text[1:] for tok in line.split()],
        dtype=np.float64,
    )
    need = n_srf + n_srf * n_srf  # areas + matrix (emissivities may follow)
    if vals.size < need:
        raise ValueError(f"{path}: expected >= {need} values, got {vals.size}")
    areas = vals[:n_srf]
    F = vals[n_srf : n_srf + n_srf * n_srf].reshape(n_srf, n_srf)
    raw = {
        names[i]: {names[j]: float(F[i, j]) for j in range(n_srf)}
        for i in range(n_srf)
    }
    return raw, areas


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--view3d-bin", default=None,
                    help="path to the View3D executable (default: PATH)")
    ap.add_argument("--parse", default=None,
                    help="parse an existing View3D output .txt instead of "
                         "running the binary")
    args = ap.parse_args()

    meshes = build_street_canyon()
    REFERENCE_ROOT.mkdir(parents=True, exist_ok=True)
    vs3 = write_vs3(meshes, REFERENCE_ROOT / "canyon_view3d.vs3",
                    title="raystrack canyon validation reference")
    print(f"wrote {vs3}")

    out_txt = Path(args.parse) if args.parse else REFERENCE_ROOT / "canyon_view3d.txt"
    if args.parse is None:
        binary = args.view3d_bin or shutil.which("view3d")
        if binary is None:
            print("no View3D binary found; stopping after the .vs3 "
                  "(run View3D elsewhere, then re-run with --parse out.txt)")
            return 0
        subprocess.run([binary, str(vs3), str(out_txt)], check=True,
                       cwd=REFERENCE_ROOT)

    raw, _ = parse_view3d_output(out_txt, meshes)
    write_json(REFERENCE_ROOT / "canyon_view3d_raw.json", raw)
    write_json(REFERENCE_ROOT / "canyon_view3d_base.json",
               aggregate_per_face_rows(raw, meshes))
    print(f"wrote {REFERENCE_ROOT / 'canyon_view3d_raw.json'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
