#!/usr/bin/env python3
"""ex05: reuse one PreparedSolver across solves that differ only by seed.

Prepared triangle buffers, Halton tables and device packs are built once;
each solve only regenerates its Cranley-Patterson offsets. The printed
mean|dF| table shows pure seed-to-seed Monte-Carlo scatter.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from examples.ex00_street_canyon_geometry import build_street_canyon
from raystrack_tpu import MatrixParams, PreparedSolver, view_factor_matrix

SEEDS = (1, 2, 3)


def solve(meshes, prepared, seed):
    params = MatrixParams(
        samples=8,
        rays=256,
        seed=seed,
        bvh="auto",
        device="auto",
        max_iters=100,
        tol=1e-4,
        tol_mode="stderr",
        min_iters=10,
        reciprocity=True,
    )
    t0 = time.time()
    vf = view_factor_matrix(meshes, params=params, prepared=prepared)
    return vf, time.time() - t0


def main():
    meshes = build_street_canyon()
    prepared = PreparedSolver(meshes)

    results = {}
    for seed in SEEDS:
        vf, seconds = solve(meshes, prepared, seed)
        results[seed] = vf
        print(f"seed={seed}: solved in {seconds:.2f}s (prepared state reused)")

    base = results[SEEDS[0]]
    print(f"\n{'Emitter':16s}" + "".join(f"  mean|d| vs seed {s:>2d}" for s in SEEDS[1:]))
    for name, _, _ in meshes:
        row0 = base.get(name, {})
        cells = []
        for seed in SEEDS[1:]:
            row = results[seed].get(name, {})
            keys = set(row0) | set(row)
            diffs = [abs(row0.get(k, 0.0) - row.get(k, 0.0)) for k in keys]
            cells.append(float(np.mean(diffs)) if diffs else 0.0)
        print(f"{name:16s}" + "".join(f"  {c:18.6f}" for c in cells))


if __name__ == "__main__":
    main()
