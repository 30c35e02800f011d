#!/usr/bin/env python3
"""100M-triangle occluded-city demonstration (documented, non-bench-default).

The two-level distance gate's range claim (~1.07B triangles at default
widths, config.py GATE_MAX_GROUP) was untested past 16.7M. This script runs
the gated Pallas sweep on a 1e8-triangle occluded city — the same generator
as bench.py's city curve, vectorized — and reports rays/s plus the hit
checksum. No brute-force anchor: at the measured 10M brute rate (~6.8k
rays/s) a brute 1e8 anchor would take >3 hours of chip time, so this point
is a RANGE demonstration, not a speedup claim; hit-count honesty at this
scale is covered by the committed 1e7 calibation and the bitwise Pallas==XLA
kernel tests.

Scale notes: the streamed operand pack is 24 rows x 1e8 f32 ≈ 9.6 GB of
HBM (fits v5e's 16 GB); host-side Morton packing of 1e8 triangles takes a
few minutes single-core.

Run: python benchmarks/city_100m.py [--n 100000000] [--reps 2]
Committed output: docs/measurements/city_100m_r05.txt
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402
from raystrack_tpu.prepared import PreparedSolver  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    t0 = time.monotonic()
    meshes = bench._city(args.n)
    n_tri = sum(len(F) for _, _, F in meshes)
    print(f"# scene generated: {n_tri:,} tris in "
          f"{time.monotonic() - t0:.1f}s", flush=True)

    t0 = time.monotonic()
    ps = PreparedSolver(meshes)
    run = lambda seed: bench._run_chunk(ps, accel=True, seed=seed, chunk=1,
                                        samples=1, rays=1)
    out, em, scene = run(0)
    hits = int(np.asarray(out["counts_f"]).sum()
               + np.asarray(out["counts_b"]).sum())
    print(f"# packed + warm dispatch in {time.monotonic() - t0:.1f}s; "
          f"hits(front+back) = {hits} of {em.n_rays_once} rays", flush=True)

    times = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        bench._force(run(rep + 1)[0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    result = {
        "n_tri": n_tri,
        "rays_per_dispatch": em.n_rays_pad,
        "accel_rays_per_sec": round(em.n_rays_pad / best),
        "accel_rays_per_sec_valid": round(em.n_rays_once / best),
        "dispatch_s": round(best, 3),
        "hits_checksum": hits,
        "n_tiles": scene.v0.shape[0] // scene.tri_tile,
        "device": __import__("jax").devices()[0].device_kind,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
