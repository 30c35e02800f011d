#!/usr/bin/env python3
"""Head-to-head: TPU-native gated sweep vs the reference engine's BVH path.

The reference's accelerated path is a numba-compiled median-split BVH
traversal on CPU cores (reference: src/raystrack/utils/bvh.py:14-72,
cpu_trace.py:120-277). numba is not installed on the bench host, so the
baseline here is benchmarks/ref_bvh_baseline.cpp — the same algorithm
(median split on the longest centroid axis, leaf 8, near-child-first stack
traversal pruned by the running nearest hit, Möller–Trumbore with the
reference's epsilons) compiled with g++ -O3 -ffast-math, threaded over all
host cores. Compiled C++ is at least as fast as the numba kernels it
mirrors, so the baseline is generous to the reference.

Equal work, equal accounting:
- Both engines trace the IDENTICAL ray set: the rays are materialized from
  the TPU bench's own raygen (same seed, same Cranley–Patterson rows, same
  Halton tables) and handed to the C++ binary; the TPU side times the
  bench's fused dispatch (raygen + gated sweep + histograms — raygen is
  free for the baseline, again generous to it).
- The hit checksum (front-facing nearest hits on receiver surfaces) is
  computed by both engines and compared; a mismatch beyond float-formulation
  noise fails the run.

Writes benchmarks/head_to_head_results.json and prints a markdown table.

Usage: python benchmarks/head_to_head.py [--sizes 10000,100000,...]
       [--threads N] (default: all host cores)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402  (repo-root bench utilities)
from raystrack_tpu.ops.trace import generate_rays  # noqa: E402
from raystrack_tpu.prepared import PreparedSolver  # noqa: E402
from raystrack_tpu.solver import _cp_rows  # noqa: E402

BIN = ROOT / "benchmarks" / "ref_bvh_baseline"
SRC = ROOT / "benchmarks" / "ref_bvh_baseline.cpp"


def ensure_binary() -> None:
    if BIN.exists() and BIN.stat().st_mtime >= SRC.stat().st_mtime:
        return
    cmd = ["g++", "-O3", "-march=native", "-ffast-math", "-funroll-loops",
           "-std=c++17", "-pthread", "-o", str(BIN), str(SRC)]
    subprocess.run(cmd, check=True)


def materialize_rays(em, chunk: int, seed: int) -> tuple:
    """The exact ray set the TPU dispatch traces for this seed/chunk."""
    cp = _cp_rows(seed, 0, 0, chunk).astype(np.float32)
    tables = (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1,
              em.h_r2)
    geom = (em.cdf, em.tri_a, em.tri_e1, em.tri_e2, em.tri_u, em.tri_v,
            em.tri_n, em.tri_eps)
    origins, dirs = [], []
    for itr in range(chunk):
        o, d = generate_rays(tables, geom, cp[itr])
        origins.append(np.asarray(o)[: em.n_rays_once])
        dirs.append(np.asarray(d)[: em.n_rays_once])
    return (np.concatenate(origins).astype(np.float32),
            np.concatenate(dirs).astype(np.float32))


def scene_arrays(meshes) -> tuple:
    """Raw triangle arrays (reference layout: v0/e1/e2/norm/sid)."""
    v0s, e1s, e2s, sids = [], [], [], []
    for s, (_, V, F) in enumerate(meshes):
        a = V[F[:, 0]].astype(np.float32)
        b = V[F[:, 1]].astype(np.float32)
        c = V[F[:, 2]].astype(np.float32)
        v0s.append(a)
        e1s.append(b - a)
        e2s.append(c - a)
        sids.append(np.full(len(F), s, np.int32))
    v0 = np.concatenate(v0s)
    e1 = np.concatenate(e1s)
    e2 = np.concatenate(e2s)
    norm = np.cross(e1, e2).astype(np.float32)
    return v0, e1, e2, norm, np.concatenate(sids)


def write_scene_bin(path: Path, meshes, orig, dirs,
                    surf_active, emit_sid: int, min_sid: int) -> int:
    v0, e1, e2, norm, sid = scene_arrays(meshes)
    with open(path, "wb") as f:
        np.int64(len(sid)).tofile(f)
        np.int64(len(orig)).tofile(f)
        np.int32(len(surf_active)).tofile(f)
        np.int32(emit_sid).tofile(f)
        np.int32(min_sid).tofile(f)
        np.asarray(surf_active, np.int32).tofile(f)
        v0.tofile(f)
        e1.tofile(f)
        e2.tofile(f)
        norm.tofile(f)
        sid.tofile(f)
        np.ascontiguousarray(orig).tofile(f)
        np.ascontiguousarray(dirs).tofile(f)
    return len(sid)


def tpu_point(ps: PreparedSolver, chunk: int, rays: int, reps: int,
              seed: int):
    """Fused gated-dispatch timing + hit checksum, as bench._city_point."""
    run = lambda s: bench._run_chunk(ps, accel=True, seed=s, chunk=chunk,
                                     samples=1, rays=rays)
    out, em, _ = run(seed)
    # Checksum = ALL nearest hits (front + back): the city's box faces mostly
    # present back faces to ground rays, so counts_f alone is a degenerate
    # (near-zero) check here.
    hits = int(np.asarray(out["counts_f"]).sum()
               + np.asarray(out["counts_b"]).sum())
    bench._force(out)  # hard sync (warmup)
    times = []
    for rep in range(reps):
        t0 = time.perf_counter()
        bench._force(run(seed + 1 + rep)[0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    return {
        "rays_per_sec": round(chunk * em.n_rays_pad / best),
        "rays_per_sec_valid": round(chunk * em.n_rays_once / best),
        "hits": hits,
        "n_rays_valid": chunk * em.n_rays_once,
        "pad_frac": round(1 - em.n_rays_once / em.n_rays_pad, 4),
    }, em


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,100000,1000000,10000000")
    ap.add_argument("--threads", type=int, default=0,
                    help="baseline threads (0 = all host cores)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    threads = args.threads or os.cpu_count() or 1

    ensure_binary()
    import jax

    device = str(jax.devices()[0])
    results = {"device_tpu": device, "baseline_threads": threads,
               "points": {}}
    for n_tri in sizes:
        big = n_tri >= 10_000_000
        chunk, rays, reps = (1, 1, 2) if big else (2, 2, 3)
        meshes = bench._city(n_tri)
        ps = PreparedSolver(meshes)

        tpu, em = tpu_point(ps, chunk, rays, reps, args.seed)
        orig, dirs = materialize_rays(em, chunk, args.seed)
        assert len(orig) == tpu["n_rays_valid"]

        n_surf = len(meshes)
        surf_active = np.zeros(n_surf, np.int32)
        surf_active[1:] = 1  # bench convention: all but the emitter receive
        with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as tf:
            scene_path = Path(tf.name)
        try:
            write_scene_bin(scene_path, meshes, orig, dirs, surf_active,
                            emit_sid=0, min_sid=0)
            t0 = time.monotonic()
            proc = subprocess.run(
                [str(BIN), str(scene_path), str(threads), str(reps)],
                capture_output=True, text=True, check=True)
            ref = json.loads(proc.stdout.strip())
            ref["wall_s"] = round(time.monotonic() - t0, 1)
        finally:
            scene_path.unlink(missing_ok=True)

        # Hit accounting must agree. The two engines use different (exact
        # vs fastmath) float formulations of the same intersection math, so
        # a handful of edge rays may flip; anything beyond 0.1% is a bug.
        ref_hits = ref["hits_front"] + ref["hits_back"]
        diff = abs(ref_hits - tpu["hits"])
        rel = diff / max(tpu["hits"], 1)
        assert rel < 1e-3, (
            f"hit accounting diverged at {n_tri}: "
            f"tpu={tpu['hits']} ref={ref_hits}")

        point = {
            "tpu_rays_per_sec": tpu["rays_per_sec"],
            "tpu_rays_per_sec_valid": tpu["rays_per_sec_valid"],
            "ref_bvh_rays_per_sec": round(ref["rays_per_sec"]),
            "ref_bvh_rays_per_sec_per_core": round(
                ref["rays_per_sec"] / ref["threads"]),
            "ref_threads": ref["threads"],
            "ref_build_s": ref["build_s"],
            "hits_tpu": tpu["hits"],
            "hits_ref": ref_hits,
            "hits_rel_diff": round(rel, 6),
            "n_rays": tpu["n_rays_valid"],
            "tpu_vs_ref_per_core": round(
                tpu["rays_per_sec_valid"]
                / (ref["rays_per_sec"] / ref["threads"]), 2),
            "tpu_vs_ref_total": round(
                tpu["rays_per_sec_valid"] / ref["rays_per_sec"], 2),
        }
        results["points"][str(n_tri)] = point
        print(f"# {n_tri}: {json.dumps(point)}", flush=True)

    out_path = ROOT / "benchmarks" / "head_to_head_results.json"
    out_path.write_text(json.dumps(results, indent=2) + "\n",
                        encoding="utf-8")
    print(f"\nwritten: {out_path}\n")
    print("| triangles | TPU gated sweep (rays/s) | ref BVH total (rays/s) "
          f"| ref BVH per-core | TPU / ref-core | TPU / ref-total "
          f"({threads} cores) |")
    print("|---|---|---|---|---|---|")
    for n, p in results["points"].items():
        print(f"| {int(n):,} | {p['tpu_rays_per_sec_valid']:,} "
              f"| {p['ref_bvh_rays_per_sec']:,} "
              f"| {p['ref_bvh_rays_per_sec_per_core']:,} "
              f"| {p['tpu_vs_ref_per_core']}x | {p['tpu_vs_ref_total']}x |")


if __name__ == "__main__":
    main()
