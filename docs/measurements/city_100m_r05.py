#!/usr/bin/env python3
"""100M-triangle demonstration on one TPU chip (round-5 roadmap item C).

The two-level distance gate's range claim (~1.07B triangles at default
widths, config.py GATE_MAX_TILES/GATE_MAX_GROUP) was measured only to
16.7M; this script runs the PRODUCTION path at 1e8 triangles:

- scene: the bench occluded-city family (bench._city, vectorized NumPy
  box assembly — the per-box Python loop made 1e8 impractical on host),
- prep: PreparedSolver slim pack-resident mode (prepared.pack_scene):
  ONE (24, Tpad) operand pack + sid on device (~9.4 GiB), no per-dispatch
  pack assembly — the full layout would peak ~17.6 GiB during a dispatch
  and OOM a 16 GiB chip,
- sweep: trace_chunk / Pallas HBM-streamed two-level-gated kernel with
  in-kernel code-row masks (trace_pallas code_bounds),
- honesty anchor: the SAME slim pack swept with the gate off (accel=None)
  — brute force over the identical Morton-ordered triangles and identical
  rays; hit counts asserted equal. The anchor runs on a 24-block ray
  SUBSET: a full-ray ungated dispatch at 1e8 is one ~75 s pallas_call,
  which the tunnel's TPU worker does not survive (measured: worker
  crash/restart mid-fetch); per-ray brute cost is ray-count-independent
  (every block loops every tile), so the subset rate IS the brute rate,
- plus a bounded full view_factor_matrix solve through the pipelined
  driver, proving the production API end to end at 1e8.

NOT a bench.py default: scene generation + prep + the 6.8 GB pack upload
take ~30 min through the tunnel. Committed output:
docs/measurements/city_100m_r05.txt.

Usage: python docs/measurements/city_100m_r05.py [n_tri]
       (pass e.g. 20000000 for a cheaper rehearsal)
"""
from __future__ import annotations

import importlib.util
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(ROOT))

from raystrack_tpu.solver import _ensure_compile_cache  # noqa: E402

_ensure_compile_cache()

import jax  # noqa: E402

from raystrack_tpu.config import PALLAS_RAY_BLOCK, PALLAS_TRI_TILE  # noqa: E402
from raystrack_tpu.ops.trace import trace_chunk  # noqa: E402
from raystrack_tpu.prepared import PreparedSolver  # noqa: E402
from raystrack_tpu.solver import _cp_rows  # noqa: E402

_spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> int:
    n_tri = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    # rehearsal sizes below the production threshold still exercise the
    # slim path (at 1e8 — the real demo — this is a no-op)
    from raystrack_tpu import config

    config.SLIM_PACK_MIN_TRIS = min(config.SLIM_PACK_MIN_TRIS, n_tri)
    log(f"backend={jax.default_backend()} device={jax.devices()[0]} "
        f"n_tri={n_tri:,}")

    t0 = time.monotonic()
    meshes = bench._city(n_tri)
    log(f"scene generated: {sum(m[2].shape[0] for m in meshes):,} tris "
        f"in {time.monotonic() - t0:.1f}s")

    ps = PreparedSolver(meshes)
    t0 = time.monotonic()
    scene = ps.get_scene_pack(use_accel=True)
    log(f"scene pack: slim={scene.slim} n_tri_pad={scene.n_tri_pad:,} "
        f"tile={scene.tri_tile} in {time.monotonic() - t0:.1f}s")
    assert scene.slim, "expected the slim pack-resident mode at this scale"

    t0 = time.monotonic()
    em = ps.get_emitter_pack(0, samples=1, rays=1, flip_faces=False)
    log(f"emitter pack: {em.n_rays_pad:,} rays/iter "
        f"in {time.monotonic() - t0:.1f}s")

    n_surf = len(meshes)
    ext = np.zeros(n_surf + 1, dtype=np.int32)
    ext[1:-1] = 1  # everything but the emitter is a receiver

    # The brute anchor sweeps a SUBSET of the ray set: a full-ray ungated
    # dispatch at 1e8 runs ~75 s of device time in one pallas_call, which
    # the tunnel's TPU worker does not survive (measured: worker crash;
    # the gated full-ray dispatch is ~6.4 s and fine). Hit-equality is
    # asserted gate-vs-brute on the identical subset; brute rays/s is the
    # subset's (per-ray cost of an ungated dense sweep is ray-count-
    # independent — every block loops every tile).
    ray_block = min(PALLAS_RAY_BLOCK, em.n_rays_pad)
    n_sub = min(em.n_rays_pad, 24 * ray_block)
    tables_full = (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v,
                   em.h_r1, em.h_r2)
    tables_sub = tuple(t[:n_sub] for t in tables_full)

    def run(accel, seed, tables, n_once):
        cp = _cp_rows(seed, 0, 0, 1).astype(np.float32)
        return trace_chunk(
            (scene.v0, scene.e1, scene.e2, scene.cross_e,
             scene.w_u, scene.w_v, scene.d0, scene.sid),
            tables,
            (em.cdf, em.tri_a, em.tri_e1, em.tri_e2,
             em.tri_u, em.tri_v, em.tri_n, em.tri_eps),
            cp, ext, np.int32(0), np.int32(0), np.int32(n_once),
            None, scene.accel if accel else None, scene.tri_pack,
            ray_block=ray_block,
            tri_tile=PALLAS_TRI_TILE,
            want_matrix=True, want_any=False, discrete=False,
            kernel="pallas",
        )

    force = lambda out: int(np.asarray(out["counts_f"]).sum())

    entry = {"n_tri": n_tri, "rays_per_dispatch": int(em.n_rays_pad),
             "brute_subset_rays": int(n_sub)}
    n_once = int(em.n_rays_once)
    cases = (
        ("accel", True, tables_full, n_once, 3),
        ("accel_sub", True, tables_sub, min(n_once, n_sub), 1),
        ("brute_sub", False, tables_sub, min(n_once, n_sub), 1),
    )
    hits, rates = {}, {}
    for label, accel, tables, once, reps in cases:
        n_rays = tables[0].shape[0]
        t0 = time.monotonic()
        hits[label] = force(run(accel, 0, tables, once))  # compile + warmup
        log(f"{label}: warmup (compile) {time.monotonic() - t0:.1f}s, "
            f"hits={hits[label]}")
        times = []
        for rep in range(reps):
            t0 = time.monotonic()
            force(run(accel, rep + 1, tables, once))
            times.append(time.monotonic() - t0)
        rates[label] = round(n_rays / min(times))
        log(f"{label}: {n_rays:,} rays in {min(times):.2f}s best of "
            f"{times} -> {rates[label]:,} rays/s")
    assert hits["accel_sub"] == hits["brute_sub"], (
        f"gate changed hit counts: {hits['accel_sub']} != {hits['brute_sub']}")
    entry["accel"] = rates["accel"]
    entry["brute"] = rates["brute_sub"]
    entry["speedup"] = round(entry["accel"] / entry["brute"], 2)
    entry["hits_full_accel"] = hits["accel"]
    entry["hits_equal_subset"] = hits["accel_sub"]

    # production driver end to end: a bounded matrix solve (the pipelined
    # per-emitter driver; convergence replay, reciprocity, progress lines)
    from raystrack_tpu import MatrixParams, view_factor_matrix

    mp = MatrixParams(samples=1, rays=1, seed=5, min_iters=2, max_iters=3,
                      bvh="builtin")
    t0 = time.monotonic()
    vf = view_factor_matrix(meshes, mp, prepared=ps)
    entry["solve_3iter_s"] = round(time.monotonic() - t0, 1)
    entry["solve_ground_to_city"] = round(
        sum(v for k, v in vf["ground"].items() if k.startswith("city")), 6)
    log(f"bounded solve: {entry['solve_3iter_s']}s, "
        f"F(ground->city)={entry['solve_ground_to_city']}")

    print(json.dumps(entry))
    return 0


if __name__ == "__main__":
    sys.exit(main())
