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
  — brute force over the identical Morton-ordered triangles and the
  identical rays; hit counts asserted equal,
- plus a bounded full view_factor_matrix solve through the pipelined
  driver, proving the production API end to end at 1e8.

NOT a bench.py default: scene generation + prep + the 6.8 GB pack upload
take minutes, and the brute anchor is one ~60 s dispatch. Committed
output: docs/measurements/city_100m_r05.txt.

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

    def run(accel, seed):
        cp = _cp_rows(seed, 0, 0, 1).astype(np.float32)
        return trace_chunk(
            (scene.v0, scene.e1, scene.e2, scene.cross_e,
             scene.w_u, scene.w_v, scene.d0, scene.sid),
            (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1,
             em.h_r2),
            (em.cdf, em.tri_a, em.tri_e1, em.tri_e2,
             em.tri_u, em.tri_v, em.tri_n, em.tri_eps),
            cp, ext, np.int32(0), np.int32(0), np.int32(em.n_rays_once),
            None, scene.accel if accel else None, scene.tri_pack,
            ray_block=min(PALLAS_RAY_BLOCK, em.n_rays_pad),
            tri_tile=PALLAS_TRI_TILE,
            want_matrix=True, want_any=False, discrete=False,
            kernel="pallas",
        )

    force = lambda out: int(np.asarray(out["counts_f"]).sum())

    entry = {"n_tri": n_tri, "rays_per_dispatch": int(em.n_rays_pad)}
    hits = {}
    for accel, reps in ((True, 3), (False, 1)):
        label = "accel" if accel else "brute"
        t0 = time.monotonic()
        hits[accel] = force(run(accel, 0))  # compile + warmup
        log(f"{label}: warmup (compile) {time.monotonic() - t0:.1f}s, "
            f"hits={hits[accel]}")
        times = []
        for rep in range(reps):
            t0 = time.monotonic()
            force(run(accel, rep + 1))
            times.append(time.monotonic() - t0)
        entry[label] = round(em.n_rays_pad / min(times))
        log(f"{label}: {em.n_rays_pad:,} rays in {min(times):.2f}s best of "
            f"{times} -> {entry[label]:,} rays/s")
    assert hits[True] == hits[False], (
        f"gate changed hit counts: {hits[True]} != {hits[False]}")
    entry["speedup"] = round(entry["accel"] / entry["brute"], 2)
    entry["hits_equal"] = hits[True]

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
