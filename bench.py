#!/usr/bin/env python3
"""Headline benchmark: ray-triangle intersection throughput on one chip.

Prints ONE JSON line:
  {"metric": "ray_triangle_tests_per_sec", "value": N, "unit": "tests/s",
   "vs_baseline": N / 1e9, ...}

The baseline north star is 1e9 ray-triangle tests/sec/chip (BASELINE.json).
The workload is the fused solve step (raygen + Möller-Trumbore sweep +
histogram) on a synthetic scene sized so padding is zero: every counted
test is a real intersection test. Also reports the street-canyon full-solve
wall clock and its max |dF| against the analytical parallel-plates value as
secondary sanity fields.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/raystrack_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from raystrack_tpu.config import PALLAS_RAY_BLOCK, PALLAS_TRI_TILE  # noqa: E402
from raystrack_tpu.ops.trace import trace_chunk  # noqa: E402
from raystrack_tpu.prepared import PreparedSolver  # noqa: E402
from raystrack_tpu.solver import _cp_rows  # noqa: E402

N_TRI = 98304  # triangle-soup size (multiple of the tile width: no padding)
RAYS_PER_CELL = 256
SAMPLES = 1  # 16x16 emitter area 256 -> g = 16 -> 65536 rays/iter
CHUNK = 4
REPS = 5


def _bench_scene():
    """Emitter plate + an (N_TRI - 2)-triangle cloud above it."""
    h = 8.0
    V = np.array([[-h, -h, 0], [h, -h, 0], [h, h, 0], [-h, h, 0]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    emitter = ("emitter", V, F)

    rng = np.random.default_rng(0)
    n_cloud = N_TRI - 2
    centers = rng.uniform([-8, -8, 2], [8, 8, 30], size=(n_cloud, 3))
    spans = rng.normal(scale=0.4, size=(n_cloud, 2, 3))
    Vc = np.concatenate(
        [centers, centers + spans[:, 0], centers + spans[:, 1]], axis=1
    ).reshape(-1, 3).astype(np.float32)
    Fc = np.arange(n_cloud * 3, dtype=np.int32).reshape(-1, 3)
    return [emitter, ("cloud", Vc, Fc)]


def main():
    meshes = _bench_scene()
    ps = PreparedSolver(meshes)
    scene = ps.get_scene_pack()
    em = ps.get_emitter_pack(
        0, samples=SAMPLES, rays=RAYS_PER_CELL, flip_faces=False
    )
    ext = np.array([0, 1, 0], dtype=np.int32)  # only 'cloud' active

    def run(seed: int):
        # fresh CP offsets per repetition so no layer can reuse a previous
        # dispatch's result
        cp = _cp_rows(seed, 0, 0, CHUNK).astype(np.float32)
        return trace_chunk(
            (scene.v0, scene.e1, scene.e2, scene.cross_e,
             scene.w_u, scene.w_v, scene.d0, scene.sid),
            (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2),
            (em.cdf, em.tri_a, em.tri_e1, em.tri_e2,
             em.tri_u, em.tri_v, em.tri_n, em.tri_eps),
            cp,
            ext,
            np.int32(0),
            np.int32(0),
            np.int32(em.n_rays_once),
            ray_block=PALLAS_RAY_BLOCK,
            tri_tile=PALLAS_TRI_TILE,
            want_matrix=True,
            want_any=False,
            discrete=False,
            kernel="pallas",
        )

    def force(out) -> int:
        # block_until_ready is not reliable on every platform plugin; a
        # device-to-host copy of the (tiny) count vectors is a hard sync.
        return int(np.asarray(out["counts_f"]).sum())

    # warmup / compile
    force(run(0))

    times = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        force(run(rep + 1))
        times.append(time.perf_counter() - t0)
    best = min(times)

    tests = CHUNK * em.n_rays_pad * scene.n_tri_pad
    tests_per_sec = tests / best
    rays_per_sec = CHUNK * em.n_rays_pad / best

    # secondary: canyon solve wall clock (warm) + analytical error.
    # Best-effort: the headline JSON line must print even if the secondary
    # solves hit a cold compilation cache or a transient device error.
    try:
        canyon_s, max_df = _canyon_secondary()
    except Exception as exc:  # pragma: no cover - environment dependent
        print(f"# canyon secondary skipped: {type(exc).__name__}: {exc}")
        canyon_s, max_df = None, None

    print(
        json.dumps(
            {
                "metric": "ray_triangle_tests_per_sec",
                "value": round(tests_per_sec),
                "unit": "tests/s",
                "vs_baseline": round(tests_per_sec / 1.0e9, 3),
                "rays_per_sec": round(rays_per_sec),
                "n_tri": int(scene.n_tri_pad),
                "rays_per_dispatch": int(CHUNK * em.n_rays_pad),
                "device": str(jax.devices()[0]),
                "canyon_solve_s": canyon_s,
                "parallel_plates_abs_err": max_df,
            }
        )
    )


def _canyon_secondary():
    from examples.ex00_street_canyon_geometry import build_street_canyon
    from raystrack_tpu import MatrixParams, view_factor_matrix

    meshes = build_street_canyon()
    params = MatrixParams(samples=8, rays=512, seed=11, max_iters=60, min_iters=5)
    view_factor_matrix(meshes, params=params)  # warm all shapes
    t0 = time.perf_counter()
    view_factor_matrix(meshes, params=params)
    canyon_s = round(time.perf_counter() - t0, 3)

    # analytical: two parallel unit squares, gap 1
    def square(name, z, flip):
        V = np.array(
            [[-0.5, -0.5, z], [0.5, -0.5, z], [0.5, 0.5, z], [-0.5, 0.5, z]],
            np.float32,
        )
        F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        if flip:
            F = F[:, [0, 2, 1]].copy()
        return name, V, F

    plates = [square("bottom", 0.0, False), square("top", 1.0, True)]
    vf = view_factor_matrix(
        plates,
        params=MatrixParams(
            samples=32, rays=1024, seed=11, tol=1e-4, tol_mode="stderr",
            min_iters=40, max_iters=500, reciprocity=False,
        ),
    )
    err = abs(vf["bottom"]["top_front"] - 0.1998248957)
    return canyon_s, round(err, 8)


if __name__ == "__main__":
    main()
