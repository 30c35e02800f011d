#!/usr/bin/env python3
"""Rounds 4-5 hardware measurement harness (run on the real TPU).

Each experiment runs in a SUBPROCESS so config-env knobs apply cleanly
(config is read at import). Results print as one line per experiment;
everything shares the default persistent compile cache, so repeated runs
are warm. Pick experiments by name, default all round-4 ones:

  python tpu_experiments.py [headline city pipeline chunkrays fuse tile10m]

Experiments:
  headline  - peak tests/s (layout refactor delta vs round-3's 6.14e10)
  city      - 1M-tri occluded rays/s: default vs PALLAS_RAY_BLOCK=128 vs
              PALLAS_TRI_TILE=4096 (gate granularity/DMA trade re-measure
              after the transposed-ray layout shifted per-block costs)
  pipeline  - canyon + district warm solves, SCHED_PIPELINE=1 vs 0
  chunkrays - district warm solve at TARGET_CHUNK_RAYS x1 vs x4 (the
              layout refactor cut round temp ~21x; bigger rounds = fewer
              convergence round-trips on big-emitter scenes)
  fuse      - (round 5) canyon + district warm solves at
              SCHED_FUSE_ROUNDS auto(=1) / 4 / 8: fused multi-round
              dispatch vs the per-round RPC floor — MEASURED: fusing
              loses (docs/measurements/sched_fuse_rounds_r05.txt)
  tile10m   - (round 5) 10M-tri occluded rays/s at PALLAS_TRI_TILE
              2048 (default) / 1024 / 512, the finer ones with
              GATE_MAX_TILES=16384 so boxes stay per-tile as long as
              possible (the oracle says visits are at the floor FOR
              2048-wide tiles; the floor itself moves with granularity)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent

_HEADLINE = r"""
import sys, time, os, numpy as np
if os.environ.get("RAYSTRACK_EXP_CPU") == "1":
    import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {root!r})
from raystrack_tpu.solver import _ensure_compile_cache
_ensure_compile_cache()
import importlib.util
spec = importlib.util.spec_from_file_location("bench", {root!r} + "/bench.py")
bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)
t, r, n, em = bench._headline()
import json as J
print("RESULT " + J.dumps({{"tests_per_sec": round(t), "rays_per_sec": round(r)}}))
"""

_CITY = r"""
import sys, time, os, numpy as np, json
if os.environ.get("RAYSTRACK_EXP_CPU") == "1":
    import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {root!r})
from raystrack_tpu.solver import _ensure_compile_cache
_ensure_compile_cache()
import importlib.util
spec = importlib.util.spec_from_file_location("bench", {root!r} + "/bench.py")
bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)
from raystrack_tpu.prepared import PreparedSolver
ps = PreparedSolver(bench._city(1_000_000))
run = lambda seed: bench._run_chunk(ps, accel=True, seed=seed, chunk=2, samples=1, rays=2)
out, em, _ = run(0)
hits = bench._force(out)
times = []
for rep in range(3):
    t0 = time.perf_counter(); bench._force(run(rep + 1)[0])
    times.append(time.perf_counter() - t0)
print("RESULT " + json.dumps({{"rays_per_sec": round(2 * em.n_rays_pad / min(times)), "hits": hits}}))
"""

_CITY10M = r"""
import sys, time, os, numpy as np, json
if os.environ.get("RAYSTRACK_EXP_CPU") == "1":
    import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {root!r})
from raystrack_tpu.solver import _ensure_compile_cache
_ensure_compile_cache()
import importlib.util
spec = importlib.util.spec_from_file_location("bench", {root!r} + "/bench.py")
bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)
from raystrack_tpu.prepared import PreparedSolver
ps = PreparedSolver(bench._city(10_000_000))
run = lambda seed: bench._run_chunk(ps, accel=True, seed=seed, chunk=1, samples=1, rays=1)
out, em, _ = run(0)
hits = int(np.asarray(out["counts_f"]).sum() + np.asarray(out["counts_b"]).sum())
times = []
for rep in range(2):
    t0 = time.perf_counter(); bench._force(run(rep + 1)[0])
    times.append(time.perf_counter() - t0)
print("RESULT " + json.dumps({{"rays_per_sec": round(em.n_rays_pad / min(times)), "hits": hits}}))
"""

_SOLVE = r"""
import sys, time, os, numpy as np, json
if os.environ.get("RAYSTRACK_EXP_CPU") == "1":
    import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {root!r})
from raystrack_tpu.solver import _ensure_compile_cache
_ensure_compile_cache()
import importlib.util
spec = importlib.util.spec_from_file_location("bench", {root!r} + "/bench.py")
bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)
from raystrack_tpu import MatrixParams, view_factor_matrix
from raystrack_tpu.prepared import PreparedSolver
from examples.ex00_street_canyon_geometry import build_street_canyon

quick = os.environ.get("RAYSTRACK_EXP_QUICK") == "1"
canyon = build_street_canyon()
cp = MatrixParams(samples=8 if not quick else 2,
                  rays=512 if not quick else 16, seed=11,
                  max_iters=60 if not quick else 4, min_iters=5 if not quick else 2)
view_factor_matrix(canyon, params=cp)
canyon_s = bench._timed_min(lambda: view_factor_matrix(canyon, params=cp))

district = bench._district(n_buildings=96 if not quick else 8)
ps = PreparedSolver(district)
dp = MatrixParams(samples=1, rays=32, seed=7, max_iters=8, min_iters=4,
                  tol=1e-3, reciprocity=True)
view_factor_matrix(district, params=dp, prepared=ps)
district_s = bench._timed_min(
    lambda: view_factor_matrix(district, params=dp, prepared=ps))
print("RESULT " + json.dumps({{"canyon_s": canyon_s, "district_s": district_s}}))
"""


def run_probe(label: str, code: str, env_overrides: dict, timeout: int = 1500):
    env = dict(os.environ, **{k: str(v) for k, v in env_overrides.items()})
    t0 = time.monotonic()
    try:
        out = subprocess.run(
            [sys.executable, "-c", code.format(root=str(ROOT))],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        print(f"{label:<44} TIMEOUT after {timeout}s", flush=True)
        return None
    dt = time.monotonic() - t0
    result = None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[7:])
    if result is None:
        tail = (out.stdout + out.stderr).strip().splitlines()[-3:]
        print(f"{label:<44} FAILED rc={out.returncode}: {' | '.join(tail)}",
              flush=True)
    else:
        print(f"{label:<44} {dt:6.1f}s  {result}", flush=True)
    return result


def main() -> None:
    picks = set(sys.argv[1:]) or {"headline", "city", "pipeline", "chunkrays"}
    if "headline" in picks:
        run_probe("headline (layout refactor)", _HEADLINE, {})
    if "city" in picks:
        run_probe("city 1M default", _CITY, {})
        run_probe("city 1M PALLAS_RAY_BLOCK=128", _CITY,
                  {"RAYSTRACK_TPU_PALLAS_RAY_BLOCK": 128})
        run_probe("city 1M PALLAS_TRI_TILE=4096", _CITY,
                  {"RAYSTRACK_TPU_PALLAS_TRI_TILE": 4096})
    if "pipeline" in picks:
        run_probe("solves SCHED_PIPELINE=1 (default)", _SOLVE, {})
        run_probe("solves SCHED_PIPELINE=0", _SOLVE,
                  {"RAYSTRACK_TPU_SCHED_PIPELINE": 0})
    if "chunkrays" in picks:
        run_probe("district TARGET_CHUNK_RAYS x4", _SOLVE,
                  {"RAYSTRACK_TPU_TARGET_CHUNK_RAYS": 16_777_216})
    if "fuse" in picks:
        run_probe("solves SCHED_FUSE_ROUNDS auto (unfused default)", _SOLVE,
                  {})
        run_probe("solves SCHED_FUSE_ROUNDS=4", _SOLVE,
                  {"RAYSTRACK_TPU_SCHED_FUSE_ROUNDS": 4})
        run_probe("solves SCHED_FUSE_ROUNDS=8", _SOLVE,
                  {"RAYSTRACK_TPU_SCHED_FUSE_ROUNDS": 8})
    if "tile10m" in picks:
        run_probe("city 10M TRI_TILE=2048 (default)", _CITY10M, {},
                  timeout=2400)
        run_probe("city 10M TRI_TILE=1024 GATE=16384", _CITY10M,
                  {"RAYSTRACK_TPU_PALLAS_TRI_TILE": 1024,
                   "RAYSTRACK_TPU_GATE_MAX_TILES": 16384}, timeout=2400)
        run_probe("city 10M TRI_TILE=512 GATE=16384", _CITY10M,
                  {"RAYSTRACK_TPU_PALLAS_TRI_TILE": 512,
                   "RAYSTRACK_TPU_GATE_MAX_TILES": 16384}, timeout=2400)


if __name__ == "__main__":
    main()
