#!/usr/bin/env python3
"""Headline benchmark: ray-triangle intersection throughput on one chip.

Prints the headline JSON line IMMEDIATELY after the headline measurement
(flushed), then runs the secondary blocks each under its own wall-clock
budget, and finally prints an enriched JSON line with every field that
finished in time:

  {"metric": "ray_triangle_tests_per_sec", "value": N, "unit": "tests/s",
   "vs_baseline": N / 1e9, ...}

The two-line structure exists because the harness runs this script under a
hard timeout: a cold compilation cache must never zero the whole artifact
(round 3 lost its bench to exactly that — every secondary compiled cold and
the timeout hit before the single end-of-run JSON print).

The baseline north star is 1e9 ray-triangle tests/sec/chip (BASELINE.json).
The headline workload is the fused solve step (raygen + Möller-Trumbore
sweep + histogram) on a synthetic scene sized so padding is zero: every
counted test is a real intersection test.

Secondary fields keep the headline honest:
- ``occluded_city``: user-visible rays/s on dense occluded city scenes at
  1e4/1e5/1e6/1e7 triangles, with acceleration (AABB-gated,
  coherence-sorted sweep) and brute force — hit counts are asserted
  identical (the 1e7 point checks against a calibrated committed checksum
  so its brute anchor doesn't have to re-run every round; pass
  ``--calibrate`` to regenerate ``bench_expected.json`` with a live brute
  run).
- ``canyon_solve_s``: warm full-solve wall clock of the 22-triangle street
  canyon (dispatch-overhead regime; driven by the scheduled driver).
- ``parallel_plates_abs_err``: accuracy anchor vs the analytical value.

Budget: total wall clock is bounded by RAYSTRACK_TPU_BENCH_BUDGET_S
(default 420 s). Each secondary is skipped with a note when the remaining
budget is below its estimated cold cost.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax  # noqa: E402

# Use the SAME persistent compile cache as the solvers' default
# (~/.cache/raystrack_tpu/jax) so bench runs, tpu_smoke runs and real
# solves all warm each other — a private /tmp cache here used to mean the
# bench recompiled variants another process had already built.
from raystrack_tpu.solver import _ensure_compile_cache  # noqa: E402

_ensure_compile_cache()

from raystrack_tpu.config import PALLAS_RAY_BLOCK, PALLAS_TRI_TILE  # noqa: E402
from raystrack_tpu.ops.trace import trace_chunk  # noqa: E402
from raystrack_tpu.prepared import PreparedSolver  # noqa: E402
from raystrack_tpu.solver import _cp_rows  # noqa: E402

N_TRI = 98304  # triangle-soup size (multiple of the tile width: no padding)
RAYS_PER_CELL = 256
SAMPLES = 1  # 16x16 emitter area 256 -> g = 16 -> 65536 rays/iter
CHUNK = 4
REPS = 5

_START = time.monotonic()
_BUDGET_S = float(os.environ.get("RAYSTRACK_TPU_BENCH_BUDGET_S", "420"))
_EXPECTED_PATH = Path(__file__).resolve().parent / "bench_expected.json"


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _START)


def _cache_warm() -> bool:
    """True when the persistent compile cache already holds real entries.

    Cold-cost estimates assume every program AOT-compiles from scratch;
    with a warm cache (any prior bench/solve/tpu_smoke run on this machine)
    the real cost is ~3x lower, and round 4's driver run skipped the
    district and 10M-city points purely because the estimates ignored this.
    """
    try:
        import jax

        d = jax.config.jax_compilation_cache_dir
        if not d:
            return False
        n = sum(1 for _ in Path(os.path.expanduser(d)).iterdir())
        return n >= 20
    except Exception:
        return False


_WARM_SCALE = None


def _est(cold_s: float) -> float:
    """Cache-aware cost estimate for a secondary stage."""
    global _WARM_SCALE
    if _WARM_SCALE is None:
        _WARM_SCALE = (1.0 / 3.0) if _cache_warm() else 1.0
    return cold_s * _WARM_SCALE


def _note(msg: str) -> None:
    print(f"# {msg}", flush=True)


def _force(out) -> int:
    # block_until_ready is not reliable on every platform plugin; a
    # device-to-host copy of the (tiny) count vectors is a hard sync.
    return int(np.asarray(out["counts_f"]).sum())


def _run_chunk(ps: PreparedSolver, *, accel: bool, seed: int, chunk: int,
               samples: int, rays: int):
    scene = ps.get_scene_pack(use_accel=accel)
    em = ps.get_emitter_pack(0, samples=samples, rays=rays, flip_faces=False)
    n_surf = len(ps.meshes)
    ext = np.zeros(n_surf + 1, dtype=np.int32)
    ext[1:-1] = 1  # everything but the emitter is a receiver
    cp = _cp_rows(seed, 0, 0, chunk).astype(np.float32)
    out = trace_chunk(
        (scene.v0, scene.e1, scene.e2, scene.cross_e,
         scene.w_u, scene.w_v, scene.d0, scene.sid),
        (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2),
        (em.cdf, em.tri_a, em.tri_e1, em.tri_e2,
         em.tri_u, em.tri_v, em.tri_n, em.tri_eps),
        cp, ext, np.int32(0), np.int32(0), np.int32(em.n_rays_once),
        None, scene.accel, scene.tri_pack,
        ray_block=min(PALLAS_RAY_BLOCK, em.n_rays_pad),
        tri_tile=PALLAS_TRI_TILE,
        want_matrix=True, want_any=False, discrete=False,
        kernel="pallas",
    )
    return out, em, scene


def _bench_soup():
    """Emitter plate + an (N_TRI - 2)-triangle cloud above it (peak regime:
    sparse cloud, nothing prunable, pure pair-test throughput)."""
    h = 8.0
    V = np.array([[-h, -h, 0], [h, -h, 0], [h, h, 0], [-h, h, 0]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    rng = np.random.default_rng(0)
    n_cloud = N_TRI - 2
    centers = rng.uniform([-8, -8, 2], [8, 8, 30], size=(n_cloud, 3))
    spans = rng.normal(scale=0.4, size=(n_cloud, 2, 3))
    Vc = np.concatenate(
        [centers, centers + spans[:, 0], centers + spans[:, 1]], axis=1
    ).reshape(-1, 3).astype(np.float32)
    Fc = np.arange(n_cloud * 3, dtype=np.int32).reshape(-1, 3)
    return [("emitter", V, F), ("cloud", Vc, Fc)]


def _city(n_tri: int, extent: float = 100.0, seed: int = 0):
    """Ground emitter + dense random boxes: near geometry occludes far."""
    V = np.array([[-extent, -extent, 0], [extent, -extent, 0],
                  [extent, extent, 0], [-extent, extent, 0]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n_boxes = max(1, (n_tri - 2) // 12)
    rng = np.random.default_rng(seed)
    cx = rng.uniform(-extent, extent, (n_boxes, 2))
    w = rng.uniform(1.0, 4.0, (n_boxes, 2))
    h = rng.uniform(2.0, 25.0, n_boxes)
    box_f = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
                      [0, 4, 5], [0, 5, 1], [1, 5, 6], [1, 6, 2],
                      [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0]], np.int32)
    # Vectorized box assembly (identical values to the old per-box loop —
    # the rng draws are unchanged and f32 rounding happens at the same
    # point); the loop was the wall-clock bottleneck past ~1e7 triangles
    # and made the 1e8 demonstration impractical.
    x0, y0 = (cx - w).T.astype(np.float32)
    x1, y1 = (cx + w).T.astype(np.float32)
    h32 = h.astype(np.float32)
    vs = np.empty((n_boxes, 8, 3), np.float32)
    vs[:, (0, 3, 4, 7), 0] = x0[:, None]
    vs[:, (1, 2, 5, 6), 0] = x1[:, None]
    vs[:, (0, 1, 4, 5), 1] = y0[:, None]
    vs[:, (2, 3, 6, 7), 1] = y1[:, None]
    vs[:, :4, 2] = np.float32(0.05)
    vs[:, 4:, 2] = h32[:, None]
    faces = (box_f[None, :, :]
             + 8 * np.arange(n_boxes, dtype=np.int32)[:, None, None])
    return [("ground", V, F),
            ("city", vs.reshape(-1, 3), faces.reshape(-1, 3))]


def _headline():
    ps = PreparedSolver(_bench_soup())
    run = lambda seed: _run_chunk(ps, accel=False, seed=seed, chunk=CHUNK,
                                  samples=SAMPLES, rays=RAYS_PER_CELL)
    out, em, scene = run(0)
    _force(out)  # warmup / compile
    times = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        _force(run(rep + 1)[0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    tests = CHUNK * em.n_rays_pad * scene.n_tri_pad
    return tests / best, CHUNK * em.n_rays_pad / best, scene.n_tri_pad, em


def _platform_key() -> str:
    return jax.devices()[0].device_kind.replace(" ", "_")


def _load_expected() -> dict:
    try:
        return json.loads(_EXPECTED_PATH.read_text(encoding="utf-8"))
    except Exception:
        return {}


def _city_point(n_tri: int, *, calibrate: bool, expected: dict) -> dict:
    """rays/s at one occluded-scene size, acceleration vs brute force.

    Hit counts are the honesty guard: acceleration must not change results.
    Small sizes assert brute == accel live. The 1e7 point compiles and runs
    a very large brute program; outside ``--calibrate`` it instead asserts
    the accel hit checksum against the committed calibration for this
    device kind (falling back to a live brute run when none exists).
    """
    big = n_tri >= 10_000_000
    chunk, rays, reps = (1, 1, 2) if big else (2, 2, 3)
    plat = _platform_key()
    cal = expected.get(plat, {}).get(str(n_tri)) if big else None
    run_brute = (not big) or calibrate or cal is None

    entry: dict = {}
    hits: dict = {}
    ps = PreparedSolver(_city(n_tri))
    for accel in ((False, True) if run_brute else (True,)):
        run = lambda seed: _run_chunk(ps, accel=accel, seed=seed,
                                      chunk=chunk, samples=1, rays=rays)
        out, em, _ = run(0)
        hits[accel] = _force(out)  # warmup + hit checksum
        times = []
        for rep in range(reps):
            t0 = time.perf_counter()
            _force(run(rep + 1)[0])
            times.append(time.perf_counter() - t0)
        entry["accel" if accel else "brute"] = round(
            chunk * em.n_rays_pad / min(times)
        )
    if run_brute:
        assert hits[False] == hits[True], "acceleration changed hit counts!"
        entry["speedup"] = round(entry["accel"] / entry["brute"], 2)
        if big:
            entry["_calibration"] = {"hits": hits[True],
                                     "brute_rays_per_sec": entry["brute"]}
    else:
        assert hits[True] == cal["hits"], (
            f"accel hit checksum {hits[True]} != calibrated {cal['hits']} "
            f"(run `python bench.py --calibrate` after intended changes)")
        entry["brute"] = cal["brute_rays_per_sec"]
        entry["speedup"] = round(entry["accel"] / entry["brute"], 2)
        entry["brute_anchor"] = "calibrated"
    return entry


def _city_curve(calibrate: bool = False):
    """Occluded-scene curve; each size point respects the global budget.

    Cold-cost estimates are measured cold-cache numbers on the v5e tunnel
    (compile + run, see docs/ROADMAP.md round-4 notes).
    """
    expected = _load_expected()
    est_cold = {10_000: 45, 100_000: 50, 1_000_000: 75, 10_000_000: 90}
    points = {}
    new_cal = {}
    # The flagship gated 10M point runs FIRST so a tight budget can never
    # drop it in favor of the cheap sizes (round 4's artifact lost exactly
    # this point to the old cheap-first order).
    for n_tri in (10_000_000, 1_000_000, 100_000, 10_000):
        need = _est(est_cold[n_tri]) * (
            3 if calibrate and n_tri >= 10_000_000 else 1)
        if _remaining() < need:
            _note(f"city[{n_tri}] skipped: {_remaining():.0f}s left "
                  f"< {need:.0f}s est")
            continue
        t0 = time.monotonic()
        entry = _city_point(n_tri, calibrate=calibrate, expected=expected)
        cal = entry.pop("_calibration", None)
        if cal is not None:
            new_cal[str(n_tri)] = cal
        points[str(n_tri)] = entry
        _note(f"city[{n_tri}]: {time.monotonic() - t0:.1f}s -> {entry}")
    if calibrate and new_cal:
        expected.setdefault(_platform_key(), {}).update(new_cal)
        _EXPECTED_PATH.write_text(json.dumps(expected, indent=2) + "\n",
                                  encoding="utf-8")
        _note(f"calibration written to {_EXPECTED_PATH.name}: {new_cal}")
    return points or None


def _district(n_buildings: int = 96, extent: float = 60.0, seed: int = 3):
    """Ground + per-building meshes: a many-emitter Pallas-scale scene.

    Every building is its own named mesh (12 triangles), so a matrix solve
    runs n_buildings+1 emitters over >512 triangles — the regime the
    scheduled Pallas driver exists for (one gated dispatch per convergence
    round instead of per-emitter dispatch chains).
    """
    rng = np.random.default_rng(seed)
    V = np.array([[-extent, -extent, 0], [extent, -extent, 0],
                  [extent, extent, 0], [-extent, extent, 0]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    box_f = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
                      [0, 4, 5], [0, 5, 1], [1, 5, 6], [1, 6, 2],
                      [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0]], np.int32)
    meshes = [("ground", V, F)]
    cx = rng.uniform(-extent * 0.9, extent * 0.9, (n_buildings, 2))
    w = rng.uniform(1.5, 5.0, (n_buildings, 2))
    h = rng.uniform(4.0, 30.0, n_buildings)
    for i in range(n_buildings):
        x0, y0 = cx[i] - w[i]
        x1, y1 = cx[i] + w[i]
        vs = np.array([[x0, y0, 0.05], [x1, y0, 0.05], [x1, y1, 0.05],
                       [x0, y1, 0.05], [x0, y0, h[i]], [x1, y0, h[i]],
                       [x1, y1, h[i]], [x0, y1, h[i]]], np.float32)
        meshes.append((f"bld_{i:03d}", vs, box_f.copy()))
    return meshes


def _district_solve():
    """Warm full matrix solve of the 97-emitter district (scheduled Pallas
    driver: one AABB-gated dispatch per convergence round)."""
    from raystrack_tpu import MatrixParams, view_factor_matrix
    from raystrack_tpu.prepared import PreparedSolver

    meshes = _district()
    ps = PreparedSolver(meshes)
    params = MatrixParams(samples=1, rays=32, seed=7, max_iters=8,
                          min_iters=4, tol=1e-3, reciprocity=True)
    vf = view_factor_matrix(meshes, params=params, prepared=ps)  # warm compile
    n_rows = sum(1 for row in vf.values() if row)
    assert n_rows >= 90, f"district solve degenerate: {n_rows} non-empty rows"
    return _timed_min(
        lambda: view_factor_matrix(meshes, params=params, prepared=ps)
    )


def _timed_min(fn, reps: int = 3) -> float:
    """Best-of-N wall clock: the remote-tunnel TPU dispatch adds ~100 ms of
    jitter per RPC, so a single timed run is too noisy to compare across
    rounds (a prior round recorded a phantom 18% canyon 'regression' that
    was one noisy sample)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _canyon_and_plates():
    from examples.ex00_street_canyon_geometry import build_street_canyon
    from raystrack_tpu import MatrixParams, view_factor_matrix

    meshes = build_street_canyon()
    params = MatrixParams(samples=8, rays=512, seed=11, max_iters=60, min_iters=5)
    view_factor_matrix(meshes, params=params)  # warm all shapes
    canyon_s = _timed_min(lambda: view_factor_matrix(meshes, params=params))

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


def _best_committed() -> dict:
    """Best value per metric across the committed BENCH_r*.json files."""
    best: dict = {}
    for path in sorted(Path(__file__).resolve().parent.glob("BENCH_r*.json")):
        try:
            parsed = json.loads(path.read_text(encoding="utf-8")).get("parsed", {})
        except Exception:
            continue
        if not isinstance(parsed, dict):
            continue
        v = parsed.get("value")
        if isinstance(v, (int, float)):
            best["value"] = max(best.get("value", 0), v)
        for key in ("canyon_solve_s", "district_97_emitters_solve_s"):
            t = parsed.get(key)
            if isinstance(t, (int, float)):
                best[key] = min(best.get(key, float("inf")), t)
    return best


def _regressions(result: dict) -> list:
    """Loud >10% regression check vs the best committed round numbers.

    Returns human-readable strings; main() embeds them in the JSON line and
    exits nonzero so a round that slowed the framework down cannot land a
    green benchmark silently.
    """
    best = _best_committed()
    out = []
    v, ref = result.get("value"), best.get("value")
    if v and ref and v < 0.9 * ref:
        out.append(f"tests/s {v:.3g} < 90% of best committed {ref:.3g}")
    for key in ("canyon_solve_s", "district_97_emitters_solve_s"):
        t, ref = result.get(key), best.get(key)
        if t and ref and t > 1.1 * ref:
            out.append(f"{key} {t}s > 110% of best committed {ref}s")
    return out


def _stage(name: str, est_cold_s: float, fn, default=None):
    """Run one secondary under the global budget; never raise."""
    need = _est(est_cold_s)
    if _remaining() < need:
        _note(f"{name} skipped: {_remaining():.0f}s left < {need:.0f}s est")
        return default
    t0 = time.monotonic()
    try:
        out = fn()
    except Exception as exc:  # pragma: no cover - environment dependent
        _note(f"{name} failed: {type(exc).__name__}: {exc}")
        return default
    _note(f"{name}: {time.monotonic() - t0:.1f}s")
    return out


def _await_backend() -> None:
    """Bounded backend init: a dead remote-TPU tunnel makes jax.devices()
    HANG (not raise), which would burn the harness's whole timeout with
    zero output (that's how round 3 lost its artifact). Initialize on a
    daemon thread and abort fast & loud if the device never appears."""
    import threading

    ready = threading.Event()
    err: list = []

    def init():
        try:
            jax.devices()
            ready.set()
        except Exception as exc:  # pragma: no cover - environment dependent
            err.append(exc)
            ready.set()

    threading.Thread(target=init, daemon=True).start()
    budget = float(os.environ.get("RAYSTRACK_TPU_BENCH_INIT_TIMEOUT_S", "300"))
    if not ready.wait(timeout=budget):
        _note(f"backend init did not complete within {budget:.0f}s "
              "(dead device tunnel?) — aborting fast")
        raise SystemExit(3)
    if err:
        _note(f"backend init failed: {type(err[0]).__name__}: {err[0]}")
        raise SystemExit(3)


def main():
    calibrate = "--calibrate" in sys.argv[1:]
    _await_backend()
    t0 = time.monotonic()
    tests_per_sec, rays_per_sec, n_tri_pad, em = _headline()
    _note(f"headline: {time.monotonic() - t0:.1f}s (incl. import+compile)")

    result = {
        "metric": "ray_triangle_tests_per_sec",
        "value": round(tests_per_sec),
        "unit": "tests/s",
        "vs_baseline": round(tests_per_sec / 1.0e9, 3),
        "rays_per_sec": round(rays_per_sec),
        "n_tri": int(n_tri_pad),
        "rays_per_dispatch": int(CHUNK * em.n_rays_pad),
        "device": str(jax.devices()[0]),
    }
    # The headline must be on disk before any secondary can stall: print the
    # guaranteed-valid line now, then re-print the enriched line after EVERY
    # stage so a hard kill mid-run still leaves everything finished so far
    # on the last line.
    print(json.dumps(result), flush=True)
    _note(f"cache {'warm' if _cache_warm() else 'cold'}: "
          f"secondary estimates x{_est(1.0):.2f}")

    # Flagship secondaries first (district solve, then the city curve with
    # its 10M point leading) so a tight budget drops the cheap anchors, not
    # the headline claims.
    result["district_97_emitters_solve_s"] = _stage(
        "district", 100, _district_solve)
    print(json.dumps(result), flush=True)
    result["occluded_city_rays_per_sec"] = _stage(
        "city curve", 90, lambda: _city_curve(calibrate))
    print(json.dumps(result), flush=True)
    canyon_plates = _stage("canyon+plates", 90, _canyon_and_plates,
                           default=(None, None))
    result["canyon_solve_s"], result["parallel_plates_abs_err"] = canyon_plates

    regressions = _regressions(result)
    if regressions:
        result["regressions"] = regressions
    print(json.dumps(result), flush=True)
    if regressions:
        for msg in regressions:
            print(f"# PERF REGRESSION: {msg}", file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
