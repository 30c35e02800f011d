#!/usr/bin/env python3
"""Real-TPU compile smoke: AOT-compile EVERY Pallas kernel variant.

Interpret-mode CI structurally cannot catch Mosaic legalization failures
(it once masked an i1-vector loop-carry bug that broke every ``want_any``
Pallas path on hardware — docs/ROADMAP.md round-2 notes). This script
compiles the full kernel-variant grid on the real chip:

  sweep_rays            x {resident, streamed} x {gate, two-level gate, off}
                        x {matrix, any, both} x {baked, unbaked}
  sweep_rays_scheduled  x {resident, streamed} x {gate, two-level, off}
                        x {matrix, any, both}

via ``jax.jit(...).lower(ShapeDtypeStruct...).compile()`` — no device data,
no execution — fanned out over a thread pool (remote AOT is RPC-bound, so
parallel compiles overlap). It then runs three TINY end-to-end solves
(matrix / shared-ray workflow / discrete sky) with the scheduled Pallas
driver forced, which executes the raygen + histogram integration paths.

Exit 0 = every variant compiled and the solves ran. Budget: < 2 min warm,
~5 min on a completely cold cache. Run it (and commit the output) whenever
a kernel changes; the verify skill lists it as a required step.
"""
from __future__ import annotations

import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

# Force the production drivers into their accelerator regime BEFORE import.
os.environ.setdefault("RAYSTRACK_TPU_KERNEL", "pallas")
os.environ.setdefault("RAYSTRACK_TPU_SCHEDULER", "scheduled")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

if "--allow-cpu" in sys.argv[1:]:
    # plumbing checks off-TPU: the config API is authoritative (the axon
    # plugin registers even when JAX_PLATFORMS=cpu is exported)
    jax.config.update("jax_platforms", "cpu")

# share the solvers' default persistent cache so this smoke's AOT work
# warms bench.py and real solves (a private cache dir would warm nothing)
from raystrack_tpu.solver import _ensure_compile_cache  # noqa: E402

_ensure_compile_cache()

from raystrack_tpu import config  # noqa: E402
from raystrack_tpu.ops import trace_pallas as tp  # noqa: E402

F32 = jnp.float32
I32 = jnp.int32
S = jax.ShapeDtypeStruct

RAY_BLOCK = config.PALLAS_RAY_BLOCK  # 256 default
N_RAYS = 2 * RAY_BLOCK
TRI_TILE = config.PALLAS_TRI_TILE  # 2048 default
N_TRI = 2 * TRI_TILE  # two tiles: gates and tile loops are real
N_BOXES = N_TRI // config.ACCEL_GRAIN

# Tracing (lower) reads config.GATE_MAX_TILES, which the two-level-gate
# variants shrink; serialize the mutate+trace step so pool threads cannot
# see each other's override. Compiles (the slow, RPC-bound part) overlap.
_TRACE_LOCK = threading.Lock()


def _kernel_cases():
    """(label, zero-arg compile fn) for every Pallas kernel variant."""
    rays = S((9, N_RAYS), F32)  # transposed (9, N) ray store
    pack = S((tp.TRI_ROWS, N_TRI), F32)
    mask = S((N_TRI,), jnp.bool_)
    accel = (S((N_BOXES, 3), F32), S((N_BOXES, 3), F32))
    cases = []

    interp = "--interpret" in sys.argv[1:]  # CPU plumbing check only

    def single(stream, gate, wm, wa, mode, group):
        kw = dict(ray_block=RAY_BLOCK, tri_tile=TRI_TILE, want_matrix=wm,
                  want_any=wa, stream_from_hbm=stream,
                  masks_baked=(mode == "baked"), interpret=interp)

        def build():
            # gate_group > 1 (two-level) needs n_tiles > GATE_MAX_TILES;
            # shrinking the knob at TRACE time reproduces that kernel shape
            # without a 4M-triangle smoke scene. Config is only read while
            # tracing, and each lower() here traces fresh.
            with _TRACE_LOCK:
                old = config.GATE_MAX_TILES
                config.GATE_MAX_TILES = 1 if group > 1 else old
                try:
                    if mode == "code":
                        # slim pack-resident masks: in-kernel eligibility
                        # from the code row vs two SMEM scalars
                        fn = jax.jit(lambda r, p, m, a, cb: tp.sweep_rays(
                            r, p, m, accel=a, code_bounds=cb, **kw))
                        return fn.lower(rays, pack, mask,
                                        accel if gate else None, S((2,), F32))
                    fn = jax.jit(lambda r, p, m, a: tp.sweep_rays(
                        r, p, m, accel=a, **kw))
                    return fn.lower(rays, pack, mask, accel if gate else None)
                finally:
                    config.GATE_MAX_TILES = old

        return build

    def sched(stream, gate, wm, wa, group):
        n_emit = 3
        masks = S((n_emit, N_TRI), F32)
        emap = S((N_RAYS // RAY_BLOCK,), I32)
        kw = dict(ray_block=RAY_BLOCK, tri_tile=TRI_TILE, want_matrix=wm,
                  want_any=wa, stream_from_hbm=stream, interpret=interp)

        def build():
            with _TRACE_LOCK:
                old = config.GATE_MAX_TILES
                config.GATE_MAX_TILES = 1 if group > 1 else old
                try:
                    fn = jax.jit(lambda r, p, m, e, a: tp.sweep_rays_scheduled(
                        r, p, m, e, accel=a, **kw))
                    return fn.lower(rays, pack, masks, emap,
                                    accel if gate else None)
                finally:
                    config.GATE_MAX_TILES = old

        return build

    outs = [(True, False), (False, True), (True, True)]
    for stream in (False, True):
        for gate, group in ((False, 1), (True, 1), (True, 2)):
            for wm, wa in outs:
                for mode in ("masked", "baked", "code"):
                    label = (f"sweep[{'hbm' if stream else 'res'},"
                             f"{'g2' if group > 1 else 'g1' if gate else 'g0'},"
                             f"{'M' if wm else ''}{'A' if wa else ''},"
                             f"{mode}]")
                    cases.append((label, single(stream, gate, wm, wa, mode, group)))
                label = (f"sched[{'hbm' if stream else 'res'},"
                         f"{'g2' if group > 1 else 'g1' if gate else 'g0'},"
                         f"{'M' if wm else ''}{'A' if wa else ''}]")
                cases.append((label, sched(stream, gate, wm, wa, group)))
    return cases


def _compile_one(label, build):
    t0 = time.monotonic()
    try:
        lowered = build()
        lowered.compile()
        return label, time.monotonic() - t0, None
    except Exception as exc:  # noqa: BLE001 - report every failure
        return label, time.monotonic() - t0, f"{type(exc).__name__}: {exc}"


def _tiny_scene():
    sq = lambda z, flip: (
        np.array([[-0.5, -0.5, z], [0.5, -0.5, z], [0.5, 0.5, z],
                  [-0.5, 0.5, z]], np.float32),
        np.array([[0, 2, 1], [0, 3, 2]] if flip else [[0, 1, 2], [0, 2, 3]],
                 np.int32),
    )
    v0, f0 = sq(0.0, False)
    v1, f1 = sq(1.0, True)
    return [("bottom", v0, f0), ("top", v1, f1)]


def _end_to_end():
    """Tiny solves through the real drivers: raygen + histograms + D2H."""
    from raystrack_tpu import (
        MatrixParams,
        SkyParams,
        view_factor_matrix,
        view_factor_matrix_and_sky,
        view_factor_to_tregenza_sky,
    )

    meshes = _tiny_scene()
    mp = MatrixParams(samples=4, rays=64, seed=3, min_iters=2, max_iters=4)
    sp = SkyParams(samples=4, rays=64, seed=3, min_iters=2, max_iters=4,
                   discrete=True)
    def slim_matrix_exact():
        # slim (pack-resident) mode must reproduce the default solve
        # EXACTLY on real hardware (explicit PreparedSolvers: the implicit
        # cache would hand the slim call the full pack it already built)
        from raystrack_tpu.prepared import PreparedSolver

        want = view_factor_matrix(meshes, params=mp,
                                  prepared=PreparedSolver(meshes))
        old = config.SLIM_PACK_MIN_TRIS
        config.SLIM_PACK_MIN_TRIS = 1
        try:
            ps = PreparedSolver(meshes)
            got = view_factor_matrix(meshes, params=mp, prepared=ps)
            if not ps.get_scene_pack().slim:
                raise AssertionError("slim mode did not engage")
        finally:
            config.SLIM_PACK_MIN_TRIS = old
        if got != want:
            raise AssertionError(f"slim != default: {got} vs {want}")

    steps = [
        ("solve[matrix]", lambda: view_factor_matrix(meshes, params=mp)),
        ("solve[sky-discrete]",
         lambda: view_factor_to_tregenza_sky(meshes, params=sp)),
        ("solve[workflow]",
         lambda: view_factor_matrix_and_sky(meshes, matrix_params=mp,
                                            sky_params=sp)),
        ("solve[matrix-slim-exact]", slim_matrix_exact),
    ]
    results = []
    for label, fn in steps:
        t0 = time.monotonic()
        try:
            fn()
            results.append((label, time.monotonic() - t0, None))
        except Exception as exc:  # noqa: BLE001
            results.append((label, time.monotonic() - t0,
                            f"{type(exc).__name__}: {exc}"))
    return results


def _halton_parity():
    """Device-built Halton tables must be BITWISE equal to the host build.

    Forces the accelerator builder on (the smoke lengths are below its
    threshold) and shrinks the chunk buckets so the multi-chunk stitching
    path runs on the real chip too. Cheap: ~300k f32 per base D2H.
    """
    from raystrack_tpu.ops import halton as hm

    if jax.default_backend() == "cpu":
        return []  # the CPU-backend guard would skip the device build;
        # tests/test_halton.py covers this path with a monkeypatched backend

    t0 = time.monotonic()
    old_env = os.environ.get("RAYSTRACK_TPU_DEVICE_HALTON")
    old_chunks = hm._DEVICE_CHUNKS
    os.environ["RAYSTRACK_TPU_DEVICE_HALTON"] = "1"
    hm._DEVICE_CHUNKS = (1 << 17, 1 << 18)
    try:
        length = 300_000  # spans two chunks + a partial take
        host_idx = np.arange(1, length + 1, dtype=np.int64)
        for base in (2, 3, 5, 7, 11):
            dev = hm._halton_dim_device(length, base)
            if dev is None:
                return [("halton[parity]", time.monotonic() - t0,
                         "device builder returned None")]
            host = hm.radical_inverse(host_idx, base).astype(np.float32)
            if not np.array_equal(np.asarray(dev), host):
                return [("halton[parity]", time.monotonic() - t0,
                         f"base {base}: device != host (bitwise)")]
        return [("halton[parity]", time.monotonic() - t0, None)]
    except Exception as exc:  # noqa: BLE001
        return [("halton[parity]", time.monotonic() - t0,
                 f"{type(exc).__name__}: {exc}")]
    finally:
        hm._DEVICE_CHUNKS = old_chunks
        if old_env is None:
            os.environ.pop("RAYSTRACK_TPU_DEVICE_HALTON", None)
        else:
            os.environ["RAYSTRACK_TPU_DEVICE_HALTON"] = old_env


def main() -> int:
    t0 = time.monotonic()
    backend = jax.default_backend()
    print(f"# backend={backend} device={jax.devices()[0]}", flush=True)
    if backend != "tpu" and "--allow-cpu" not in sys.argv[1:]:
        print("FAIL: not a TPU backend (pass --allow-cpu to smoke anyway)")
        return 2

    cases = _kernel_cases()
    # Remote AOT is RPC-bound; parallel lowers/compiles overlap the waits.
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(lambda c: _compile_one(*c), cases))
    results += _halton_parity()
    results += _end_to_end()

    failures = 0
    for label, dt, err in results:
        status = "ok" if err is None else f"FAIL {err}"
        print(f"{label:<42} {dt:6.1f}s  {status}", flush=True)
        failures += err is not None
    total = time.monotonic() - t0
    print(f"# {len(results)} variants, {failures} failures, {total:.0f}s total",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
