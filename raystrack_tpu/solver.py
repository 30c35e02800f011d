"""Solver drivers: view-factor matrix, sky, and shared-ray solves.

Behavioral parity with the reference drivers (reference:
src/raystrack/main.py:1181-2185) with a TPU-native execution model:

- per emitter, the Monte-Carlo loop runs in speculative device-side chunks
  (see ops/trace.py); the host replays per-iteration counts through float64
  monitors so stopping behavior matches a strictly sequential solve,
- reciprocity half-matrix tracing (only receivers with id > emitter are
  intersected; the transpose is back-filled as F*Ai/Aj),
- planar emitters cull receivers whose bounding box lies entirely behind the
  emission plane,
- per-emitter progress lines keep the reference format
  ``(i/n) [name] K iter, R rays -> T s (BVH=..., device=...)`` so external
  harnesses that parse iteration counts keep working.

The ``mesh`` keyword (not present in the reference, which is single-device
only) shards each trace across a JAX device mesh: rays are split along the
mesh axis and integer hit counts are psummed over ICI, so results are
bitwise identical for any device count.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from .config import RAY_BLOCK, TARGET_CHUNK_RAYS
from .convergence import MatrixMonitor, SkyMonitor, plan_chunk
from .params import MatrixParams, SkyParams
from .prepared import EmitterPack, PreparedEmitter, PreparedSolver, ScenePack
from .utils.helpers import enforce_reciprocity_and_rowsum as _enforce_reciprocity_and_rowsum
from .utils.logging import _log as _default_log

Mesh = Tuple[str, np.ndarray, np.ndarray]
VFDict = Dict[str, Dict[str, float]]

_BVH_AUTO_THRESHOLD = 512

# Injectable log hook (tests/harnesses may monkeypatch, mirroring the
# reference's raystrack.main._log contract).
_log = _default_log


def _emit_log(msg: str) -> None:
    _log(msg)


def _select_bvh(bvh: Optional[str], total_faces: int) -> bool:
    mode = (bvh or "auto").lower()
    if mode not in ("auto", "off", "builtin"):
        raise ValueError(f"bvh must be 'auto', 'off', or 'builtin' (got {bvh!r})")
    if mode == "builtin":
        return True
    if mode == "off":
        return False
    return total_faces >= _BVH_AUTO_THRESHOLD


def _use_scheduler(device, emitters=None, rays: int = 0, align: int = 1) -> bool:
    """Whether multi-emitter solves use the whole-scene scheduled driver
    (one dispatch per convergence round) instead of grouped vmap batching.
    "auto" = scheduled on accelerators (per-dispatch overhead dominates
    small scenes there), grouped on the CPU backend.

    The scheduled driver reads rays from scene-wide flat tables (7 f32
    arrays spanning every emitter's padded ray count); when that total
    exceeds SCHED_MAX_FLAT_RAYS the scheduler is declined even if requested,
    so huge-emitter scenes fall back to per-emitter drivers instead of
    exhausting device memory on tables."""
    from .config import SCHED_MAX_FLAT_RAYS, SCHEDULER

    if emitters is not None:
        from .prepared import _pad_rays

        total = sum(_pad_rays(e.n_cells * rays, align) for e in emitters)
        if total > SCHED_MAX_FLAT_RAYS:
            return False
    if SCHEDULER == "scheduled":
        return True
    if SCHEDULER == "grouped":
        return False
    return device.platform != "cpu"


_compile_cache_checked = False


def _ensure_compile_cache() -> None:
    """Enable JAX's persistent compilation cache unless already configured.

    Best-effort and once per process; an application that set its own cache
    dir (or disabled via RAYSTRACK_TPU_JAX_CACHE="") is left alone.
    """
    global _compile_cache_checked
    if _compile_cache_checked:
        return
    _compile_cache_checked = True
    from .config import JAX_CACHE_DIR

    if not JAX_CACHE_DIR:
        return
    try:
        import os

        import jax

        if jax.config.jax_compilation_cache_dir is None:
            path = os.path.expanduser(JAX_CACHE_DIR)
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never block a solve on it


def _resolve_device(device: Optional[str]):
    """Map the ``device`` param to a JAX device.

    ``auto`` -> default backend (accelerator when present); ``tpu``/``gpu``
    -> require an accelerator; ``cpu`` -> JAX CPU backend.
    """
    import jax

    _ensure_compile_cache()

    dev = (device or "auto").lower()
    if dev not in ("auto", "tpu", "gpu", "cpu"):
        raise ValueError(f"device must be 'auto', 'tpu', 'gpu', or 'cpu' (got {device!r})")

    def local_first(devices):
        # Under a multi-process runtime jax.devices() lists every process's
        # devices and index 0 may be non-addressable here; each process
        # must solve on its own devices (the partition model).
        pid = jax.process_index()
        local = [d for d in devices if d.process_index == pid]
        return (local or devices)[0]

    if dev == "cpu":
        return local_first(jax.devices("cpu"))
    default = local_first(jax.devices())
    if dev in ("tpu", "gpu") and default.platform == "cpu":
        raise RuntimeError(f"device={dev!r} requested but no accelerator is available")
    return default


def _device_label(device) -> str:
    return "cpu" if device.platform == "cpu" else "tpu"


# Content-keyed LRU of implicit PreparedSolvers: repeated solves of the same
# geometry WITHOUT an explicit prepared= reuse device packs and flat tables
# exactly like the ex05 PreparedSolver pattern. Keyed by mesh names + raw
# vertex/face bytes, so in-place edits rebuild; capped at a few scenes and
# skipped for huge meshes (hashing 100+ MB per call would cost more than it
# saves — large scenes are compute-dominated anyway). Measured: canyon warm
# solve 1.67 s fresh vs 0.55 s reused (per-solve device buffer churn is
# ~RPC-bound on remote-tunnel TPUs).
_PREPARED_LRU: "Dict[str, PreparedSolver]" = {}
_PREPARED_LRU_MAX = 4
_PREPARED_HASH_MAX_BYTES = 64 * 1024 * 1024


def hash_meshes(hasher, meshes: List[Mesh]) -> None:
    """Feed mesh content into ``hasher``: names are length-delimited and
    array shapes are hashed alongside the bytes, so the stream is injective
    up to the f32/int32 casts below (inputs differing only beyond f32
    precision hash alike — safe because all prep casts to f32 at point of
    use). Changing this stream invalidates persisted checkpoint
    fingerprints (_CheckpointStore): older checkpoint dirs re-solve."""
    for name, V, F in meshes:
        nb = name.encode()
        hasher.update(np.int64([len(nb), V.shape[0], F.shape[0]]).tobytes())
        hasher.update(nb)
        hasher.update(np.ascontiguousarray(V, dtype=np.float32).tobytes())
        hasher.update(np.ascontiguousarray(F, dtype=np.int32).tobytes())


def _meshes_fingerprint(meshes: List[Mesh]) -> Optional[str]:
    import hashlib

    total = sum(V.nbytes + F.nbytes for _, V, F in meshes)
    if total > _PREPARED_HASH_MAX_BYTES:
        return None
    hasher = hashlib.sha256()
    hash_meshes(hasher, meshes)
    return hasher.hexdigest()


def clear_prepared_cache() -> None:
    """Drop the implicit PreparedSolver cache (releases the cached scenes'
    device buffers once no other references remain). Solves with an
    explicit ``prepared=`` are unaffected."""
    _PREPARED_LRU.clear()


def _ensure_prepared(meshes: List[Mesh], prepared: Optional[PreparedSolver]) -> PreparedSolver:
    if prepared is not None:
        if not isinstance(prepared, PreparedSolver):
            raise TypeError("prepared must be a PreparedSolver instance")
        return prepared
    from .config import PREPARED_CACHE

    key = _meshes_fingerprint(meshes) if PREPARED_CACHE else None
    if key is None:
        return PreparedSolver(meshes)
    solver = _PREPARED_LRU.pop(key, None)
    if solver is None:
        # deep-copy the arrays: the cached solver builds state LAZILY (new
        # bvh mode or sampling setup triggers prep later), so it must own
        # geometry frozen at fingerprint time — aliasing the caller's
        # arrays would let an in-place edit corrupt later lazy prep while
        # the key still matches the old content
        solver = PreparedSolver(
            [(name, V.copy(), F.copy()) for name, V, F in meshes]
        )
    _PREPARED_LRU[key] = solver  # re-insert: dict order is the LRU order
    while len(_PREPARED_LRU) > _PREPARED_LRU_MAX:
        _PREPARED_LRU.pop(next(iter(_PREPARED_LRU)))
    return solver


def _matrix_receivers(idx_emit: int, n_surf: int, reciprocity: bool) -> List[int]:
    if reciprocity:
        return list(range(idx_emit + 1, n_surf))
    return [j for j in range(n_surf) if j != idx_emit]


def _matrix_skip(idx_emit: int, reciprocity: bool) -> Tuple[int, int]:
    """(emitter sid to exclude, minimum sid eligible for matrix hits)."""
    return (idx_emit, idx_emit + 1) if reciprocity else (idx_emit, 0)


class _OrderedRowSink:
    """Stream COMPLETE rows to ``row_sink`` under the reciprocity half-solve.

    With ``reciprocity=True`` the transpose back-fill
    F(i->j) = F(j->i) * Aj / Ai lands in row i the moment emitter j < i
    converges, and no emitter j > i ever contributes to row i — so row i is
    complete exactly when emitters 0..i have all finished. This coordinator
    collects per-emitter results in completion order (the schedulers finish
    emitters in any order) and sinks rows in EMITTER order as the finished
    prefix grows, each merged with every back-fill contribution directed at
    it, making the streamed output equal the returned matrix. Rows restored
    from checkpoints are not re-sunk (``sink_own=False``) — their back-fill
    still flows into later rows — matching the resume contract.
    """

    def __init__(self, sink, names: List[str]):
        self._sink = sink
        self._names = names
        self._pending_backfill: Dict[str, Dict[str, float]] = {}
        self._finished: Dict[int, Tuple[Dict[str, float], bool]] = {}
        self._next = 0

    def finish(self, idx: int, row: Dict[str, float],
               backfill: Dict[str, Dict[str, float]], *,
               sink_own: bool = True) -> None:
        for name_r, entries in backfill.items():
            self._pending_backfill.setdefault(name_r, {}).update(entries)
        self._finished[idx] = (row, sink_own)
        while self._next in self._finished:
            row_i, emit = self._finished.pop(self._next)
            name = self._names[self._next]
            contrib = self._pending_backfill.pop(name, None)
            if emit:
                complete = dict(row_i)
                if contrib:
                    complete.update(contrib)
                self._sink(name, complete)
            self._next += 1


def _build_emitter_surface_mask(
    idx_emit: int,
    emitter: PreparedEmitter,
    bounds_center: np.ndarray,
    bounds_extent: np.ndarray,
) -> np.ndarray:
    """Per-surface active flags: emitter off; for planar emitters, also cull
    receivers whose AABB lies entirely behind the emission plane."""
    n_surf = int(bounds_center.shape[0])
    active = np.ones(n_surf, dtype=np.uint8)
    if 0 <= idx_emit < n_surf:
        active[idx_emit] = 0
    if not emitter.plane_is_planar:
        return active

    normal = emitter.plane_normal.astype(np.float64)
    signed = (bounds_center.astype(np.float64) - emitter.plane_origin) @ normal
    radius = bounds_extent.astype(np.float64) @ np.abs(normal)
    behind = (signed + radius) <= float(emitter.plane_tol)
    behind[idx_emit] = False
    active[behind] = 0
    return active


def _matrix_active_receivers(
    idx_emit: int, n_surf: int, reciprocity: bool, surf_active: np.ndarray
) -> Tuple[List[int], np.ndarray]:
    receivers = [
        j for j in _matrix_receivers(idx_emit, n_surf, reciprocity) if surf_active[j] != 0
    ]
    return receivers, np.asarray(receivers, dtype=np.int32)


def _maybe_profiler():
    """Optional jax.profiler capture, enabled by RAYSTRACK_TPU_PROFILE=<dir>.

    Returns a callable producing a context manager: a TraceAnnotation inside
    a running trace when enabled, a no-op otherwise.
    """
    import contextlib
    import os

    trace_dir = os.environ.get("RAYSTRACK_TPU_PROFILE")
    if not trace_dir:
        return lambda name: contextlib.nullcontext()

    import jax

    @contextlib.contextmanager
    def annotated(name: str):
        with jax.profiler.trace(trace_dir):
            with jax.profiler.TraceAnnotation(name):
                yield

    return annotated


def _cp_rows(seed: int, idx_emit: int, itr_start: int, chunk: int) -> np.ndarray:
    """Cranley-Patterson offsets for ``chunk`` iterations, reference RNG.

    Iteration ``itr`` draws 2 grid + 5 dimension offsets from
    ``np.random.default_rng(seed + idx_emit + itr)`` (reference:
    main.py:1810-1812), so results are reproducible and independent of
    chunking or device count.
    """
    rows = np.empty((chunk, 7), dtype=np.float32)
    for k in range(chunk):
        rng = np.random.default_rng(seed + idx_emit + itr_start + k)
        rows[k, :2] = rng.random(2, dtype=np.float32)
        rows[k, 2:] = rng.random(5, dtype=np.float32)
    return rows


# ---------------------------------------------------------------------------
# Emitter solve loop
# ---------------------------------------------------------------------------


class _EmitterRun:
    """Drives chunked tracing for one emitter until its monitors finish."""

    def __init__(
        self,
        scene_pack: ScenePack,
        em_pack: EmitterPack,
        surf_active: np.ndarray,
        emit_sid: int,
        min_sid: int,
        seed: int,
        idx_emit: int,
        device,
        mesh=None,
        kernel: str = "xla",
        interpret: bool = False,
    ):
        self.scene_pack = scene_pack
        self.em_pack = em_pack
        self.device = device
        self.mesh = mesh
        self.kernel = kernel
        self.interpret = interpret
        ext = np.zeros(surf_active.shape[0] + 1, dtype=np.int32)
        ext[:-1] = surf_active
        # Device scalars upload lazily on first per-emitter dispatch: the
        # scheduled driver passes its own per-round stacks and never touches
        # them, and 4 eager device_puts x hundreds of emitters is ~0.3 s of
        # H2D RPCs on a remote-tunnel TPU before any ray is traced.
        self._host_scalars = (
            ext, np.int32(emit_sid), np.int32(min_sid),
            np.int32(em_pack.n_rays_once),
        )
        self._dev_scalars = None
        self.seed = seed
        self.idx_emit = idx_emit
        self.itr_next = 0  # absolute iteration index (drives the RNG stream)

    def _scalars(self):
        if self._dev_scalars is None:
            import jax

            self._dev_scalars = tuple(
                jax.device_put(a, self.device) for a in self._host_scalars
            )
        return self._dev_scalars

    @property
    def surf_active_ext(self):
        return self._scalars()[0]

    @property
    def emit_sid(self):
        return self._scalars()[1]

    @property
    def min_sid(self):
        return self._scalars()[2]

    @property
    def n_rays_once(self):
        return self._scalars()[3]

    def run_chunk(self, chunk: int, *, want_matrix: bool, want_any: bool, discrete: bool):
        """Trace ``chunk`` iterations; returns dict of stacked numpy counts."""
        out = self.dispatch_chunk(
            chunk, want_matrix=want_matrix, want_any=want_any, discrete=discrete
        )
        return {k: np.asarray(v) for k, v in out.items()}

    def dispatch_chunk(self, chunk: int, *, want_matrix: bool, want_any: bool, discrete: bool):
        """Enqueue ``chunk`` iterations; returns device arrays WITHOUT
        synchronizing, so callers can pipeline several emitters' dispatches
        and harvest them later (XLA dispatch is asynchronous)."""
        cp = _cp_rows(self.seed, self.idx_emit, self.itr_next, chunk)
        self.itr_next += chunk

        scene = self.scene_pack
        em = self.em_pack
        scene_t = (
            scene.v0, scene.e1, scene.e2, scene.cross_e,
            scene.w_u, scene.w_v, scene.d0, scene.sid,
        )
        tables_t = (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2)
        geom_t = (
            em.cdf, em.tri_a, em.tri_e1, em.tri_e2,
            em.tri_u, em.tri_v, em.tri_n, em.tri_eps,
        )
        if self.kernel == "pallas":
            from .config import PALLAS_RAY_BLOCK, PALLAS_TRI_TILE

            n_local = self.em_pack.n_rays_pad
            if self.mesh is not None:
                n_local //= int(np.prod([self.mesh.shape[k] for k in self.mesh.shape]))
            # sweep_rays derives the final (divisible) tile width itself
            kwargs = dict(
                ray_block=min(PALLAS_RAY_BLOCK, n_local),
                tri_tile=PALLAS_TRI_TILE,
                want_matrix=want_matrix,
                want_any=want_any,
                discrete=discrete,
            )
        else:
            kwargs = dict(
                ray_block=RAY_BLOCK,
                tri_tile=scene.tri_tile,
                want_matrix=want_matrix,
                want_any=want_any,
                discrete=discrete,
            )
        if self.mesh is not None:
            from .parallel.sharding import trace_chunk_sharded

            out = trace_chunk_sharded(
                self.mesh, scene_t, tables_t, geom_t, cp,
                self.surf_active_ext, self.emit_sid, self.min_sid,
                self.n_rays_once, em.plane_vec, scene.accel, scene.tri_pack,
                kernel=self.kernel, interpret=self.interpret, **kwargs,
            )
        else:
            from .ops.trace import trace_chunk

            args = (
                scene_t, tables_t, geom_t, cp,
                self.surf_active_ext, self.emit_sid, self.min_sid,
                self.n_rays_once, em.plane_vec, scene.accel, scene.tri_pack,
            )
            kw = dict(kernel=self.kernel, interpret=self.interpret, **kwargs)
            out = trace_chunk(*args, **kw)
            if self.device.platform != "cpu":
                _maybe_precompile_chunks(
                    trace_chunk, args, kw, chunk, em.n_rays_pad
                )
        return out


import functools


@functools.lru_cache(maxsize=64)
def _batched_step(
    ray_block: int, tri_tile: int, want_matrix: bool, want_any: bool,
    discrete: bool,
):
    """Cached jitted vmap of the chunk body over an emitter batch axis."""
    import jax

    from .ops.trace import chunk_body

    def one(scene_t, tb, gb, cpb, sb, eb, mb, ob, pb):
        return chunk_body(
            scene_t, tb, gb, cpb, sb, eb, mb, ob,
            ray_block=ray_block,
            tri_tile=tri_tile,
            want_matrix=want_matrix,
            want_any=want_any,
            discrete=discrete,
            plane_vec=pb,
        )

    def raw(scene_t, tables, geom, cp, surf, emit, minb, once, plane):
        return jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0))(
            scene_t, tables, geom, cp, surf, emit, minb, once, plane
        )

    return jax.jit(raw)


def _group_key(entry) -> Tuple[int, int]:
    em = entry["run"].em_pack
    return (em.n_rays_pad, int(np.asarray(em.cdf).shape[0]))


def _drive_grouped(entries, *, want_matrix: bool, want_any: bool,
                   discrete: bool, consume) -> None:
    """Batch same-shape emitters into single vmapped dispatches.

    Emitters sharing (padded ray count, face count) are solved together: one
    jit call traces a chunk for the whole group (per-emitter CP rows, masks
    and scalars ride a leading batch axis), which collapses the per-dispatch
    host/RPC overhead that dominates small scenes. Chunks use the group MAX
    of the per-emitter plans; surplus iterations are discarded by the replay
    exactly as in the single-emitter path, so results are unchanged. Once
    any member converges the group drops to the per-emitter pipelined
    driver for stragglers.

    Only used with the XLA sweep kernel (small scenes); large Pallas-swept
    scenes amortize dispatch overhead already.
    """
    import jax
    import jax.numpy as jnp

    groups: Dict[Tuple[int, int], List] = {}
    for entry in entries:
        groups.setdefault(_group_key(entry), []).append(entry)

    for members in groups.values():
        if len(members) < 2:
            continue
        run0 = members[0]["run"]
        scene = run0.scene_pack
        scene_t = (
            scene.v0, scene.e1, scene.e2, scene.cross_e,
            scene.w_u, scene.w_v, scene.d0, scene.sid,
        )
        stack = lambda get: jax.tree.map(
            lambda *xs: jnp.stack(xs), *(get(m["run"]) for m in members)
        )
        tables_b = stack(lambda r: (
            r.em_pack.u_cell, r.em_pack.v_cell, r.em_pack.h_tri,
            r.em_pack.h_u, r.em_pack.h_v, r.em_pack.h_r1, r.em_pack.h_r2,
        ))
        geom_b = stack(lambda r: (
            r.em_pack.cdf, r.em_pack.tri_a, r.em_pack.tri_e1, r.em_pack.tri_e2,
            r.em_pack.tri_u, r.em_pack.tri_v, r.em_pack.tri_n, r.em_pack.tri_eps,
        ))
        surf_b = stack(lambda r: r.surf_active_ext)
        emit_b = stack(lambda r: r.emit_sid)
        min_b = stack(lambda r: r.min_sid)
        once_b = stack(lambda r: r.n_rays_once)
        plane_b = stack(lambda r: r.em_pack.plane_vec)

        batched = _batched_step(
            RAY_BLOCK, scene.tri_tile, want_matrix, want_any, discrete
        )

        while True:
            monitors = [m["monitor"] for m in members]
            active = [mon for mon in monitors if not mon.done]
            # The batch shape is fixed, so converged members' lanes trace
            # wasted rays. Measured break-even (see config.GROUPED_MIN_ACTIVE):
            # on the CPU backend a K-lane batched dispatch costs ~0.92*K
            # single dispatches, so batching only stays ahead while every
            # lane is live; the pipelined driver takes stragglers from the
            # first convergence on.
            from .config import GROUPED_MIN_ACTIVE

            if len(active) < max(
                1, int(np.ceil(len(members) * GROUPED_MIN_ACTIVE))
            ):
                break
            chunk = max(
                plan_chunk(
                    mon.iters_done,
                    min_iters=mon.min_iters,
                    interval=mon.interval,
                    max_iters=mon.max_iters,
                    rays_per_iter=members[0]["run"].em_pack.n_rays_pad,
                    projected_total=mon.projected_total(),
                )
                for mon in active
            )
            if chunk <= 0:
                break
            cp = np.stack(
                [
                    _cp_rows(m["run"].seed, m["run"].idx_emit,
                             m["run"].itr_next, chunk)
                    for m in members
                ]
            )
            out = batched(scene_t, tables_b, geom_b, jnp.asarray(cp), surf_b,
                          emit_b, min_b, once_b, plane_b)
            host = {k: np.asarray(v) for k, v in out.items()}
            for e_idx, member in enumerate(members):
                mon = member["monitor"]
                for k in range(chunk):
                    if mon.done:
                        break
                    consume(mon, host, e_idx, k)
                member["run"].itr_next = mon.iters_done
                if mon.done:
                    _entry_done(member)
                else:
                    _entry_progress(member)


def _entry_progress(entry) -> None:
    """Rate-limited mid-emitter snapshot hook, fired by every driver after an
    entry's chunk replay. No-op unless the solve attached ``on_progress``."""
    callback = entry.get("on_progress")
    if callback is None or entry.get("_finished"):
        return
    from .config import CHECKPOINT_PROGRESS_S

    if CHECKPOINT_PROGRESS_S < 0:
        return
    now = time.time()
    if now - entry.get("_progress_ts", 0.0) < CHECKPOINT_PROGRESS_S:
        return
    entry["_progress_ts"] = now
    callback(entry)


def _entry_done(entry) -> None:
    """Completion hook: stamp per-emitter wall time and fire the entry's
    ``on_done`` callback exactly once (checkpoint writers hang off this so a
    preempted multi-emitter solve keeps every finished emitter's state)."""
    if entry.get("_finished"):
        return
    entry["_finished"] = True
    if "started" in entry:
        entry["elapsed"] = time.time() - entry["started"]
    callback = entry.get("on_done")
    if callback is not None:
        callback(entry)


def _make_emitter_pack(prepared_solver, idx_emit, p, flip_faces, align,
                       pack_dev, ray_dev, *, lazy: bool):
    """EmitterPack for one emitter; lazy when the scheduled driver will read
    rays from the scene-wide flat tables instead."""
    def factory():
        return prepared_solver.get_emitter_pack(
            idx_emit, samples=p["samples"], rays=p["rays"],
            flip_faces=flip_faces, align=align,
            device=pack_dev, ray_device=ray_dev,
        )

    if not lazy:
        return factory()

    from .prepared import LazyEmitterPack, _pad_rays, emitter_plane_vec

    emitter = prepared_solver.get_emitter(
        idx_emit, samples=p["samples"], rays=p["rays"], flip_faces=flip_faces
    )
    n_once = emitter.n_cells * p["rays"]
    plane_host = emitter_plane_vec(emitter)
    return LazyEmitterPack(
        factory,
        n_rays_once=n_once,
        n_rays_pad=_pad_rays(n_once, align),
        plane_host=plane_host,
    )


def _sched_series(lo: int, hi: int) -> List[int]:
    """All {2^k, 3*2^(k-1)} bucket values in [lo, hi] — the schedule sizes
    _sched_size can produce between two bounds."""
    vals = []
    # start from the largest power of two <= lo
    v = 2
    while v * 2 <= lo:
        v *= 2
    while v <= hi:
        for cand in (v, v * 3 // 2):
            if lo <= cand <= hi:
                vals.append(cand)
        v *= 2
    return sorted(set(vals))


def _background_compile(fn, args, kwargs, variants: List[Dict]) -> None:
    """Best-effort background AOT of predictable shape variants of ``fn``.

    A cold solve used to pay one BLOCKING remote AOT compile per distinct
    dispatch shape it wandered through (the round-3 canyon: 5 scheduled
    programs x ~30 s on a remote-tunnel TPU; a declined-scheduler city
    solve: one pipelined program per pow4 chunk size). After the first
    in-line compile of a family, the sibling shapes are known; this lowers
    and compiles them on daemon threads, concurrently with the solve's own
    dispatches, populating the same in-process jit cache and the persistent
    compile cache. Purely a warm-up: failures are swallowed and results
    discarded. ``variants`` is a list of {positional index: ShapeDtypeStruct}
    replacements against ``args``.
    """
    import threading
    from concurrent.futures import ThreadPoolExecutor

    import jax

    def to_sds(x):
        return (
            jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") and hasattr(x, "dtype")
            else x
        )

    base = jax.tree.map(to_sds, args)

    def compile_one(repl: Dict) -> None:
        try:
            a = list(base)
            for idx, sds in repl.items():
                a[idx] = sds
            fn.lower(*a, **kwargs).compile()
        except Exception:  # noqa: BLE001 - warm-up only, never fail a solve
            pass

    def run() -> None:
        with ThreadPoolExecutor(max_workers=4) as pool:
            list(pool.map(compile_one, variants))

    threading.Thread(target=run, daemon=True, name="aot-warmup").start()


def _sched_precompile(fn, args, kwargs, series: List[int]) -> None:
    """Warm the scheduled driver's remaining round-size buckets (see
    :func:`_background_compile`): cp rows track nb, schedule rows are nb."""
    import jax

    _background_compile(
        fn, args, kwargs,
        [
            {
                3: jax.ShapeDtypeStruct((max(8, v), 7), np.float32),  # cp
                9: jax.ShapeDtypeStruct((v, 4), np.int32),  # schedule
            }
            for v in series
        ],
    )


# Bounded guard set: one entry per dispatch family ever warmed. Clearing on
# overflow merely re-warms (cache hits make that cheap); note this set does
# NOT observe jax.clear_caches(), so a cleared jit cache re-warms only after
# 256 further families.
_WARMED_CHUNK_FAMILIES: set = set()
_WARMED_CHUNK_FAMILIES_MAX = 256


def _maybe_precompile_chunks(fn, args, kwargs, chunk: int, rays_per_iter: int) -> None:
    """Warm the pipelined driver's OTHER pow4 chunk sizes for this dispatch
    family (scene/emitter shapes + static config). plan_chunk only emits
    pow4 chunks up to min(ray budget, MAX_CHUNK), so the sibling set is
    known the moment the first chunk compiles; warming it in the background
    removes the one-blocking-compile-per-chunk-size cold pattern (e.g. the
    ex02/ex06 huge scheduler-declined emitters)."""
    import jax

    from . import config as _cfg

    if not _cfg.SCHED_PRECOMPILE:
        return
    cap = min(
        _cfg.MAX_CHUNK,
        max(1, _cfg.TARGET_CHUNK_RAYS // max(1, rays_per_iter)),
    )
    sizes = [c for c in (1, 4, 16, 64) if c <= cap and c != chunk]
    if not sizes:
        return
    # key on every leaf shape EXCEPT cp (args[3]) — the family is the same
    # whichever chunk size happened to compile first
    key = (
        tuple(
            (tuple(x.shape), str(x.dtype))
            for x in jax.tree.leaves((args[:3], args[4:]))
            if hasattr(x, "shape")
        ),
        tuple(sorted((k, str(v)) for k, v in kwargs.items())),
    )
    if key in _WARMED_CHUNK_FAMILIES:
        return
    if len(_WARMED_CHUNK_FAMILIES) >= _WARMED_CHUNK_FAMILIES_MAX:
        _WARMED_CHUNK_FAMILIES.clear()
    _WARMED_CHUNK_FAMILIES.add(key)
    _background_compile(
        fn, args, kwargs,
        [{3: jax.ShapeDtypeStruct((c, 7), np.float32)} for c in sizes],
    )


def _pow2_at_least(n: int, lo: int = 128) -> int:
    size = lo
    while size < n:
        size *= 2
    return size


def _sched_size(n: int, lo: int = 128) -> int:
    """Smallest {2^k, 3*2^(k-1)} >= n: schedule padding stays <= 33% instead
    of pow2's <= 100%, at twice the compiled-variant count."""
    size = lo
    while size < n:
        if size * 3 // 2 >= n:
            return size * 3 // 2
        size *= 2
    return size


def _entry_monitors(entry) -> List:
    """All live monitors of an entry (single-output or combined)."""
    if "monitor" in entry:
        return [entry["monitor"]]
    return [m for m in (entry.get("matrix_mon"), entry.get("sky_mon"))
            if m is not None]


def _drive_scheduled(entries, prepared_solver, p, flip_faces, align,
                     scene_pack, pack_dev, n_meshes: int, *,
                     want_matrix: bool, want_any: bool, discrete: bool,
                     consume, kernel: str = "xla",
                     interpret: bool = False, mesh=None) -> None:
    """Whole-scene scheduled solves: one dispatch per convergence round.

    Builds a block schedule spanning every pending emitter's next chunk and
    executes it as a single jitted program (ops.trace.scheduled_trace), then
    replays per-(emitter, iteration) aggregates through the monitors. The
    dispatch count becomes the number of convergence rounds of the slowest
    emitter instead of (emitters x rounds) — the scheduler end-state of the
    reference's multi-stream batching (reference: main.py:901-1179, which
    covers its sky kernels too: main.py:2044-2105). Schedule/CP arrays are
    padded to power-of-two sizes to bound compiled variants; padding blocks
    re-trace block 0 and are ignored by the aggregation.

    With ``kernel="pallas"`` the round dispatch runs the fused AABB-gated
    multi-emitter sweep (ops.trace.scheduled_trace_pallas) instead of the
    XLA sweep, so large many-emitter scenes get low dispatch counts AND tile
    pruning in one program. The round's ray budget is capped lower there
    because rays are materialized for the kernel.

    ``consume(entry, host, start_row, bpi, chunk)`` replays one entry's
    per-iteration aggregates through its monitor(s) and must advance
    ``entry['run'].itr_next`` monotonically (``max`` with the monitors'
    consumed count — NEVER assign a smaller value: under round pipelining
    itr_next already covers the next dispatched-but-unconsumed round).

    With ``config.SCHED_PIPELINE`` (default on) round k+1 is planned and
    dispatched before round k's results are fetched — see the loop below.

    With ``mesh`` the round dispatch runs inside ``shard_map``: schedule
    blocks are split across the mesh axis (embarrassingly parallel — each
    block's histogram depends only on its own rays), so many-emitter scenes
    compose one-dispatch-per-round scheduling WITH multi-chip execution.
    Results are bitwise-equal to the single-device schedule.
    """
    import jax.numpy as jnp

    from .ops.trace import (
        scheduled_trace,
        scheduled_trace_pallas,
        unpack_outputs,
    )

    import jax

    n_dev = 1 if mesh is None else int(
        np.prod([mesh.shape[k] for k in mesh.shape])
    )

    use_pallas = kernel == "pallas"
    if use_pallas:
        from .config import PALLAS_RAY_BLOCK, PALLAS_TRI_TILE

        # the Pallas grid block must tile the schedule's row size
        pallas_block = (
            PALLAS_RAY_BLOCK if RAY_BLOCK % PALLAS_RAY_BLOCK == 0 else RAY_BLOCK
        )

    # Every flat-table offset must be a RAY_BLOCK multiple: the scheduled
    # kernels slice the tables as (-1, RAY_BLOCK) rows (ops/trace.py
    # scheduled_trace_pallas raygen). Offsets are align-multiples, so
    # align itself must be one.
    if align % RAY_BLOCK:
        raise ValueError(
            f"scheduled driver requires align ({align}) to be a multiple of "
            f"RAY_BLOCK ({RAY_BLOCK})"
        )
    tables_flat, geom_stacked, offsets, n_pad = prepared_solver.get_flat_tables(
        samples=p["samples"], rays=p["rays"], flip_faces=flip_faces,
        align=align, device=pack_dev,
    )
    n_surf = n_meshes

    scene_t = (
        scene_pack.v0, scene_pack.e1, scene_pack.e2, scene_pack.cross_e,
        scene_pack.w_u, scene_pack.w_v, scene_pack.d0, scene_pack.sid,
    )

    def entry_pending(entry) -> bool:
        return any(not m.done for m in _entry_monitors(entry))

    def entry_plan(entry, rays_per_iter: int) -> int:
        # exact (non-pow4) chunks: the dispatch shape is the size-bucketed
        # block count, so chunk granularity costs no extra compiles here,
        # and reaching each checkpoint in ONE round minimizes round-trips.
        # Under round pipelining itr_next runs one dispatched-but-unconsumed
        # round ahead of iters_done; planning then measures from the
        # HYPOTHETICAL position "in-flight round consumed, nothing
        # converged, projections unmoved" — the round we would run next in
        # that case. With nothing in flight this is exactly the sequential
        # plan (h == iters_done).
        itr_next = entry["run"].itr_next
        return max(
            plan_chunk(
                max(m.iters_done, itr_next),
                min_iters=m.min_iters,
                interval=m.interval,
                max_iters=m.max_iters,
                rays_per_iter=rays_per_iter,
                projected_total=m.projected_total(),
                pow4=False,
            )
            for m in _entry_monitors(entry)
            if not m.done
        )

    # XLA rounds never materialize rays (fused per block); Pallas rounds do,
    # so their block budget is capped at one materialized TARGET_CHUNK_RAYS.
    # Read via the config module so tests can shrink the budget.
    from . import config as _cfg

    max_blocks = max(
        _cfg.SCHED_MIN_BLOCKS,
        _cfg.TARGET_CHUNK_RAYS // RAY_BLOCK * (1 if use_pallas else 8),
    )
    pending = [e for e in entries if entry_pending(e)]
    if use_pallas:
        # An emitter whose SINGLE iteration exceeds the materialized-ray
        # budget can never fit a Pallas round: leave it pending for the
        # per-emitter drivers, which bound rays per dispatch. Forcing it in
        # (the old max(1, ...) budget floor) compiled rounds of several
        # times the ray budget — a compile-time HBM OOM at city scale
        # (e.g. 126 emitters + a 10M-ray/iteration ground plane).
        fits = lambda e: int(n_pad[e["idx"]]) // RAY_BLOCK <= max_blocks
        dropped = [e for e in pending if not fits(e)]
        if dropped:
            pending = [e for e in pending if fits(e)]
            # these entries run pipelined (sharded over the mesh when one
            # is given), where the scheduled-regime kernel override no
            # longer applies — re-resolve for them
            k2, i2 = _resolve_kernel(
                pack_dev, mesh, prepared_solver.total_faces,
                scheduled=False,
            )
            for e in dropped:
                e["run"].kernel, e["run"].interpret = k2, i2
    # Compiled-variant economy: each dispatch specializes on THREE shape
    # axes — the schedule rows (nb), the compacted emitter stack (n_round)
    # and the CP rows (n_cp). Two are collapsed: n_round is clamped to a
    # solve-level constant (pending only shrinks, and extra stack rows are
    # never referenced by the schedule — exact), and n_cp is tied to nb
    # (every iteration occupies >= 1 schedule row, so nb rows always
    # suffice; the padded CP upload is smaller than the schedule itself).
    # nb stays the round's bucketed block count — padding IT to a constant
    # would add dummy raygen+sweep work to every late round — and the
    # remaining nb bucket series is AOT-compiled in the background on
    # accelerators (_sched_precompile), so a cold solve pays one blocking
    # compile instead of one per distinct round size. The round-3 canyon
    # measured 5 distinct (nb, n_round, n_cp) programs; with this it
    # compiles 1 in line.
    n_round_solve = _sched_size(len(pending) + 1, lo=2)
    precompiled = {"started": False}

    def maybe_precompile(fn, args, kw, nb0: int) -> None:
        # fire once, after the first (in-line) compile of the solve: warm
        # the WHOLE nb bucket series up to the round budget (later rounds
        # are often LARGER than round 0 — projection-sized chunks follow
        # the small min_iters checkpoint round — so warming only below nb0
        # would leave exactly those blocking compiles in place).
        # Accelerators only — CPU-backend compiles are cheap and the
        # threads would steal test-suite cores.
        if precompiled["started"]:
            return
        precompiled["started"] = True
        if pack_dev.platform == "cpu" or not _cfg.SCHED_PRECOMPILE:
            return
        hi = max(nb0, _sched_size(max_blocks))
        series = [v for v in _sched_series(128, hi) if v != nb0]
        if series:
            _sched_precompile(fn, args, kw, series)

    # Fused multi-round dispatch (config.SCHED_FUSE_ROUNDS): plan several
    # consecutive convergence rounds into one schedule. Each fused round is
    # planned from the same hypothetical position pipelining uses (previous
    # round consumed, nothing converged, projections unmoved) — itr_next
    # advances as rounds are assembled, so the plans chain exactly.
    # Measured SLOWER than round pipelining on the tunnel v5e (see
    # config.py:SCHED_FUSE_ROUNDS for the numbers), so auto = no fusing;
    # the knob remains for extreme-latency links.
    fuse_rounds = _cfg.SCHED_FUSE_ROUNDS or 1

    def build_round(pending):
        """Plan the next convergence round(s) over ``pending`` and dispatch
        (async). Returns (device output, plan, nb) or None when no entry has
        plannable work. Advances each planned entry's ``run.itr_next``."""
        # vectorized schedule assembly: under round pipelining this host
        # code sits between dispatches, so per-row Python loops (up to 16K
        # rows/round) would serialize against device compute
        row_chunks: List[np.ndarray] = []
        cp_chunks: List[np.ndarray] = []
        n_rows = 0
        n_cps = 0
        plan: List[Tuple] = []  # (entry, start_row, bpi, n_iters)
        round_rows: Dict[int, int] = {}  # global emitter idx -> local row
        for _ in range(fuse_rounds):
            progressed = False
            for entry in pending:
                run = entry["run"]
                e = entry["idx"]
                bpi = int(n_pad[e]) // RAY_BLOCK
                if n_rows and n_rows + bpi > max_blocks:
                    # not even one iteration fits this round; the entry stays
                    # pending and leads the next round (rounds never overshoot
                    # max_blocks, which for Pallas bounds materialized rays)
                    continue
                budget = max(1, (max_blocks - n_rows) // max(1, bpi))
                chunk = min(entry_plan(entry, int(n_pad[e])), budget)
                if chunk <= 0:
                    continue
                local_e = round_rows.setdefault(e, len(round_rows))
                start_row = n_rows
                cp_chunks.append(
                    _cp_rows(run.seed, run.idx_emit, run.itr_next, chunk)
                )
                b_off = np.arange(bpi, dtype=np.int32) * RAY_BLOCK
                rows_e = np.empty((chunk, bpi, 4), dtype=np.int32)
                rows_e[..., 0] = local_e
                rows_e[..., 1] = n_cps + np.arange(chunk, dtype=np.int32)[:, None]
                rows_e[..., 2] = int(offsets[e]) + b_off[None, :]
                rows_e[..., 3] = b_off[None, :]
                row_chunks.append(rows_e.reshape(-1, 4))
                n_rows += chunk * bpi
                n_cps += chunk
                run.itr_next += chunk
                plan.append((entry, start_row, bpi, chunk))
                progressed = True
                if n_rows >= max_blocks:
                    break
            if not progressed or n_rows >= max_blocks:
                break
        if not plan:
            return None

        # compacted per-round emitter stacks: scheduled_trace only computes
        # masks for emitters this round references. One extra all-inactive
        # DUMMY row absorbs schedule padding: its surface mask is all-zero,
        # so every padding block's tile loop skips everything (pow2-padding
        # a 1176-row round to 2048 used to re-trace block 0 in 872 blocks —
        # 43% of the dispatch's pair math, now ~free). The stack size is the
        # solve-level constant (variant economy, see above).
        by_entry = {entry["idx"]: entry for entry, *_ in plan}
        n_round = n_round_solve
        dummy_row = n_round - 1  # zero-initialized: all surfaces inactive
        surf_b = np.zeros((n_round, n_surf + 1), dtype=np.int32)
        emit_b = np.zeros(n_round, dtype=np.int32)
        min_b = np.zeros(n_round, dtype=np.int32)
        once_b = np.zeros(n_round, dtype=np.int32)
        plane_b = np.zeros((n_round, 8), dtype=np.float32)
        sel = np.zeros(n_round, dtype=np.int32)
        for e, local_e in round_rows.items():
            entry = by_entry[e]
            sel[local_e] = e
            surf_b[local_e, :-1] = entry["surf_active"]
            emit_b[local_e] = entry["emit_sid"]
            min_b[local_e] = entry["min_sid"]
            once_b[local_e] = entry["run"].em_pack.n_rays_once
            plane_b[local_e] = entry["run"].em_pack.plane_host

        nb = _sched_size(n_rows)
        if nb % n_dev:  # non-power-of-two meshes: round up to a multiple
            nb = ((nb + n_dev - 1) // n_dev) * n_dev
        # n_cp tied to nb (not a third variant axis): every iteration
        # occupies at least one schedule row
        n_cp = max(8, nb)
        schedule = np.zeros((nb, 4), dtype=np.int32)
        schedule[:n_rows] = np.concatenate(row_chunks)
        schedule[n_rows:] = np.asarray(
            [dummy_row, 0, 0, 0], dtype=np.int32
        )
        cp = np.zeros((n_cp, 7), dtype=np.float32)
        cp[:n_cps] = np.concatenate(cp_chunks)

        # geometry stays the full device-resident stack; the (tiny) per-round
        # compaction gather runs inside the jitted program (``sel``) instead
        # of as 8 separate host-driven device ops per round
        args = (
            scene_t, tables_flat, geom_stacked, jnp.asarray(cp),
            jnp.asarray(surf_b), jnp.asarray(emit_b), jnp.asarray(min_b),
            jnp.asarray(once_b), jnp.asarray(plane_b),
            jnp.asarray(schedule), scene_pack.accel, jnp.asarray(sel),
        )
        if mesh is not None:
            from .parallel.sharding import scheduled_trace_sharded

            out = scheduled_trace_sharded(
                mesh, *args,
                sched_block=RAY_BLOCK,
                ray_block=pallas_block if use_pallas else RAY_BLOCK,
                tri_tile=PALLAS_TRI_TILE if use_pallas else scene_pack.tri_tile,
                want_matrix=want_matrix,
                want_any=want_any,
                discrete=discrete,
                kernel=kernel,
                interpret=interpret,
            )
        elif use_pallas:
            kw = dict(
                sched_block=RAY_BLOCK,
                ray_block=pallas_block,
                tri_tile=PALLAS_TRI_TILE,
                want_matrix=want_matrix,
                want_any=want_any,
                discrete=discrete,
                interpret=interpret,
                pack_out=True,
            )
            out = scheduled_trace_pallas(*args, **kw)
            maybe_precompile(scheduled_trace_pallas, args, kw, nb)
        else:
            kw = dict(
                ray_block=RAY_BLOCK,
                tri_tile=scene_pack.tri_tile,
                want_matrix=want_matrix,
                want_any=want_any,
                discrete=discrete,
                pack_out=True,
            )
            out = scheduled_trace(*args, **kw)
            maybe_precompile(scheduled_trace, args, kw, nb)
        return out, plan, nb

    def consume_round(round_):
        out, plan, nb = round_
        if mesh is not None:
            host = {k: np.asarray(v) for k, v in out.items()}
        else:
            # ONE packed D2H fetch per round instead of one blocking RPC per
            # output array (~35-100 ms each on a remote-tunnel TPU)
            host = unpack_outputs(
                np.asarray(out), nb, n_surf,
                want_matrix=want_matrix, want_any=want_any, discrete=discrete,
            )
        for entry, start_row, bpi, chunk in plan:
            consume(entry, host, start_row, bpi, chunk)
            if not entry_pending(entry):
                _entry_done(entry)
            else:
                _entry_progress(entry)

    # Round pipeline: with SCHED_PIPELINE, round k+1 is planned (from the
    # monitors' projected totals, continuing the absolute-indexed iteration
    # stream) and DISPATCHED before round k's results are fetched, so device
    # compute and the per-round host RPC overlap the float64 replay. An
    # emitter that converges in round k simply has its round-k+1 iterations
    # discarded by the replay — results are bitwise-identical to the
    # sequential schedule (each block's histogram depends only on its own
    # rays). The generalization of the reference's multi-stream overlap
    # (reference: main.py:901-1022) to whole-scene rounds.
    pipeline = _cfg.SCHED_PIPELINE > 0
    inflight = None
    while True:
        nxt = build_round(pending) if pending else None
        if nxt is None and inflight is None:
            if pending:
                # nothing plannable and nothing in flight: these entries can
                # never finish (e.g. monitors at max_iters whose replay never
                # ran) — close them out exactly like the sequential driver
                for entry in pending:
                    for m in _entry_monitors(entry):
                        m.done = True
                    _entry_done(entry)
            break
        if not pipeline and nxt is not None:
            # sequential mode: fetch each round before planning the next
            consume_round(nxt)
            pending = [e for e in pending if entry_pending(e)]
            continue
        if inflight is not None:
            if any(entry_pending(e) for e, *_ in inflight[1]):
                consume_round(inflight)
                pending = [e for e in pending if entry_pending(e)]
            # else: every emitter in the round converged while it was in
            # flight — pure speculative overshoot, dropped WITHOUT the
            # blocking fetch (the replay would discard every iteration)
        inflight = nxt


def _drive_matrix_scheduled(entries, prepared_solver, p, flip_faces, align,
                            scene_pack, pack_dev, n_meshes: int, *,
                            kernel: str = "xla",
                            interpret: bool = False, mesh=None) -> None:
    def consume(entry, host, start_row, bpi, chunk):
        mon = entry["monitor"]
        for c in range(chunk):
            if mon.done:
                break
            r0 = start_row + c * bpi
            mon.consume_iteration(
                host["counts_f"][r0 : r0 + bpi].sum(axis=0),
                host["counts_b"][r0 : r0 + bpi].sum(axis=0),
            )
        # never rewind: under round pipelining itr_next may already cover a
        # dispatched-but-unconsumed speculative round (sequentially this is
        # the plain iters_done for pending entries, and done entries'
        # overshoot is discarded either way)
        entry["run"].itr_next = max(entry["run"].itr_next, mon.iters_done)

    _drive_scheduled(
        entries, prepared_solver, p, flip_faces, align, scene_pack, pack_dev,
        n_meshes, want_matrix=True, want_any=False, discrete=False,
        consume=consume, kernel=kernel, interpret=interpret, mesh=mesh,
    )


def _drive_sky_scheduled(entries, prepared_solver, p, align, scene_pack,
                         pack_dev, n_meshes: int, *, discrete: bool,
                         kernel: str = "xla",
                         interpret: bool = False, mesh=None) -> None:
    def consume(entry, host, start_row, bpi, chunk):
        mon = entry["monitor"]
        for c in range(chunk):
            if mon.done:
                break
            r0 = start_row + c * bpi
            mon.consume_iteration(
                host["sky_bins"][r0 : r0 + bpi].sum(axis=0)
                if discrete
                else int(host["upward"][r0 : r0 + bpi].sum())
            )
        # never rewind (see _drive_matrix_scheduled.consume)
        entry["run"].itr_next = max(entry["run"].itr_next, mon.iters_done)

    _drive_scheduled(
        entries, prepared_solver, p, False, align, scene_pack, pack_dev,
        n_meshes, want_matrix=False, want_any=True, discrete=discrete,
        consume=consume, kernel=kernel, interpret=interpret, mesh=mesh,
    )


def _drive_combined_scheduled(entries, prepared_solver, p, align, scene_pack,
                              pack_dev, n_meshes: int, *, discrete: bool,
                              kernel: str = "xla",
                              interpret: bool = False, mesh=None) -> None:
    """Scheduled shared-ray workflow: both outputs computed for every block
    (simple single compiled program); each monitor consumes only while
    pending, exactly the dual-monitor replay of _drive_combined_pipelined."""

    def consume(entry, host, start_row, bpi, chunk):
        m = entry.get("matrix_mon")
        s = entry.get("sky_mon")
        entry.setdefault("trace_iters", 0)
        for c in range(chunk):
            r0 = start_row + c * bpi
            used = False
            if m is not None and not m.done:
                m.consume_iteration(
                    host["counts_f"][r0 : r0 + bpi].sum(axis=0),
                    host["counts_b"][r0 : r0 + bpi].sum(axis=0),
                )
                used = True
            if s is not None and not s.done:
                s.consume_iteration(
                    host["sky_bins"][r0 : r0 + bpi].sum(axis=0)
                    if discrete
                    else int(host["upward"][r0 : r0 + bpi].sum())
                )
                used = True
            if used:
                entry["trace_iters"] = max(
                    entry["trace_iters"],
                    m.iters_done if m is not None else 0,
                    s.iters_done if s is not None else 0,
                )
        # never rewind (see _drive_matrix_scheduled.consume)
        entry["run"].itr_next = max(entry["run"].itr_next, entry["trace_iters"])

    _drive_scheduled(
        entries, prepared_solver, p, False, align, scene_pack, pack_dev,
        n_meshes, want_matrix=True, want_any=True, discrete=discrete,
        consume=consume, kernel=kernel, interpret=interpret, mesh=mesh,
    )


def _consume_matrix(mon, host, e_idx, k):
    mon.consume_iteration(host["counts_f"][e_idx, k], host["counts_b"][e_idx, k])


def _drive_matrix_grouped(entries) -> None:
    _drive_grouped(
        entries, want_matrix=True, want_any=False, discrete=False,
        consume=_consume_matrix,
    )


def _drive_sky_grouped(entries, *, discrete: bool) -> None:
    def consume(mon, host, e_idx, k):
        mon.consume_iteration(
            host["sky_bins"][e_idx, k] if discrete else int(host["upward"][e_idx, k])
        )

    _drive_grouped(
        entries, want_matrix=False, want_any=True, discrete=discrete,
        consume=consume,
    )


def _drive_pipelined(entries, *, want_matrix: bool, want_any: bool,
                     discrete: bool, consume, depth: int = 3) -> None:
    """Round-robin single-output solves with pipelined dispatch.

    The TPU analogue of the reference's multi-stream emitter batching
    (reference: main.py:901-1022): up to ``depth`` emitters have a chunk in
    flight at once, so the host-side float64 replay and RNG generation of
    one emitter overlap device compute of the others. Results are identical
    to the sequential driver — the per-iteration replay is unchanged.

    ``entries`` is a list of dicts with keys ``run`` (_EmitterRun) and
    ``monitor``; monitors are driven to completion in place.
    """
    from collections import deque

    queue = deque(e for e in entries if not e["monitor"].done)
    inflight: deque = deque()

    while queue or inflight:
        while queue and len(inflight) < depth:
            entry = queue.popleft()
            mon = entry["monitor"]
            chunk = plan_chunk(
                mon.iters_done,
                min_iters=mon.min_iters,
                interval=mon.interval,
                max_iters=mon.max_iters,
                rays_per_iter=entry["run"].em_pack.n_rays_pad,
                projected_total=mon.projected_total(),
            )
            if chunk <= 0:
                mon.done = True
                _entry_done(entry)
                continue
            out = entry["run"].dispatch_chunk(
                chunk, want_matrix=want_matrix, want_any=want_any,
                discrete=discrete,
            )
            inflight.append((entry, out, chunk))
        if not inflight:
            break
        entry, out, chunk = inflight.popleft()
        host = {k: np.asarray(v) for k, v in out.items()}
        mon = entry["monitor"]
        for k in range(chunk):
            if mon.done:
                break
            consume(mon, host, k)
        # rewind past discarded speculative iterations
        entry["run"].itr_next = mon.iters_done
        if mon.done:
            _entry_done(entry)
        else:
            _entry_progress(entry)
            queue.append(entry)


def _drive_matrix_pipelined(entries, *, depth: int = 3) -> None:
    _drive_pipelined(
        entries, want_matrix=True, want_any=False, discrete=False,
        consume=lambda mon, host, k: mon.consume_iteration(
            host["counts_f"][k], host["counts_b"][k]
        ),
        depth=depth,
    )


def _drive_sky_pipelined(entries, *, discrete: bool, depth: int = 3) -> None:
    _drive_pipelined(
        entries, want_matrix=False, want_any=True, discrete=discrete,
        consume=lambda mon, host, k: mon.consume_iteration(
            host["sky_bins"][k] if discrete else int(host["upward"][k])
        ),
        depth=depth,
    )


def _drive_combined_pipelined(entries, *, discrete: bool, depth: int = 3) -> None:
    """Pipelined round-robin over emitters with dual (matrix, sky) monitors.

    The shared-ray workflow analogue of :func:`_drive_pipelined`: each
    emitter's dispatch kind follows its own state machine (combined while
    both outputs are pending, then the cheaper single-output kernel), and up
    to ``depth`` emitters keep a chunk in flight. Replay semantics match
    :func:`_drive_monitors` exactly, including the speculative-rewind of the
    RNG stream shared by both outputs.

    ``entries`` carry ``run``, optional ``matrix_mon`` and ``sky_mon``, and
    accumulate ``trace_iters``.
    """
    from collections import deque

    queue = deque()
    for entry in entries:
        entry.setdefault("trace_iters", 0)
        m = entry.get("matrix_mon")
        s = entry.get("sky_mon")
        if (m is not None and not m.done) or (s is not None and not s.done):
            queue.append(entry)
    inflight: deque = deque()

    while queue or inflight:
        while queue and len(inflight) < depth:
            entry = queue.popleft()
            m = entry.get("matrix_mon")
            s = entry.get("sky_mon")
            m_pending = m is not None and not m.done
            s_pending = s is not None and not s.done
            chunk = 0
            for mon in (m, s):
                if mon is None or mon.done:
                    continue
                chunk = max(
                    chunk,
                    plan_chunk(
                        mon.iters_done,
                        min_iters=mon.min_iters,
                        interval=mon.interval,
                        max_iters=mon.max_iters,
                        rays_per_iter=entry["run"].em_pack.n_rays_pad,
                        projected_total=mon.projected_total(),
                    ),
                )
            if chunk <= 0:
                for mon in (m, s):
                    if mon is not None:
                        mon.done = True
                _entry_done(entry)
                continue
            out = entry["run"].dispatch_chunk(
                chunk, want_matrix=m_pending, want_any=s_pending,
                discrete=discrete,
            )
            inflight.append((entry, out, chunk, m_pending, s_pending))
        if not inflight:
            break
        entry, out, chunk, m_pending, s_pending = inflight.popleft()
        host = {k: np.asarray(v) for k, v in out.items()}
        m = entry.get("matrix_mon")
        s = entry.get("sky_mon")
        for k in range(chunk):
            used = False
            if m_pending and not m.done:
                m.consume_iteration(host["counts_f"][k], host["counts_b"][k])
                used = True
            if s_pending and not s.done:
                s.consume_iteration(
                    host["sky_bins"][k] if discrete else int(host["upward"][k])
                )
                used = True
            if used:
                entry["trace_iters"] = max(
                    entry["trace_iters"],
                    m.iters_done if m is not None else 0,
                    s.iters_done if s is not None else 0,
                )
        entry["run"].itr_next = entry["trace_iters"]
        m_done = m is None or m.done
        s_done = s is None or s.done
        if m_done and s_done:
            _entry_done(entry)
        else:
            _entry_progress(entry)
            queue.append(entry)


def _drive_monitors(
    run: _EmitterRun,
    matrix_mon: Optional[MatrixMonitor],
    sky_mon: Optional[SkyMonitor],
    *,
    discrete: bool,
) -> int:
    """Run chunks until all monitors are done; returns total traced iterations.

    While both outputs are pending, one combined trace feeds both monitors
    from the same per-iteration rays; once one converges, subsequent chunks
    run the cheaper single-output kernel (reference state machine:
    main.py:1352-1650).
    """
    trace_iters = 0
    while True:
        m_pending = matrix_mon is not None and not matrix_mon.done
        s_pending = sky_mon is not None and not sky_mon.done
        if not m_pending and not s_pending:
            break

        chunk = 0
        for mon in (matrix_mon, sky_mon):
            if mon is None or mon.done:
                continue
            chunk = max(
                chunk,
                plan_chunk(
                    mon.iters_done,
                    min_iters=mon.min_iters,
                    interval=mon.interval,
                    max_iters=mon.max_iters,
                    rays_per_iter=run.em_pack.n_rays_pad,
                    projected_total=mon.projected_total(),
                ),
            )
        if chunk <= 0:
            break

        out = run.run_chunk(
            chunk,
            want_matrix=m_pending,
            want_any=s_pending,
            discrete=discrete,
        )
        for k in range(chunk):
            used = False
            if m_pending and not matrix_mon.done:
                matrix_mon.consume_iteration(out["counts_f"][k], out["counts_b"][k])
                used = True
            if s_pending and not sky_mon.done:
                sky_mon.consume_iteration(
                    out["sky_bins"][k] if discrete else int(out["upward"][k])
                )
                used = True
            if used:
                trace_iters = max(
                    trace_iters,
                    matrix_mon.iters_done if matrix_mon is not None else 0,
                    sky_mon.iters_done if sky_mon is not None else 0,
                )
        # Rewind the RNG stream to the first unconsumed iteration so the next
        # chunk (possibly with a different kernel) re-traces discarded
        # speculative iterations identically.
        run.itr_next = trace_iters
    return trace_iters


class _CheckpointStore:
    """Per-emitter JSON checkpoints for resumable matrix solves.

    One file per emitter under ``dir/``, written atomically (tmp + rename).
    A config fingerprint (solver params + mesh names/face counts) guards
    against resuming with a different setup.
    """

    def __init__(self, directory: str, params_dict: Dict, meshes: List[Mesh]):
        import hashlib
        import json
        from pathlib import Path

        self._json = json
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        hasher = hashlib.sha256(
            json.dumps(
                {"params": {k: params_dict[k] for k in sorted(params_dict)}},
                sort_keys=True,
            ).encode()
        )
        # geometry content, not just shape: edited vertices must invalidate
        hash_meshes(hasher, meshes)
        self.fingerprint = hasher.hexdigest()[:16]
        self._mismatch_logged = False

    def _path(self, idx: int):
        return self.dir / f"emitter_{idx:05d}.json"

    def _note_mismatch(self, path) -> None:
        # A stale fingerprint silently re-solves from zero (params, mesh
        # content, or the fingerprint stream itself changed); say so ONCE
        # per store so a long resumed solve's restart isn't a mystery.
        if not self._mismatch_logged:
            self._mismatch_logged = True
            _emit_log(
                f"checkpoint dir {self.dir} holds entries with a different "
                "config/geometry fingerprint; ignoring them and re-solving "
                f"(first: {path.name})"
            )

    def load(self, idx: int):
        path = self._path(idx)
        if not path.exists():
            return None
        try:
            data = self._json.loads(path.read_text(encoding="utf-8"))
        except Exception:
            return None
        if data.get("fingerprint") != self.fingerprint:
            self._note_mismatch(path)
            return None
        return data

    def save(self, idx: int, name: str, row, backfill, stats, **extra) -> None:
        """``extra`` lands as additional top-level keys (e.g. the shared-ray
        workflow's ``sky=`` row); ``stats`` is reserved for stderr dicts."""
        payload = {
            "fingerprint": self.fingerprint,
            "emitter": name,
            "row": row,
            "backfill": backfill,
            "stats": stats,
            **extra,
        }
        self._write(self._path(idx), payload)
        self.clear_progress(idx)

    def _write(self, path, payload) -> None:
        import os

        # per-process tmp name: two resuming solves sharing a checkpoint dir
        # must not interleave writes before the atomic publish
        tmp = path.with_suffix(f".{os.getpid()}.tmp")
        tmp.write_text(self._json.dumps(payload, sort_keys=True), encoding="utf-8")
        tmp.replace(path)

    # -- mid-emitter progress snapshots -----------------------------------

    def _progress_path(self, idx: int):
        return self.dir / f"emitter_{idx:05d}.progress.json"

    def load_progress(self, idx: int):
        """Monitor-state snapshot of a partially converged emitter, or None."""
        path = self._progress_path(idx)
        if not path.exists():
            return None
        try:
            data = self._json.loads(path.read_text(encoding="utf-8"))
        except Exception:
            return None
        if data.get("fingerprint") != self.fingerprint:
            self._note_mismatch(path)
            return None
        return data

    def save_progress(self, idx: int, state: Dict) -> None:
        self._write(
            self._progress_path(idx), {"fingerprint": self.fingerprint, **state}
        )

    def clear_progress(self, idx: int) -> None:
        self._progress_path(idx).unlink(missing_ok=True)


# ---------------------------------------------------------------------------
# Public solvers
# ---------------------------------------------------------------------------


def view_factor_matrix(
    meshes: List[Mesh],
    params: MatrixParams,
    *,
    prepared: Optional[PreparedSolver] = None,
    mesh=None,
    return_stats: bool = False,
    checkpoint_dir: Optional[str] = None,
    row_sink=None,
):
    """Scene-to-scene view-factor matrix F(i->j) with front/back splits.

    With ``return_stats=True`` also returns ``{emitter: {receiver_key:
    stderr}}`` — the per-receiver standard error of the converged estimate.
    Emitters restored from ``checkpoint_dir`` report the stats their
    checkpoint recorded (``{}`` for checkpoints from older versions or for
    skipped emitters), so a resumed solve's stats dict can mix real stderr
    rows with empty ones. Set ``RAYSTRACK_TPU_PROFILE=<dir>`` to capture a
    jax.profiler trace of the solve.

    ``row_sink(name, row)`` is called as rows COMPLETE — pair it with
    :class:`raystrack_tpu.VFMatrixStreamWriter` to stream giant matrices to
    disk as they solve. With ``reciprocity=False`` a row is complete the
    moment its emitter converges and rows stream in completion order. With
    ``reciprocity=True`` row i also carries the transpose back-fill
    F(i->j) = F(j->i)*Aj/Ai from every earlier emitter j < i, so rows
    stream in EMITTER order, each sunk as soon as emitters 0..i have all
    converged, merged with all back-fill directed at it — the streamed
    output equals the returned matrix. (Exception: rows already finalized
    by ``enforce_reciprocity_rowsum`` post-processing are not re-sunk; the
    sink sees the raw converged rows.) Emitters restored from
    ``checkpoint_dir`` are not re-sunk — a resumed solve streams only newly
    converged rows, though restored emitters' back-fill still flows into
    the rows that are.

    ``checkpoint_dir`` makes long solves resumable: each emitter's finished
    output (its row plus any reciprocity back-fill contributions) is written
    atomically as JSON after it converges, and a restarted solve replays
    completed emitters from disk instead of re-tracing them. Checkpoints are
    keyed by the solve configuration, so a changed seed or sampling setup
    invalidates them.
    """
    if not isinstance(params, MatrixParams):
        raise TypeError("params must be a MatrixParams instance")

    p = params.as_dict()
    device = _resolve_device(p["device"])
    # reference parity: CPU solves check convergence every iteration
    # (main.py:1889); the interval only batches checks on accelerators
    interval = 1 if device.platform == "cpu" else p["convergence_interval"]
    prepared_solver = _ensure_prepared(meshes, prepared)
    use_bvh = _select_bvh(p["bvh"], prepared_solver.total_faces)
    reciprocity = bool(p["reciprocity"])
    flip_faces = bool(p["flip_faces"])

    result: VFDict = {name: {} for name, _, _ in meshes}
    stats_result: VFDict = {}
    profiler = _maybe_profiler()
    store = _CheckpointStore(checkpoint_dir, p, meshes) if checkpoint_dir else None
    emitters = prepared_solver.get_emitters(
        samples=p["samples"], rays=p["rays"], flip_faces=flip_faces
    )
    areas = [e.total_area for e in emitters] if reciprocity else None
    bounds_center, bounds_extent = prepared_solver.get_mesh_bounds()
    pack_dev, ray_dev = _placements(mesh, device)
    align = _ray_align(mesh)
    use_scheduler = _use_scheduler(device, emitters, p["rays"], align)
    scene_pack = prepared_solver.get_scene_pack(use_accel=use_bvh, device=pack_dev)
    if scene_pack.slim:
        # pack-resident scenes: the per-emitter pipelined driver reuses the
        # resident pack directly; the scheduled driver would re-assemble
        # one per round (trace.py scheduled_trace_pallas) — and at slim
        # scales the dispatch is seconds long, so per-dispatch overhead
        # (the scheduler's raison d'etre) is noise anyway
        use_scheduler = False
    kernel, interpret = _resolve_kernel(
        device, mesh, prepared_solver.total_faces,
        scheduled=use_scheduler and len(meshes) > 1, slim=scene_pack.slim,
    )

    n_surf = len(meshes)
    n_restored = 0
    # Reciprocity lands back-fill in other emitters' rows; the ordered
    # coordinator defers each sink until its row's back-fill is complete.
    ordered_sink = (
        _OrderedRowSink(row_sink, [name for name, _, _ in meshes])
        if (row_sink is not None and reciprocity)
        else None
    )
    # Phase 1: restore checkpoints / skip empty emitters, build the work list
    entries: List[Dict] = []
    for idx_emit, (name_e, _, _) in enumerate(meshes):
        if store is not None:
            saved = store.load(idx_emit)
            if saved is not None:
                result[name_e].update(saved["row"])
                for other, back_entries in saved.get("backfill", {}).items():
                    result[other].update(back_entries)
                stats_result[name_e] = saved.get("stats", {})
                n_restored += 1
                if ordered_sink is not None:
                    ordered_sink.finish(
                        idx_emit, saved["row"], saved.get("backfill", {}),
                        sink_own=False,
                    )
                _emit_log(
                    f"({idx_emit + 1}/{n_surf}) [{name_e}] restored from "
                    f"checkpoint ({len(saved['row'])} receivers)"
                )
                continue
        emitter = emitters[idx_emit]
        surf_active = _build_emitter_surface_mask(
            idx_emit, emitter, bounds_center, bounds_extent
        )
        receivers, recv_idx = _matrix_active_receivers(
            idx_emit, n_surf, reciprocity, surf_active
        )
        if not receivers:
            _emit_log(_progress_line(idx_emit, n_surf, name_e, 0, 0, 0.0, use_bvh, device))
            stats_result[name_e] = {}
            if store is not None:
                store.save(idx_emit, name_e, {}, {}, {})
            if ordered_sink is not None:
                # traces nothing itself, but its row still collects earlier
                # emitters' back-fill (e.g. the LAST emitter under
                # reciprocity, whose whole row is back-fill)
                ordered_sink.finish(idx_emit, {}, {})
            continue

        emit_sid, min_sid = _matrix_skip(idx_emit, reciprocity)
        em_pack = _make_emitter_pack(
            prepared_solver, idx_emit, p, flip_faces, align, pack_dev, ray_dev,
            lazy=use_scheduler,
        )
        run = _EmitterRun(
            scene_pack, em_pack, surf_active, emit_sid, min_sid,
            p["seed"], idx_emit, pack_dev, mesh=mesh, kernel=kernel, interpret=interpret,
        )
        monitor = MatrixMonitor(
            n_surf, recv_idx,
            n_rays_once=em_pack.n_rays_once,
            tol=p["tol"], tol_mode=p["tol_mode"],
            min_iters=p["min_iters"], interval=interval,
            max_iters=p["max_iters"],
        )
        if store is not None:
            progress = store.load_progress(idx_emit)
            if progress is not None:
                monitor.load_state(progress["monitor"])
                run.itr_next = monitor.iters_done
                _emit_log(
                    f"({idx_emit + 1}/{n_surf}) [{name_e}] resuming from "
                    f"iteration {monitor.iters_done}"
                )
        entries.append(
            dict(run=run, monitor=monitor, idx=idx_emit, name=name_e,
                 receivers=receivers, surf_active=surf_active,
                 emit_sid=emit_sid, min_sid=min_sid)
        )

    def _assemble(entry) -> None:
        """Build the emitter's row/backfill/stats and checkpoint it.

        Runs from the schedulers' completion hook the moment the emitter
        converges, so a preempted long solve keeps every finished emitter.
        """
        idx_emit, name_e = entry["idx"], entry["name"]
        monitor, receivers = entry["monitor"], entry["receivers"]
        se_f = monitor.wf.stderr()
        se_b = monitor.wb.stderr()
        row: Dict[str, float] = {}
        stats_row: Dict[str, float] = {}
        backfill: Dict[str, Dict[str, float]] = {}
        total = float(monitor.total_rays)
        for j in receivers:
            name_r = meshes[j][0]
            f = monitor.hits_f[j] / total
            b = monitor.hits_b[j] / total
            if f > 0.0:
                row[f"{name_r}_front"] = f
                stats_row[f"{name_r}_front"] = float(se_f[j])
                if reciprocity and areas is not None and areas[j] > 0.0:
                    back = f * (areas[idx_emit] / areas[j])
                    backfill.setdefault(name_r, {})[f"{name_e}_front"] = back
            if b > 0.0:
                row[f"{name_r}_back"] = b
                stats_row[f"{name_r}_back"] = float(se_b[j])
        entry["row"] = row
        entry["stats"] = stats_row
        entry["backfill"] = backfill
        if store is not None:
            store.save(idx_emit, name_e, row, backfill, stats_row)
        if ordered_sink is not None:
            ordered_sink.finish(idx_emit, row, backfill)
        elif row_sink is not None:
            row_sink(name_e, row)

    t_solve = time.time()
    for entry in entries:
        entry["started"] = t_solve
        entry["on_done"] = _assemble
        if store is not None:
            entry["on_progress"] = lambda e: store.save_progress(
                e["idx"], {"monitor": e["monitor"].state_dict()}
            )
        if entry["monitor"].done:
            # a progress snapshot taken after convergence but before the
            # full checkpoint landed: assemble immediately, trace nothing
            _entry_done(entry)

    # Phase 2: whole-scene scheduled dispatches when possible, then the
    # pipelined per-emitter driver for anything left (single emitters,
    # Pallas-swept scenes, device-mesh solves)
    kernel, interpret = _rescope_kernel(
        entries, kernel, interpret, device, mesh,
        prepared_solver.total_faces, use_scheduler, slim=scene_pack.slim,
    )
    with profiler("matrix_solve"):
        if len(entries) > 1:
            if use_scheduler:
                _drive_matrix_scheduled(
                    entries, prepared_solver, p, flip_faces, align,
                    scene_pack, pack_dev, n_surf,
                    kernel=kernel, interpret=interpret, mesh=mesh,
                )
            elif mesh is None and kernel == "xla":
                _drive_matrix_grouped(entries)
        _drive_matrix_pipelined(entries)
    solve_s = time.time() - t_solve

    # Phase 3: merge rows into the result in emitter order
    for entry in entries:
        idx_emit, name_e, monitor = entry["idx"], entry["name"], entry["monitor"]
        result[name_e].update(entry["row"])
        for name_r, back_entries in entry["backfill"].items():
            result[name_r].update(back_entries)
        stats_result[name_e] = entry["stats"]
        _emit_log(
            _progress_line(
                idx_emit, n_surf, name_e, monitor.iters_done,
                monitor.total_rays, entry.get("elapsed", solve_s), use_bvh, device,
            )
        )
    if n_restored:
        _emit_log(
            f"{n_restored}/{n_surf} emitters restored from checkpoint "
            f"(not re-traced)"
        )

    if p["enforce_reciprocity_rowsum"]:
        _enforce_reciprocity_and_rowsum(result, meshes, areas)
    if return_stats:
        return result, stats_result
    return result


def view_factor(
    sender,
    receiver,
    params: MatrixParams,
    *,
    prepared: Optional[PreparedSolver] = None,
) -> VFDict:
    """View factors from sender mesh(es) to receiver mesh(es)."""
    senders = [sender] if isinstance(sender, tuple) else list(sender)
    receivers = [receiver] if isinstance(receiver, tuple) else list(receiver)
    vf_all = view_factor_matrix(senders + receivers, params=params, prepared=prepared)
    return {name: vf_all.get(name, {}) for name in (s[0] for s in senders)}


def view_factor_to_tregenza_sky(
    meshes: List[Mesh],
    params: SkyParams,
    *,
    prepared: Optional[PreparedSolver] = None,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    return_stats: bool = False,
):
    """Sky view factor per emitter: merged 'Sky' or 145 Tregenza patches.

    ``checkpoint_dir`` makes long solves resumable exactly like
    :func:`view_factor_matrix`: each emitter's converged sky row is written
    atomically after it finishes, keyed by a fingerprint of the solve
    configuration and geometry.

    With ``return_stats=True`` also returns ``{emitter: {key: stderr}}`` —
    the standard error of each sky fraction (per patch when ``discrete``),
    matching :func:`view_factor_matrix`'s stats contract. The reference
    computes these internally but never exposes them (reference:
    main.py:2124-2174). Emitters restored from ``checkpoint_dir`` report
    whatever stats their checkpoint recorded — checkpoints written by
    older versions (or for skipped/empty emitters) carry ``{}``, so a
    resumed solve's stats dict can mix real stderr rows with empty ones.
    """
    if not isinstance(params, SkyParams):
        raise TypeError("params must be a SkyParams instance")
    if len(meshes) == 0:
        raise ValueError("meshes must not be empty")

    p = params.as_dict()
    discrete = bool(p["discrete"])
    device = _resolve_device(p["device"])
    interval = 1 if device.platform == "cpu" else p["convergence_interval"]
    prepared_solver = _ensure_prepared(meshes, prepared)
    use_bvh = _select_bvh(p["bvh"], prepared_solver.total_faces)
    emitters = prepared_solver.get_emitters(
        samples=p["samples"], rays=p["rays"], flip_faces=False
    )
    bounds_center, bounds_extent = prepared_solver.get_mesh_bounds()
    pack_dev, ray_dev = _placements(mesh, device)
    align = _ray_align(mesh)
    use_scheduler = _use_scheduler(device, emitters, p["rays"], align)
    scene_pack = prepared_solver.get_scene_pack(use_accel=use_bvh, device=pack_dev)
    if scene_pack.slim:
        use_scheduler = False  # pack-resident scenes: pipelined driver only
    kernel, interpret = _resolve_kernel(
        device, mesh, prepared_solver.total_faces,
        scheduled=use_scheduler and len(meshes) > 1, slim=scene_pack.slim,
    )

    sky_keys = (
        [f"Sky_Patch_{i}" for i in range(1, 146)] if discrete else ["Sky"]
    )
    result: VFDict = {name: {k: 0.0 for k in sky_keys} for name, _, _ in meshes}
    stats_result: VFDict = {}
    store = _CheckpointStore(checkpoint_dir, p, meshes) if checkpoint_dir else None

    n_surf = len(meshes)
    n_restored = 0
    entries: List[Dict] = []
    if n_surf > 1:
        for idx_emit, (name_e, _, _) in enumerate(meshes):
            if store is not None:
                saved = store.load(idx_emit)
                if saved is not None:
                    result[name_e].update(saved["row"])
                    stats_result[name_e] = saved.get("stats", {})
                    n_restored += 1
                    _emit_log(
                        f"({idx_emit + 1}/{n_surf}) [{name_e}] restored from "
                        f"checkpoint"
                    )
                    continue
            emitter = emitters[idx_emit]
            surf_active = _build_emitter_surface_mask(
                idx_emit, emitter, bounds_center, bounds_extent
            )
            em_pack = _make_emitter_pack(
                prepared_solver, idx_emit, p, False, align, pack_dev, ray_dev,
                lazy=use_scheduler,
            )
            run = _EmitterRun(
                scene_pack, em_pack, surf_active, idx_emit, 0,
                p["seed"], idx_emit, pack_dev, mesh=mesh, kernel=kernel,
                interpret=interpret,
            )
            monitor = SkyMonitor(
                discrete=discrete,
                n_rays_once=em_pack.n_rays_once,
                tol=p["tol"], tol_mode=p["tol_mode"],
                min_iters=p["min_iters"], interval=interval,
                max_iters=p["max_iters"],
            )
            if store is not None:
                progress = store.load_progress(idx_emit)
                if progress is not None:
                    monitor.load_state(progress["monitor"])
                    run.itr_next = monitor.iters_done
                    _emit_log(
                        f"({idx_emit + 1}/{n_surf}) [{name_e}] resuming from "
                        f"iteration {monitor.iters_done}"
                    )
            entries.append(
                dict(run=run, monitor=monitor, idx=idx_emit, name=name_e,
                     surf_active=surf_active, emit_sid=idx_emit, min_sid=0)
            )

    def _sky_row(monitor) -> Dict[str, float]:
        total = float(max(1, monitor.total_rays))
        if discrete:
            frac = monitor.counts_total.astype(np.float64) / total
            return {f"Sky_Patch_{i + 1}": float(frac[i]) for i in range(145)}
        return {"Sky": float(monitor.upward_total / total)}

    def _sky_stats(monitor) -> Dict[str, float]:
        if discrete:
            se = monitor.bins_w.stderr()
            return {f"Sky_Patch_{i + 1}": float(se[i]) for i in range(145)}
        return {"Sky": float(monitor.sky_w.stderr())}

    def _save_sky(entry) -> None:
        row = _sky_row(entry["monitor"])
        entry["row"] = row
        entry["stats"] = _sky_stats(entry["monitor"])
        if store is not None:
            store.save(entry["idx"], entry["name"], row, {}, entry["stats"])

    t_solve = time.time()
    for entry in entries:
        entry["started"] = t_solve
        entry["on_done"] = _save_sky
        if store is not None:
            entry["on_progress"] = lambda e: store.save_progress(
                e["idx"], {"monitor": e["monitor"].state_dict()}
            )
        if entry["monitor"].done:
            _entry_done(entry)
    kernel, interpret = _rescope_kernel(
        entries, kernel, interpret, device, mesh,
        prepared_solver.total_faces, use_scheduler, slim=scene_pack.slim,
    )
    if len(entries) > 1:
        if use_scheduler:
            _drive_sky_scheduled(
                entries, prepared_solver, p, align, scene_pack, pack_dev,
                n_surf, discrete=discrete, kernel=kernel, interpret=interpret,
                mesh=mesh,
            )
        elif mesh is None and kernel == "xla":
            _drive_sky_grouped(entries, discrete=discrete)
    _drive_sky_pipelined(entries, discrete=discrete)
    solve_s = time.time() - t_solve

    for entry in entries:
        idx_emit, name_e, monitor = entry["idx"], entry["name"], entry["monitor"]
        result[name_e].update(entry["row"])
        stats_result[name_e] = entry.get("stats", {})

        _emit_log(
            _progress_line(
                idx_emit, n_surf, name_e, monitor.iters_done,
                monitor.total_rays, entry.get("elapsed", solve_s), use_bvh, device,
            )
        )
    if n_restored:
        _emit_log(
            f"{n_restored}/{n_surf} emitters restored from checkpoint "
            f"(not re-traced)"
        )

    if return_stats:
        return result, stats_result
    return result


def outside_workflow_shareable(matrix_params: MatrixParams, sky_params: SkyParams) -> bool:
    """True when one traced ray set can serve both matrix and sky solves.

    Requires identical ray-generation and execution settings (samples, rays,
    seed, bvh, device, cuda_async, gpu_raygen) and ``flip_faces=False`` on
    the matrix side (the sky solve assumes outward emission).
    """
    if bool(matrix_params.flip_faces):
        return False
    shared = ("samples", "rays", "seed", "bvh", "device", "cuda_async", "gpu_raygen")
    return all(getattr(matrix_params, k) == getattr(sky_params, k) for k in shared)


def view_factor_matrix_and_sky(
    meshes: List[Mesh],
    *,
    matrix_params: MatrixParams,
    sky_params: SkyParams,
    prepared: Optional[PreparedSolver] = None,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    return_stats: bool = False,
):
    """Compute the scene matrix and sky VF from one shared set of rays.

    Per emitter/iteration one ray set is traced once; scene hits feed the
    matrix, rays missing all geometry feed the sky bins. Matrix and sky
    convergence are independent — when one side finishes, tracing continues
    with the cheaper single-output kernel using the same iteration stream.

    With ``return_stats=True`` also returns ``{emitter: {key: stderr}}``
    covering BOTH outputs in one row — receiver keys (``name_front`` /
    ``name_back``) carry the matrix estimate's standard error and sky keys
    (``Sky`` / ``Sky_Patch_i``) the sky fraction's, matching
    :func:`view_factor_matrix` and :func:`view_factor_to_tregenza_sky`
    (the key namespaces never collide). Emitters restored from
    ``checkpoint_dir`` report whatever stats their checkpoint recorded
    (``{}`` for checkpoints from older versions).

    ``checkpoint_dir`` makes long solves resumable like
    :func:`view_factor_matrix`: each emitter's converged matrix row,
    reciprocity back-fill and sky row are written atomically the moment both
    outputs finish, keyed by a fingerprint of BOTH parameter sets and the
    geometry, and a restarted solve replays completed emitters from disk.
    The sky row is stored under its own ``sky`` key; checkpoints written by
    older versions (which parked it in the ``stats`` slot) are migrated on
    load, so existing checkpoint directories resume without re-solving.
    """
    if not isinstance(matrix_params, MatrixParams):
        raise TypeError("matrix_params must be a MatrixParams instance")
    if not isinstance(sky_params, SkyParams):
        raise TypeError("sky_params must be a SkyParams instance")
    if not outside_workflow_shareable(matrix_params, sky_params):
        raise ValueError("matrix_params and sky_params are not compatible for shared tracing")

    mp = matrix_params.as_dict()
    sp = sky_params.as_dict()
    store = (
        _CheckpointStore(
            checkpoint_dir,
            {**{f"m.{k}": v for k, v in mp.items()},
             **{f"s.{k}": v for k, v in sp.items()}},
            meshes,
        )
        if checkpoint_dir
        else None
    )
    discrete = bool(sp["discrete"])
    reciprocity = bool(mp["reciprocity"])
    device = _resolve_device(mp["device"])
    prepared_solver = _ensure_prepared(meshes, prepared)
    use_bvh = _select_bvh(mp["bvh"], prepared_solver.total_faces)
    emitters = prepared_solver.get_emitters(
        samples=mp["samples"], rays=mp["rays"], flip_faces=False
    )
    areas = [e.total_area for e in emitters] if reciprocity else None
    bounds_center, bounds_extent = prepared_solver.get_mesh_bounds()
    pack_dev, ray_dev = _placements(mesh, device)
    align = _ray_align(mesh)
    use_scheduler = _use_scheduler(device, emitters, mp["rays"], align)
    scene_pack = prepared_solver.get_scene_pack(use_accel=use_bvh, device=pack_dev)
    if scene_pack.slim:
        use_scheduler = False  # pack-resident scenes: pipelined driver only
    kernel, interpret = _resolve_kernel(
        device, mesh, prepared_solver.total_faces,
        scheduled=use_scheduler and len(meshes) > 1, slim=scene_pack.slim,
    )

    vf_scene: VFDict = {name: {} for name, _, _ in meshes}
    sky_keys = [f"Sky_Patch_{i}" for i in range(1, 146)] if discrete else ["Sky"]
    sky_vf: VFDict = {name: {k: 0.0 for k in sky_keys} for name, _, _ in meshes}
    stats_result: VFDict = {}

    n_surf = len(meshes)
    n_restored = 0
    entries: List[Dict] = []
    for idx_emit, (name_e, _, _) in enumerate(meshes):
        if store is not None:
            saved = store.load(idx_emit)
            if saved is not None:
                vf_scene[name_e].update(saved["row"])
                for other, back_entries in saved.get("backfill", {}).items():
                    vf_scene[other].update(back_entries)
                if "sky" in saved:
                    sky_vf[name_e].update(saved["sky"])
                    # the stats slot carries a legacy "sky" duplicate so
                    # pre-round-4 readers can still restore the sky row
                    # from these files; strip it from the stderr dict
                    stats_result[name_e] = {
                        k: v
                        for k, v in saved.get("stats", {}).items()
                        if k != "sky"
                    }
                else:
                    # pre-round-4 schema parked the sky row in the stats slot
                    sky_vf[name_e].update(saved.get("stats", {}).get("sky", {}))
                    stats_result[name_e] = {}
                n_restored += 1
                _emit_log(
                    f"({idx_emit + 1}/{n_surf}) [{name_e}] restored from "
                    f"checkpoint"
                )
                continue
        emitter = emitters[idx_emit]
        surf_active = _build_emitter_surface_mask(
            idx_emit, emitter, bounds_center, bounds_extent
        )
        receivers, recv_idx = _matrix_active_receivers(
            idx_emit, n_surf, reciprocity, surf_active
        )
        emit_sid, matrix_min_sid = _matrix_skip(idx_emit, reciprocity)
        em_pack = _make_emitter_pack(
            prepared_solver, idx_emit, mp, False, align, pack_dev, ray_dev,
            lazy=use_scheduler,
        )
        run = _EmitterRun(
            scene_pack, em_pack, surf_active, emit_sid, matrix_min_sid,
            mp["seed"], idx_emit, pack_dev, mesh=mesh, kernel=kernel, interpret=interpret,
        )
        matrix_mon = (
            MatrixMonitor(
                n_surf, recv_idx,
                n_rays_once=em_pack.n_rays_once,
                tol=mp["tol"], tol_mode=mp["tol_mode"],
                min_iters=mp["min_iters"],
                interval=1 if device.platform == "cpu" else mp["convergence_interval"],
                max_iters=mp["max_iters"],
            )
            if receivers
            else None
        )
        sky_mon = SkyMonitor(
            discrete=discrete,
            n_rays_once=em_pack.n_rays_once,
            tol=sp["tol"], tol_mode=sp["tol_mode"],
            min_iters=sp["min_iters"],
            interval=1 if device.platform == "cpu" else sp["convergence_interval"],
            max_iters=sp["max_iters"],
        )
        if store is not None:
            progress = store.load_progress(idx_emit)
            if progress is not None:
                if matrix_mon is not None and progress.get("matrix") is not None:
                    matrix_mon.load_state(progress["matrix"])
                sky_mon.load_state(progress["sky"])
                trace_iters = max(
                    matrix_mon.iters_done if matrix_mon is not None else 0,
                    sky_mon.iters_done,
                )
                run.itr_next = trace_iters
                _emit_log(
                    f"({idx_emit + 1}/{n_surf}) [{name_e}] resuming from "
                    f"iteration {trace_iters}"
                )
        entries.append(
            dict(run=run, matrix_mon=matrix_mon, sky_mon=sky_mon,
                 idx=idx_emit, name=name_e, receivers=receivers,
                 surf_active=surf_active, emit_sid=emit_sid,
                 min_sid=matrix_min_sid)
        )
        entries[-1]["trace_iters"] = run.itr_next

    def _assemble(entry) -> None:
        """Build the emitter's matrix row, back-fill and sky row; checkpoint
        immediately so a preempted workflow keeps every finished emitter."""
        idx_emit, name_e = entry["idx"], entry["name"]
        matrix_mon, sky_mon = entry["matrix_mon"], entry["sky_mon"]
        row: Dict[str, float] = {}
        stats_row: Dict[str, float] = {}
        backfill: Dict[str, Dict[str, float]] = {}
        sky_row: Dict[str, float] = {}

        if matrix_mon is not None and matrix_mon.total_rays > 0:
            total = float(matrix_mon.total_rays)
            se_f = matrix_mon.wf.stderr()
            se_b = matrix_mon.wb.stderr()
            for j in entry["receivers"]:
                name_r = meshes[j][0]
                f = matrix_mon.hits_f[j] / total
                b = matrix_mon.hits_b[j] / total
                if f > 0.0:
                    row[f"{name_r}_front"] = f
                    stats_row[f"{name_r}_front"] = float(se_f[j])
                    if reciprocity and areas is not None and areas[j] > 0.0:
                        backfill.setdefault(name_r, {})[f"{name_e}_front"] = (
                            f * (areas[idx_emit] / areas[j])
                        )
                if b > 0.0:
                    row[f"{name_r}_back"] = b
                    stats_row[f"{name_r}_back"] = float(se_b[j])

        if sky_mon.total_rays > 0:
            total = float(sky_mon.total_rays)
            if discrete:
                frac = sky_mon.counts_total.astype(np.float64) / total
                se = sky_mon.bins_w.stderr()
                sky_row = {f"Sky_Patch_{i + 1}": float(frac[i]) for i in range(145)}
                stats_row.update(
                    {f"Sky_Patch_{i + 1}": float(se[i]) for i in range(145)}
                )
            else:
                sky_row = {"Sky": float(sky_mon.upward_total / total)}
                stats_row["Sky"] = float(sky_mon.sky_w.stderr())

        entry["row"] = row
        entry["stats"] = stats_row
        entry["backfill"] = backfill
        entry["sky_row"] = sky_row
        if store is not None:
            # top-level "sky" is the schema; the duplicate inside stats
            # keeps the file readable by pre-round-4 builds (their restore
            # reads stats["sky"]) — same fingerprint, both directions work
            store.save(
                idx_emit, name_e, row, backfill,
                {**stats_row, "sky": sky_row}, sky=sky_row,
            )

    t_solve = time.time()
    for entry in entries:
        entry["started"] = t_solve
        entry["on_done"] = _assemble
        if store is not None:
            entry["on_progress"] = lambda e: store.save_progress(
                e["idx"],
                {
                    "matrix": (
                        None if e["matrix_mon"] is None
                        else e["matrix_mon"].state_dict()
                    ),
                    "sky": e["sky_mon"].state_dict(),
                },
            )
        m, s = entry["matrix_mon"], entry["sky_mon"]
        if (m is None or m.done) and s.done:
            _entry_done(entry)
    kernel, interpret = _rescope_kernel(
        entries, kernel, interpret, device, mesh,
        prepared_solver.total_faces, use_scheduler, slim=scene_pack.slim,
    )
    if len(entries) > 1 and use_scheduler:
        _drive_combined_scheduled(
            entries, prepared_solver, mp, align, scene_pack, pack_dev,
            n_surf, discrete=discrete, kernel=kernel, interpret=interpret,
            mesh=mesh,
        )
    _drive_combined_pipelined(entries, discrete=discrete)
    solve_s = time.time() - t_solve

    for entry in entries:
        idx_emit, name_e = entry["idx"], entry["name"]
        matrix_mon, sky_mon = entry["matrix_mon"], entry["sky_mon"]
        trace_iters = entry["trace_iters"]
        em_pack = entry["run"].em_pack

        vf_scene[name_e].update(entry["row"])
        for name_r, back_entries in entry["backfill"].items():
            vf_scene[name_r].update(back_entries)
        sky_vf[name_e].update(entry["sky_row"])
        stats_result[name_e] = entry.get("stats", {})

        matrix_iters = matrix_mon.iters_done if matrix_mon is not None else 0
        _emit_log(
            f"({idx_emit + 1}/{n_surf}) [{name_e}] traced {trace_iters} iter, "
            f"{trace_iters * em_pack.n_rays_once:,} rays -> "
            f"{entry.get('elapsed', solve_s):0.3f}s  "
            f"(scene={matrix_iters} iter, sky={sky_mon.iters_done} iter, "
            f"BVH={'builtin' if use_bvh else 'off'}, device={_device_label(device)})"
        )
    if n_restored:
        _emit_log(
            f"{n_restored}/{n_surf} emitters restored from checkpoint "
            f"(not re-traced)"
        )

    if return_stats:
        return vf_scene, sky_vf, stats_result
    return vf_scene, sky_vf


def _ray_align(mesh) -> int:
    """Per-emitter ray padding alignment: block size times device count."""
    if mesh is None:
        return RAY_BLOCK
    return RAY_BLOCK * int(np.prod([mesh.shape[k] for k in mesh.shape]))


def _placements(mesh, device):
    """(replicated placement, ray-axis placement) for device packs."""
    if mesh is None:
        return device, device
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    return NamedSharding(mesh, P()), NamedSharding(mesh, P(axis))


def _resolve_kernel(
    device, mesh, n_tri: int = 0, *, scheduled: bool = False,
    slim: bool = False
) -> Tuple[str, bool]:
    """(sweep kernel name, interpret flag) for this device/mesh combo.

    The Pallas sweep holds the triangle-operand pack VMEM-resident up to
    PALLAS_MAX_TRIS and streams it from HBM (double-buffered tile DMA)
    beyond that, so "auto" prefers it for every sweep-dominated scene.
    With ``scheduled`` (the whole-scene one-dispatch-per-round driver will
    run) "auto" picks Pallas regardless of scene size: the XLA scheduled
    trace lax.maps tiny per-block programs whose step overhead dominates
    small scenes, while the Pallas grid amortizes it (canyon, 22 tris:
    2.09 s -> 1.86 s measured).

    ``slim`` (the scene pack is pack-resident — prepared.pack_scene slim
    mode) FORCES the Pallas sweep: the pack IS its operand format and the
    per-triangle arrays the XLA sweep needs were never uploaded.
    """
    from .config import KERNEL, PALLAS_MIN_TRIS

    # Under a mesh the "device" argument may be a placement (NamedSharding)
    # rather than a Device — the mesh's devices carry the platform then.
    platform = (
        next(iter(mesh.devices.flat)).platform
        if mesh is not None
        else device.platform
    )
    if slim:
        return "pallas", platform == "cpu"
    if KERNEL in ("xla", "pallas"):
        kernel = KERNEL
    else:
        kernel = (
            "pallas"
            if (platform != "cpu" and (scheduled or n_tri >= PALLAS_MIN_TRIS))
            else "xla"
        )
    interpret = kernel == "pallas" and platform == "cpu"
    return kernel, interpret


def _rescope_kernel(entries, kernel, interpret, device, mesh, n_tri,
                    use_scheduler, slim: bool = False):
    """Re-resolve the kernel once the entry list is built.

    ``_resolve_kernel(scheduled=...)`` runs before checkpoint restore, keyed
    off ``len(meshes)``; if restores (or empty emitters) leave <= 1 entry
    the scheduled driver never runs, and the pipelined driver would sweep a
    tiny scene with a kernel chosen for the scheduled regime. Patch every
    entry's run with the corrected choice.

    Deliberately counts ``entries`` — NOT entries still pending — because
    the drivers' own dispatch conditions are ``len(entries) > 1``: an entry
    finished by a progress snapshot stays in the list and the scheduled
    driver still runs for the rest, so counting only pending entries here
    could downgrade the kernel while the scheduled driver executes."""
    new_kernel, new_interpret = _resolve_kernel(
        device, mesh, n_tri, scheduled=use_scheduler and len(entries) > 1,
        slim=slim,
    )
    if (new_kernel, new_interpret) != (kernel, interpret):
        for entry in entries:
            entry["run"].kernel = new_kernel
            entry["run"].interpret = new_interpret
    return new_kernel, new_interpret


def _progress_line(
    idx_emit: int,
    n_surf: int,
    name: str,
    iters: int,
    rays: int,
    seconds: float,
    use_bvh: bool,
    device,
) -> str:
    return (
        f"({idx_emit + 1}/{n_surf}) [{name}] {iters} iter, {rays:,} rays -> "
        f"{seconds:0.3f}s  (BVH={'builtin' if use_bvh else 'off'}, "
        f"device={_device_label(device)})"
    )


__all__ = [
    "view_factor_matrix",
    "view_factor",
    "view_factor_to_tregenza_sky",
    "view_factor_matrix_and_sky",
    "outside_workflow_shareable",
]
