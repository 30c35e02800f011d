"""Runtime tuning knobs, overridable via environment variables.

Analogous to the reference's GPU-scheduler env knobs (reference:
src/raystrack/main.py:51-64), reinterpreted for the TPU execution model:
instead of stream counts and pinned-memory budgets, these size the fused
device chunk step (ray block per inner tile, triangle tile width, and the
per-dispatch ray budget that bounds speculative iteration chunks).

These are PROCESS-START configuration: the kernel-shaping knobs
(GATE_MAX_TILES, PALLAS_MAX_TRIS, RAY_BLOCK, tile widths) are read inside
``@jax.jit``-cached trace functions, so changing a module attribute after
a given scene shape has compiled silently reuses the already-compiled
kernel for that shape. Set them via the environment before importing, or
restart the process (or call ``jax.clear_caches()``) after changing one.
"""
from __future__ import annotations

import os


def _env_int(name: str, default: int, *, minimum: int = 1) -> int:
    raw = os.environ.get(name)
    if raw is None:
        return max(minimum, int(default))
    try:
        return max(minimum, int(raw))
    except Exception:
        return max(minimum, int(default))


def _env_float(name: str, default: float) -> float:
    raw = os.environ.get(name)
    if raw is None:
        return float(default)
    try:
        return float(raw)
    except Exception:
        return float(default)


# Rays processed per inner tile of the trace sweep. Also the ray-count
# alignment unit: per-emitter ray batches are zero-padded to a multiple.
RAY_BLOCK = _env_int("RAYSTRACK_TPU_RAY_BLOCK", 2048)

# Bucket per-emitter ray counts into a {2^i, 3*2^i} block series (<= 33%
# masked-ray overhead) so scenes with many distinct emitter sizes share a
# handful of compiled shapes instead of one per size. Set to 0 for exact
# block-multiple padding.
RAY_BUCKETING = _env_int("RAYSTRACK_TPU_RAY_BUCKETING", 1, minimum=0)

# Maximum triangle-tile width of the trace sweep (lanes dimension).
TRI_TILE = _env_int("RAYSTRACK_TPU_TRI_TILE", 512)

# Finest granularity (triangles) of the acceleration AABBs built by
# pack_scene. Sweep tile widths are always multiples of this, so a sweep at
# any tile width derives its tile boxes by reducing the fine boxes.
ACCEL_GRAIN = 128

# Target rays per device dispatch; bounds how many MC iterations are fused
# into one chunk (chunk = clamp(target / rays_per_iteration)).
TARGET_CHUNK_RAYS = _env_int("RAYSTRACK_TPU_TARGET_CHUNK_RAYS", 4_194_304)

# Hard cap on iterations fused per dispatch (bounded compile variants: the
# chunk planner only emits power-of-two chunk sizes up to this cap).
MAX_CHUNK = _env_int("RAYSTRACK_TPU_MAX_CHUNK", 64)

# Speculation factor: after min_iters, chunks may run up to
# ceil(iters_done * SPECULATION_PCT / 100) iterations ahead of the next
# convergence checkpoint; overshoot iterations are discarded, preserving
# exact per-iteration convergence semantics.
SPECULATION_PCT = _env_int("RAYSTRACK_TPU_SPECULATION_PCT", 25, minimum=0)

# Intersection sweep implementation: "auto" picks the fused Pallas VMEM
# kernel on accelerators (single-device) and the XLA tiled sweep elsewhere;
# "xla"/"pallas" force one. Both produce bitwise-identical counts.
KERNEL = os.environ.get("RAYSTRACK_TPU_KERNEL", "auto").lower()

# Multi-emitter scheduler for XLA-swept scenes: "grouped" batches same-shape
# emitters via vmap (lowest per-block overhead); "scheduled" packs arbitrary
# (emitter, iteration) block schedules into one dispatch per convergence
# round (wins whenever per-dispatch overhead dominates — remote-tunnel TPU
# dispatch costs ~100 ms, so a whole-scene round in one dispatch beats
# per-emitter dispatches on every small scene); "auto" (default) picks
# "scheduled" on accelerators and "grouped" on the CPU backend, where
# dispatch is cheap and the vmap batch wins.
SCHEDULER = os.environ.get("RAYSTRACK_TPU_SCHEDULER", "auto").lower()

# Auto kernel choice uses the Pallas sweep only inside this triangle-count
# window: below it the solve is not sweep-dominated (the XLA path fuses
# per-block histograms and avoids materializing rays, which wins on small
# scenes); above it the (24, Tpad) operand pack no longer fits VMEM.
PALLAS_MIN_TRIS = _env_int("RAYSTRACK_TPU_PALLAS_MIN_TRIS", 512)
PALLAS_MAX_TRIS = _env_int("RAYSTRACK_TPU_PALLAS_MAX_TRIS", 32768)

# Pallas sweep tiling (measured optimum on v5e: 256 x 2048 — best at peak
# AND tighter ray blocks make the AABB gate fire more often on occluded
# scenes; ray blocks of 1024+ overflow VMEM and fail to compile).
PALLAS_RAY_BLOCK = _env_int("RAYSTRACK_TPU_PALLAS_RAY_BLOCK", 256)
PALLAS_TRI_TILE = _env_int("RAYSTRACK_TPU_PALLAS_TRI_TILE", 2048)

# Default persistent JAX compilation cache. Solve-step shapes recur across
# processes, and on remote-tunnel TPUs each new shape pays tens of seconds
# of AOT compilation; the solvers therefore enable JAX's persistent cache at
# this path unless the application already configured one. Empty string
# disables.
JAX_CACHE_DIR = os.environ.get(
    "RAYSTRACK_TPU_JAX_CACHE", os.path.join("~", ".cache", "raystrack_tpu", "jax")
)

# Mid-emitter progress checkpoints: while an emitter is still converging,
# its exact monitor state snapshots to
# <checkpoint_dir>/emitter_NNNNN.progress.json at most every this many
# seconds, so very long single-emitter solves resume mid-stream (the
# iteration RNG is absolute-indexed, so a resumed solve is bit-identical).
# 0 = snapshot after every chunk; negative disables snapshots.
CHECKPOINT_PROGRESS_S = _env_float("RAYSTRACK_TPU_CHECKPOINT_PROGRESS_S", 60.0)

# Grouped-driver break-even: the batched vmap dispatch keeps tracing every
# lane, so converged members waste work; the group drops to the per-emitter
# pipelined driver when the active fraction falls below this. Measured on
# the CPU backend (the only platform the grouped driver runs on): a K=8
# batched dispatch costs ~7.4x one single-emitter dispatch at both
# compute-heavy and tiny-emitter shapes (74/76 ms vs 9.9/10.5 ms each), so
# batching is ahead only while EVERY lane is live — break-even ~0.92.
GROUPED_MIN_ACTIVE = _env_float("RAYSTRACK_TPU_GROUPED_MIN_ACTIVE", 1.0)

# Scheduled-driver flat-table budget: the whole-scene scheduler keeps 7 f32
# per-ray tables spanning every emitter's padded ray count on device; past
# this many total rays it declines and the per-emitter drivers run instead
# (64M rays ~= 1.8 GB of tables).
SCHED_MAX_FLAT_RAYS = _env_int("RAYSTRACK_TPU_SCHED_MAX_FLAT_RAYS", 67_108_864)

# Scheduled-round block budget floor: a round always admits at least this
# many RAY_BLOCK-sized blocks even when TARGET_CHUNK_RAYS is tiny.
SCHED_MIN_BLOCKS = _env_int("RAYSTRACK_TPU_SCHED_MIN_BLOCKS", 256)

# Scheduled-raygen gather strategy: emitters with at most this many faces
# use the dense formulation (compare-sum CDF pick + one-hot matmul gather,
# O(F) per ray but ~10x faster than TPU scalar gathers at small F, and
# bitwise-identical); bigger emitters keep the gather path, whose cost is
# O(1) per ray.
RAYGEN_ONEHOT_MAX_FACES = _env_int("RAYSTRACK_TPU_RAYGEN_ONEHOT_MAX_FACES", 128)

# Implicit PreparedSolver reuse: solves WITHOUT an explicit prepared= keep
# up to 4 content-keyed PreparedSolvers alive (device scene packs, flat ray
# tables, emitter packs) so repeated solves of the same geometry skip the
# RPC-bound device-buffer churn. The retention costs HBM after solves
# return and up to 64 MB of sha256 hashing per implicit call; set to 0 on
# HBM-constrained devices to disable (clear_prepared_cache() drops it
# manually).
PREPARED_CACHE = _env_int("RAYSTRACK_TPU_PREPARED_CACHE", 1, minimum=0)

# Background AOT warm-up of the scheduled driver's remaining round-size
# buckets after the first round compiles (accelerators only): a cold solve
# pays ONE blocking compile instead of one per distinct round size. 0
# disables (compiles happen in line as rounds are dispatched).
SCHED_PRECOMPILE = _env_int("RAYSTRACK_TPU_SCHED_PRECOMPILE", 1, minimum=0)

# Scheduled-driver round pipelining: with 1 (default) the driver plans and
# dispatches convergence round k+1 — from the monitors' projected totals —
# BEFORE fetching round k's results, so the device (and the per-dispatch
# RPC on remote-tunnel TPUs) works on round k+1 while the host replays
# round k. Overshoot iterations of emitters that converge in round k are
# discarded exactly like speculative chunks; results are bitwise-identical
# to the sequential schedule (each block's histogram depends only on its
# own absolute-indexed rays). 0 = sequential (fetch each round before
# planning the next).
SCHED_PIPELINE = _env_int("RAYSTRACK_TPU_SCHED_PIPELINE", 1, minimum=0)

# Fused multi-round dispatch: the scheduled driver plans up to this many
# consecutive convergence rounds — each from the hypothetical "previous
# round consumed, nothing converged, projections unmoved" position, the
# same hypothetical round pipelining already dispatches from — and fuses
# them into ONE device program per dispatch. Fewer dispatches = fewer
# per-RPC floors; the cost is speculative compute for emitters that
# converge at an earlier fused checkpoint (their later iterations are
# discarded by the exact replay, results bitwise unchanged).
# MEASURED OFF (round 5, v5e through the remote tunnel, warm cache):
# canyon 0.347 s unfused -> 0.366 s fused x4 / 0.367 s x8; district
# 0.491 s -> 0.784 s x4 -> 1.095 s x8. Round pipelining (SCHED_PIPELINE)
# already overlaps the RPC floor with device compute AND can drop
# converged-in-flight overshoot rounds without fetching them; fusing
# welds that overshoot into the round whose results the host must wait
# for, so deeper fusing only adds blocking speculative work. 0 = auto
# (currently: no fusing anywhere). The knob remains for links whose
# per-dispatch latency dwarfs a round's compute.
SCHED_FUSE_ROUNDS = _env_int("RAYSTRACK_TPU_SCHED_FUSE_ROUNDS", 0, minimum=0)

# Distance-gate SMEM capacity, in gate BOXES (the AABB/order tables live in
# scalar memory; 8192 boxes = ~512 KB of SMEM tables — compiles and runs
# fine on v5e, and a 16384-box table also compiles). Scenes whose tile
# count exceeds this are gated at GROUP granularity instead of falling back
# to the ungated sweep: each gate box covers ceil(n_tiles / GATE_MAX_TILES)
# consecutive Morton-ordered tiles, the visit order runs over groups, and
# member tiles still stream/compute conditionally — so exact pruning
# extends to arbitrarily large scenes at progressively coarser granularity
# (group size capped by GATE_MAX_GROUP). Raising the cap 2048 -> 8192 made
# the 10M-tri occluded city fully per-tile-gated: 33.4k -> 38.5k rays/s
# (+15%, hit counts identical); scenes under 4M tris (2048 tiles) compile
# the very same kernel either way.
GATE_MAX_TILES = _env_int("RAYSTRACK_TPU_GATE_MAX_TILES", 8192)

# Largest tiles-per-box group the coarse gate accepts before giving up
# (64 x 8192 tiles x 2048 tris = ~1.07B triangles at default widths;
# beyond that a single box spans so much geometry that slab tests cannot
# prune).
GATE_MAX_GROUP = _env_int("RAYSTRACK_TPU_GATE_MAX_GROUP", 64)

# Slim (pack-resident) scene threshold, in padded triangles: at or above
# it pack_scene builds the (24, Tpad) sweep operand pack ONCE (chunked,
# donated device build) and keeps only it + sid on device, instead of the
# full scene arrays from which every dispatch would re-assemble the pack.
# The full mode peaks at ~176 B/tri of HBM during a dispatch (80 B/tri of
# scene fields + a 96 B/tri pack temp) — an OOM past ~90M triangles on a
# 16 GB chip; slim mode is ~100 B/tri resident with no per-dispatch pack
# temp, extending single-chip scenes to ~150M triangles. Slim scenes
# require the Pallas kernel (the pack IS its operand format) and derive
# per-pair eligibility from the pack's code row in-kernel (exact; see
# ops.trace_pallas._tile_step code_bounds).
SLIM_PACK_MIN_TRIS = _env_int("RAYSTRACK_TPU_SLIM_PACK_MIN_TRIS", 40_000_000)

# Gate-test window width (boxes per in-kernel bitmask evaluation; must
# divide 128; 0 = per-box gate tests). Each per-box gate test costs a
# vector->scalar sync (~1 us of serialized reduction + branch latency);
# evaluating K boxes' slab tests in one (B, K) pass and folding them into
# ONE int32 bitmask makes the skip path a scalar bit test. Decisions
# within a window use the window-START carry — monotone-safe (a stale
# carry only errs toward visiting), and measured +0.1% visits at K=32 on
# the 10M city (docs/measurements/gate_oracle_10m_window_r04.txt).
GATE_WINDOW = _env_int("RAYSTRACK_TPU_GATE_WINDOW", 16, minimum=0)

__all__ = [
    "RAY_BLOCK",
    "TRI_TILE",
    "TARGET_CHUNK_RAYS",
    "MAX_CHUNK",
    "SPECULATION_PCT",
]
