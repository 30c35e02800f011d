"""Scene/emitter preparation and cached device packing.

Host side (pure NumPy) mirrors the reference's preparation semantics
(reference: src/raystrack/utils/prepared.py:99-321):

- triangle soup ``(v0, e1, e2, sid)`` per scene with safe-normalized normals,
- per-emitter emission tables: orthonormal triangle frames, area CDF,
  stratified Halton grid sized by ``grid_from_density``, five per-ray Halton
  dimensions, self-hit origin epsilon, and emitter-plane coplanarity data
  used for receiver culling.

Device side packs those tables into padded, statically-shaped JAX arrays the
fused solve step consumes:

- triangles are zero-padded to a tile multiple; a padded triangle has
  ``e1 = e2 = 0`` so its intersection determinant is exactly 0 and it can
  never register a hit (no mask arithmetic needed for padding),
- padded triangle surface-ids point at a sentinel slot appended to the
  surface-active vector,
- per-cell jitter values are pre-expanded to per-ray tables so the device
  step performs no cell gathers,
- per-triangle intersection operands are precomputed so the Möller–Trumbore
  test reduces to dot products against the ray and its origin-direction
  cross product (see ops/trace.py).

``PreparedSolver`` caches all of it across solves, keyed the same way as the
reference (scene by accel flag; emitters by (samples, rays, flip_faces);
device packs additionally by device and padding alignment).
"""
from __future__ import annotations

import functools as _functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .config import ACCEL_GRAIN, RAY_BLOCK, TRI_TILE
from .ops.halton import cached_halton, cached_halton_dims
from .utils.helpers import grid_from_density

Mesh = Tuple[str, np.ndarray, np.ndarray]


# ---------------------------------------------------------------------------
# Host-side prepared state
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PreparedScene:
    """Flattened triangle soup for the whole scene (host arrays)."""

    v0: np.ndarray  # (T, 3) f32
    e1: np.ndarray  # (T, 3) f32
    e2: np.ndarray  # (T, 3) f32
    normals: np.ndarray  # (T, 3) f32, unit
    sid: np.ndarray  # (T,) i32 surface (mesh) index
    use_accel: bool  # whether tile culling acceleration was requested


@dataclass(frozen=True)
class PreparedEmitter:
    """Per-mesh emission geometry plus LAZY QMC tables (host arrays).

    The Halton jitter grid and the five per-ray dimensions are built on
    first access, not at prepare time: a scene's emitter list covers every
    mesh (reference semantics, prepared.py:246-321), but solves typically
    trace only a few of them — a million-triangle receiver mesh must not pay
    for (or OOM on) tens of millions of table entries it never emits.
    """

    tri_a: np.ndarray  # (F, 3) f32
    tri_e1: np.ndarray  # (F, 3) f32
    tri_e2: np.ndarray  # (F, 3) f32
    tri_u: np.ndarray  # (F, 3) f32 tangent frame
    tri_v: np.ndarray  # (F, 3) f32
    tri_n: np.ndarray  # (F, 3) f32 unit normal
    tri_origin_eps: np.ndarray  # (F,) f32 self-hit offset along normal
    plane_origin: np.ndarray  # (3,) f32
    plane_normal: np.ndarray  # (3,) f32
    plane_tol: float
    plane_is_planar: bool
    cdf: np.ndarray  # (F,) f32 area CDF
    total_area: float
    g: int  # stratified grid side
    rays: int  # rays per cell the tables are sized for
    zero_area: bool = False  # degenerate emitters get all-zero tables

    @property
    def n_cells(self) -> int:
        return int(self.g * self.g)

    # functools.cached_property writes straight into __dict__, which works
    # on a frozen dataclass (no __slots__) — the instance stays logically
    # immutable, the tables are just memoized.
    @_functools.cached_property
    def _grids(self) -> Tuple[np.ndarray, np.ndarray]:
        if self.zero_area:
            zero = np.zeros(self.n_cells, dtype=np.float32)
            return zero, zero.copy()
        return cached_halton(self.g)

    @property
    def u_grid(self) -> np.ndarray:  # (g*g,) f32 per-cell jitter
        return self._grids[0]

    @property
    def v_grid(self) -> np.ndarray:  # (g*g,) f32
        return self._grids[1]

    @_functools.cached_property
    def _dims(self) -> Tuple[np.ndarray, ...]:
        n = self.n_cells * self.rays
        if self.zero_area:
            zero = np.zeros(n, dtype=np.float32)
            return (zero,) * 5
        return cached_halton_dims(n)

    @property
    def halton_tri(self) -> np.ndarray:  # (g*g*rays,) f32
        return self._dims[0]

    @property
    def halton_u(self) -> np.ndarray:
        return self._dims[1]

    @property
    def halton_v(self) -> np.ndarray:
        return self._dims[2]

    @property
    def halton_r1(self) -> np.ndarray:
        return self._dims[3]

    @property
    def halton_r2(self) -> np.ndarray:
        return self._dims[4]


def _safe_unit(v: np.ndarray) -> np.ndarray:
    norm = np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    return v / norm


def _triangle_frames(tri_n: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Orthonormal tangent frame (u, v) per unit normal, vectorized.

    Reference picks the world X axis unless ``|n_x| >= 0.9`` (then Y), falls
    back to the other axis on degeneracy, and finally to the identity frame
    (reference: prepared.py:99-122).
    """
    n = tri_n.astype(np.float32)
    count = n.shape[0]
    ex = np.broadcast_to(np.array([1.0, 0.0, 0.0], np.float32), (count, 3))
    ey = np.broadcast_to(np.array([0.0, 1.0, 0.0], np.float32), (count, 3))

    use_x = (np.abs(n[:, 0]) < 0.9)[:, None]
    ref1 = np.where(use_x, ex, ey)
    u1 = np.cross(ref1, n).astype(np.float32)
    len1 = np.linalg.norm(u1, axis=1, keepdims=True)

    ref2 = np.where(use_x, ey, ex)
    u2 = np.cross(ref2, n).astype(np.float32)
    len2 = np.linalg.norm(u2, axis=1, keepdims=True)

    first_ok = len1 > 1e-12
    second_ok = len2 > 1e-12
    u = np.where(first_ok, u1 / np.maximum(len1, 1e-30), 0.0)
    u = np.where(~first_ok & second_ok, u2 / np.maximum(len2, 1e-30), u)
    v = np.cross(n, u).astype(np.float32)
    degenerate = (~first_ok & ~second_ok).ravel()
    if np.any(degenerate):
        u[degenerate] = ex[degenerate]
        v[degenerate] = ey[degenerate]
    return u.astype(np.float32), v.astype(np.float32)


def _triangle_origin_eps(tri_e1: np.ndarray, tri_e2: np.ndarray) -> np.ndarray:
    """Per-triangle ray-origin offset: 1e-6 of the longest edge, min 1e-8."""
    edges = np.stack(
        [
            np.linalg.norm(tri_e1, axis=1),
            np.linalg.norm(tri_e2, axis=1),
            np.linalg.norm(tri_e2 - tri_e1, axis=1),
        ],
        axis=0,
    )
    return np.maximum(edges.max(axis=0) * 1.0e-6, 1.0e-8).astype(np.float32)


def _emitter_plane(
    tri_a: np.ndarray,
    tri_e1: np.ndarray,
    tri_e2: np.ndarray,
    tri_n: np.ndarray,
    tri_origin_eps: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, float, bool]:
    """Detect whether the emitter is a single coplanar, co-oriented surface.

    Returns (origin, normal, tolerance, is_planar); planar emitters enable
    culling of receivers that lie entirely behind the emission plane
    (reference: prepared.py:133-167).
    """
    plane_tol = float(max(1.0e-7, float(tri_origin_eps.max()) if tri_origin_eps.size else 0.0))
    zero3 = np.zeros(3, dtype=np.float32)
    if tri_a.shape[0] == 0:
        return zero3, zero3, plane_tol, False

    origin = np.asarray(tri_a[0], dtype=np.float32)
    normal = np.asarray(tri_n[0], dtype=np.float32)
    n_len = float(np.linalg.norm(normal))
    if n_len <= 1.0e-12:
        return origin, normal, plane_tol, False
    normal = (normal / n_len).astype(np.float32)

    if np.any(tri_n @ normal < (1.0 - 1.0e-4)):
        return origin, normal, plane_tol, False

    corners = (tri_a, tri_a + tri_e1, tri_a + tri_e2)
    max_dev = max(
        float(np.max(np.abs((pts - origin) @ normal))) if pts.size else 0.0
        for pts in corners
    )
    if max_dev > plane_tol:
        return origin, normal, plane_tol, False
    return origin, normal, plane_tol, True


def prepare_scene(meshes: List[Mesh], *, use_accel: bool = False) -> PreparedScene:
    """Flatten all meshes into a triangle soup with surface ids."""
    if not meshes or sum(F.shape[0] for _, _, F in meshes) == 0:
        empty3 = np.empty((0, 3), dtype=np.float32)
        return PreparedScene(
            empty3, empty3.copy(), empty3.copy(), empty3.copy(),
            np.empty((0,), dtype=np.int32), False,
        )

    v0s, e1s, e2s, ns, sids = [], [], [], [], []
    for sid, (_, V, F) in enumerate(meshes):
        a = np.asarray(V[F[:, 0]], dtype=np.float32)
        b = np.asarray(V[F[:, 1]], dtype=np.float32)
        c = np.asarray(V[F[:, 2]], dtype=np.float32)
        e1 = b - a
        e2 = c - a
        v0s.append(a)
        e1s.append(e1)
        e2s.append(e2)
        ns.append(_safe_unit(np.cross(e1, e2)).astype(np.float32))
        sids.append(np.full(F.shape[0], sid, dtype=np.int32))

    return PreparedScene(
        v0=np.concatenate(v0s),
        e1=np.concatenate(e1s),
        e2=np.concatenate(e2s),
        normals=np.concatenate(ns),
        sid=np.concatenate(sids),
        use_accel=bool(use_accel),
    )


def prepare_emitters(
    meshes: List[Mesh], *, samples: int, rays: int, flip_faces: bool
) -> List[PreparedEmitter]:
    """Build per-mesh emission tables (reference: prepared.py:246-321)."""
    emitters: List[PreparedEmitter] = []
    for _, V, F in meshes:
        F_emit = F[:, [0, 2, 1]] if flip_faces else F
        tri_a = np.asarray(V[F_emit[:, 0]], dtype=np.float32)
        tri_b = np.asarray(V[F_emit[:, 1]], dtype=np.float32)
        tri_c = np.asarray(V[F_emit[:, 2]], dtype=np.float32)
        tri_e1 = tri_b - tri_a
        tri_e2 = tri_c - tri_a

        raw_n = np.cross(tri_e1, tri_e2).astype(np.float32)
        twice_area = np.linalg.norm(raw_n, axis=1)
        tri_n = _safe_unit(raw_n).astype(np.float32)
        tri_u, tri_v = _triangle_frames(tri_n)
        eps = _triangle_origin_eps(tri_e1, tri_e2)
        plane_origin, plane_normal, plane_tol, plane_is_planar = _emitter_plane(
            tri_a, tri_e1, tri_e2, tri_n, eps
        )

        areas = 0.5 * twice_area
        total_area = float(areas.sum())
        zero_area = total_area <= 0.0
        if zero_area:
            cdf = np.ones(F_emit.shape[0], dtype=np.float32)
            g = 4
        else:
            cdf64 = np.cumsum(areas, dtype=np.float64)
            cdf = (cdf64 / cdf64[-1]).astype(np.float32)
            g = grid_from_density(total_area, samples)

        emitters.append(
            PreparedEmitter(
                tri_a=tri_a,
                tri_e1=tri_e1,
                tri_e2=tri_e2,
                tri_u=tri_u,
                tri_v=tri_v,
                tri_n=tri_n,
                tri_origin_eps=eps,
                plane_origin=plane_origin,
                plane_normal=plane_normal,
                plane_tol=plane_tol,
                plane_is_planar=plane_is_planar,
                cdf=cdf,
                total_area=total_area,
                g=g,
                rays=int(rays),
                zero_area=zero_area,
            )
        )
    return emitters


# ---------------------------------------------------------------------------
# Device packing
# ---------------------------------------------------------------------------


def _round_up(n: int, align: int) -> int:
    return ((max(n, 1) + align - 1) // align) * align


def _pad_rays(n: int, align: int) -> int:
    """Padded per-emitter ray count: align to blocks, then (by default)
    bucket the block count into the {2^i, 3*2^i} series so differently-sized
    emitters collapse onto shared compiled shapes. Padded tail rays are
    masked out of every count, so only <= 33% device compute is traded for
    ~one-per-octave compilation classes."""
    from .config import RAY_BUCKETING

    blocks = (max(n, 1) + align - 1) // align
    if not RAY_BUCKETING:
        return blocks * align
    size = 1
    while size < blocks:
        if size * 3 // 2 >= blocks and size % 2 == 0:
            size = size * 3 // 2
            break
        size *= 2
    return size * align


def morton_order(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> np.ndarray:
    """Triangle permutation by 30-bit Morton code of quantized centroids.

    Spatially clustering triangles makes per-emitter culling coherent at the
    tile level: unreachable triangles (e.g. everything behind an emitter's
    plane) land in contiguous tiles that the sweep kernels skip whole. This
    is the TPU-native stand-in for the reference's BVH reordering
    (reference: bvh.py:14-72) — the dense sweep has no traversal, so
    clustering + tile skipping plays the role of subtree pruning.
    """
    centroid = v0 + (e1 + e2) / 3.0
    lo = centroid.min(axis=0)
    span = np.maximum(centroid.max(axis=0) - lo, 1e-12)
    q = np.clip(((centroid - lo) / span) * 1023.0, 0, 1023).astype(np.uint64)

    def spread(x: np.ndarray) -> np.ndarray:
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )
    return np.argsort(code, kind="stable").astype(np.int32)


def pick_tri_tile(n_tri_pad: int) -> int:
    """Largest tile width from {TRI_TILE, ..., 128} dividing the padded count."""
    tile = TRI_TILE
    while tile > 128 and n_tri_pad % tile != 0:
        tile //= 2
    return max(128, min(tile, n_tri_pad))


@dataclass(frozen=True)
class ScenePack:
    """Padded, device-resident scene arrays plus derived trace operands.

    The derived per-triangle vectors let the Möller–Trumbore test run as dot
    products against ray quantities only (o, d, o×d):

    - ``det   = -(d · cross_e)``          with ``cross_e = e1 × e2``
    - ``u_num =  (o×d) · e2 + d · (v0 × e2)``
    - ``v_num = -(o×d) · e1 - d · (v0 × e1)``
    - ``t_num =  o · cross_e - v0 · cross_e``

    and the front/back flag is simply ``det > 0`` (the unnormalized normal is
    ``cross_e`` and ``det = -(d · cross_e)``).
    """

    v0: Any  # (Tp, 3) f32
    e1: Any  # (Tp, 3) f32
    e2: Any  # (Tp, 3) f32
    cross_e: Any  # (Tp, 3) f32  e1 x e2
    w_u: Any  # (Tp, 3) f32  v0 x e2
    w_v: Any  # (Tp, 3) f32  v0 x e1
    d0: Any  # (Tp,) f32   v0 . cross_e
    sid: Any  # (Tp,) i32   padded entries = n_surf (sentinel)
    n_tri: int
    n_tri_pad: int
    tri_tile: int
    n_surf: int
    # Per-tile AABBs at the finest tile granularity (ACCEL_GRAIN triangles),
    # only when acceleration is on. Morton ordering makes these boxes
    # spatially tight, which is what lets the sweep kernels prune tiles by
    # ray-interval tests (the flat-sweep analogue of BVH node_t >= best
    # pruning, reference: cpu_trace.py:243-250). Padded tiles carry an empty
    # box (lo > hi) that every slab test misses.
    tile_lo: Any = None  # (Tp / ACCEL_GRAIN, 3) f32
    tile_hi: Any = None  # (Tp / ACCEL_GRAIN, 3) f32
    # Slim (pack-resident) mode for huge scenes: the (TRI_ROWS, Tp) sweep
    # operand pack is built ONCE (chunked donated device build) and the
    # per-triangle arrays above are None on device — only sid survives for
    # mask/tile-activity math. Dispatches reuse this pack instead of
    # re-assembling one from the scene fields, which at 1e8 triangles would
    # hold ~80 B/tri of fields plus a 96 B/tri pack temp in HBM at once.
    tri_pack: Any = None  # (TRI_ROWS, Tp) f32, slim mode only

    @property
    def accel(self):
        if self.tile_lo is None:
            return None
        return (self.tile_lo, self.tile_hi)

    @property
    def slim(self) -> bool:
        return self.tri_pack is not None


@dataclass(frozen=True)
class EmitterPack:
    """Padded per-ray emission tables on device.

    Per-cell jitter is pre-expanded to per-ray (``rays`` consecutive rays
    share a cell), so ray generation is purely elementwise plus one CDF
    search and one triangle gather.
    """

    u_cell: Any  # (Np,) f32
    v_cell: Any  # (Np,) f32
    h_tri: Any  # (Np,) f32
    h_u: Any
    h_v: Any
    h_r1: Any
    h_r2: Any
    cdf: Any  # (F,) f32
    tri_a: Any  # (F, 3) f32
    tri_e1: Any
    tri_e2: Any
    tri_u: Any
    tri_v: Any
    tri_n: Any
    tri_eps: Any  # (F,) f32
    plane_vec: Any  # (8,) f32 [origin, normal, tol, is_planar] for culling
    n_rays_once: int  # true rays per iteration (pre-padding)
    n_rays_pad: int
    # host mirror of plane_vec: the scheduled driver assembles per-round
    # plane stacks on host every convergence round, and reading a device
    # array back costs a blocking D2H RPC (~35 ms on a remote-tunnel TPU)
    plane_host: Any = None


# Empty-box sentinel: any slab test against (lo=+BIG, hi=-BIG) misses.
_ACCEL_EMPTY = 3.0e37

# Triangles per donated fill step of the slim pack build (~400 MB of
# chunk uploads + one (TRI_ROWS, chunk) slab in flight).
_PACK_BUILD_CHUNK = 4_194_304


def _tile_bounds(
    v0: np.ndarray, e1: np.ndarray, e2: np.ndarray, n_tri: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(n_tiles, 3) AABB lo/hi per ACCEL_GRAIN-triangle tile (padded arrays).

    Only real triangles contribute; fully padded tiles get the empty box.
    """
    n_tri_pad = v0.shape[0]
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=1).astype(np.float32)  # (Tp,3,3)
    real = np.arange(n_tri_pad) < n_tri
    pts = np.where(real[:, None, None], pts, np.float32(np.nan))
    import warnings

    tiles = pts.reshape(n_tri_pad // ACCEL_GRAIN, ACCEL_GRAIN * 3, 3)
    with warnings.catch_warnings(), np.errstate(invalid="ignore"):
        # fully padded tiles are all-NaN on purpose; they become empty boxes
        warnings.simplefilter("ignore", RuntimeWarning)
        lo = np.nanmin(tiles, axis=1)
        hi = np.nanmax(tiles, axis=1)
    lo = np.where(np.isnan(lo), np.float32(_ACCEL_EMPTY), lo).astype(np.float32)
    hi = np.where(np.isnan(hi), np.float32(-_ACCEL_EMPTY), hi).astype(np.float32)
    return lo, hi


def _build_pack_resident(v0, e1, e2, sid, device):
    """Device-resident (TRI_ROWS, Tpad) sweep operand pack for slim scenes.

    Built in donated chunks so peak HBM stays pack + one row slab (~300 MB)
    instead of pack + the full scene fields. Row content matches
    ops.trace_pallas.build_tri_pack with zero mask rows and no bake (the
    same pack the scheduled kernels consume). The derived rows are computed
    on the HOST with the exact NumPy formulas full mode uses, so slim packs
    are bitwise-equal to full-mode packs BY CONSTRUCTION — a device-side
    build was measured to drift ~1 ulp because XLA's LLVM backend contracts
    ``a*b - c*d`` into an FMA even across an optimization_barrier (the
    barrier is an HLO fence; contraction happens at instruction selection).
    Only the 17 used rows upload (68 B/tri); the pad rows stay the zeros
    the pack was initialized with.
    """
    import functools

    import jax

    from .ops.trace_pallas import TRI_ROWS

    n = int(v0.shape[0])

    @functools.partial(jax.jit, donate_argnums=0)
    def fill(pack, rows, off):
        return jax.lax.dynamic_update_slice(pack, rows, (0, off))

    import jax.numpy as jnp

    zeros = lambda: jnp.zeros((TRI_ROWS, n), jnp.float32)
    if isinstance(device, jax.sharding.Sharding):
        # mesh placement: the pack replicates per device (the ray-sharded
        # sweep's in_spec is P()); the donated fill below preserves it
        pack = jax.jit(zeros, out_shardings=device)()
    elif device is not None:
        with jax.default_device(device):
            pack = jax.jit(zeros)()
    else:
        pack = jax.jit(zeros)()

    put = lambda a: jax.device_put(a, device) if device is not None else jnp.asarray(a)
    # at most two compiled fill variants: full chunks + one remainder shape
    # (n is a multiple of 128, so is the remainder)
    chunk = min(n, _PACK_BUILD_CHUNK)
    off = 0
    while off < n:
        c = min(chunk, n - off)
        sl = slice(off, off + c)
        rows = np.empty((17, c), dtype=np.float32)
        ce = np.cross(e1[sl], e2[sl]).astype(np.float32)
        rows[0:3] = ce.T
        rows[3:6] = e1[sl].T
        rows[6:9] = e2[sl].T
        rows[9:12] = np.cross(v0[sl], e2[sl]).astype(np.float32).T
        rows[12:15] = np.cross(v0[sl], e1[sl]).astype(np.float32).T
        rows[15] = np.einsum("ij,ij->i", v0[sl], ce).astype(np.float32)
        rows[16] = (sid[sl] * 2).astype(np.float32)
        pack = fill(pack, put(rows), np.int32(off))
        off += c
    return pack


def pack_scene(
    scene: PreparedScene, n_surf: int, *, device=None, slim=None
) -> ScenePack:
    import jax

    from .config import PALLAS_MAX_TRIS, PALLAS_TRI_TILE, SLIM_PACK_MIN_TRIS

    n_tri = int(scene.v0.shape[0])
    n_tri_pad = _round_up(n_tri, 128)
    if n_tri_pad > PALLAS_MAX_TRIS:
        # HBM-streamed scenes: keep the padded count a multiple of the full
        # Pallas tile so the sweep tile width never collapses (a non-dividing
        # count halves the tile repeatedly, exploding the tile count and the
        # SMEM gate tables). <=2047 extra padded triangles is noise here.
        n_tri_pad = _round_up(n_tri, PALLAS_TRI_TILE)
    tile = pick_tri_tile(n_tri_pad)
    if slim is None:
        slim = n_tri_pad >= SLIM_PACK_MIN_TRIS

    if scene.use_accel and n_tri > 1:
        perm = morton_order(scene.v0, scene.e1, scene.e2)
    else:
        perm = np.arange(n_tri, dtype=np.int32)

    def pad3(a: np.ndarray) -> np.ndarray:
        out = np.zeros((n_tri_pad, 3), dtype=np.float32)
        out[:n_tri] = a[perm]
        return out

    v0 = pad3(scene.v0)
    e1 = pad3(scene.e1)
    e2 = pad3(scene.e2)
    sid = np.full(n_tri_pad, n_surf, dtype=np.int32)
    sid[:n_tri] = scene.sid[perm]

    if scene.use_accel and n_tri > 0:
        tile_lo, tile_hi = _tile_bounds(v0, e1, e2, n_tri)
    else:
        tile_lo = tile_hi = None

    put = lambda a: jax.device_put(a, device) if a is not None else None
    if slim:
        tri_pack = _build_pack_resident(v0, e1, e2, sid, device)
        return ScenePack(
            v0=None, e1=None, e2=None, cross_e=None, w_u=None, w_v=None,
            d0=None,
            sid=put(sid),
            n_tri=n_tri,
            n_tri_pad=n_tri_pad,
            tri_tile=tile,
            n_surf=n_surf,
            tile_lo=put(tile_lo),
            tile_hi=put(tile_hi),
            tri_pack=tri_pack,
        )

    cross_e = np.cross(e1, e2).astype(np.float32)
    w_u = np.cross(v0, e2).astype(np.float32)
    w_v = np.cross(v0, e1).astype(np.float32)
    d0 = np.einsum("ij,ij->i", v0, cross_e).astype(np.float32)

    return ScenePack(
        v0=put(v0),
        e1=put(e1),
        e2=put(e2),
        cross_e=put(cross_e),
        w_u=put(w_u),
        w_v=put(w_v),
        d0=put(d0),
        sid=put(sid),
        n_tri=n_tri,
        n_tri_pad=n_tri_pad,
        tri_tile=tile,
        n_surf=n_surf,
        tile_lo=put(tile_lo),
        tile_hi=put(tile_hi),
    )


def emitter_plane_vec(emitter: PreparedEmitter) -> np.ndarray:
    """The (8,) f32 ``[plane_origin, plane_normal, plane_tol, is_planar]``
    culling vector — single source of the plane_vec/plane_host layout for
    both eager (`pack_emitter`) and lazy (solver `_make_emitter_pack`)
    packs."""
    return np.concatenate(
        [
            emitter.plane_origin.astype(np.float32),
            emitter.plane_normal.astype(np.float32),
            np.float32([emitter.plane_tol, 1.0 if emitter.plane_is_planar else 0.0]),
        ]
    )


def pack_emitter(
    emitter: PreparedEmitter,
    rays: int,
    *,
    align: int = RAY_BLOCK,
    device=None,
    ray_device=None,
) -> EmitterPack:
    """Pack per-ray tables; ``ray_device`` (e.g. a ray-axis NamedSharding)
    places the per-ray tables, ``device`` everything else."""
    import jax

    n_rays_once = emitter.n_cells * rays
    n_rays_pad = _pad_rays(n_rays_once, align)
    if ray_device is None:
        ray_device = device

    put = lambda a: jax.device_put(np.asarray(a), device)

    # Device-resident big-emitter tables: when the halton builder handed
    # back jax.Arrays (accelerator build, see ops/halton._halton_dim), pad
    # on device and build the per-ray cell-jitter repeats on device from
    # the small (g*g,) grids — for an 89M-ray emitter the host path would
    # otherwise upload ~2.5 GB of per-ray f32 tables through the tunnel.
    device_tables = isinstance(emitter.halton_tri, jax.Array)

    if device_tables:
        import jax.numpy as jnp

        def pad1(a):
            a = jnp.asarray(a)
            padding = n_rays_pad - int(a.shape[0])
            if padding:
                a = jnp.concatenate([a, jnp.zeros(padding, jnp.float32)])
            return a

        u_cell = jnp.repeat(jnp.asarray(emitter.u_grid), rays)
        v_cell = jnp.repeat(jnp.asarray(emitter.v_grid), rays)
        # device -> ray_device placement (no-op on the default device; a
        # resharding copy when the caller passed a ray-axis sharding)
        put_r = lambda a: jax.device_put(a, ray_device)
    else:

        def pad1(a: np.ndarray) -> np.ndarray:
            out = np.zeros(n_rays_pad, dtype=np.float32)
            out[: a.shape[0]] = a
            return out

        u_cell = np.repeat(emitter.u_grid, rays)
        v_cell = np.repeat(emitter.v_grid, rays)
        put_r = lambda a: jax.device_put(np.asarray(a), ray_device)

    plane_host = emitter_plane_vec(emitter)
    return EmitterPack(
        u_cell=put_r(pad1(u_cell)),
        v_cell=put_r(pad1(v_cell)),
        h_tri=put_r(pad1(emitter.halton_tri)),
        h_u=put_r(pad1(emitter.halton_u)),
        h_v=put_r(pad1(emitter.halton_v)),
        h_r1=put_r(pad1(emitter.halton_r1)),
        h_r2=put_r(pad1(emitter.halton_r2)),
        cdf=put(emitter.cdf),
        tri_a=put(emitter.tri_a),
        tri_e1=put(emitter.tri_e1),
        tri_e2=put(emitter.tri_e2),
        tri_u=put(emitter.tri_u),
        tri_v=put(emitter.tri_v),
        tri_n=put(emitter.tri_n),
        tri_eps=put(emitter.tri_origin_eps),
        plane_vec=put(plane_host),
        n_rays_once=n_rays_once,
        n_rays_pad=n_rays_pad,
        plane_host=plane_host,
    )


class LazyEmitterPack:
    """Deferred EmitterPack: scalars (ray counts, plane vector) are available
    immediately; the heavyweight per-ray device tables materialize only if a
    per-emitter dispatch actually touches them.

    The scheduled solver reads rays from the scene-wide flat tables, so with
    this wrapper it never holds a second device copy of every emitter's
    padded ray tables (which would double HBM for exactly the many-emitter
    scenes the scheduler targets).
    """

    def __init__(self, factory, *, n_rays_once: int, n_rays_pad: int,
                 plane_host):
        self._factory = factory
        self._pack: Optional[EmitterPack] = None
        self.n_rays_once = n_rays_once
        self.n_rays_pad = n_rays_pad
        self.plane_host = plane_host

    def __getattr__(self, name):
        # plane_vec (the device copy) falls through here too: the scheduled
        # driver only reads plane_host, so a purely scheduled solve never
        # uploads per-emitter plane vectors at all
        if self._pack is None:
            self._pack = self._factory()
        return getattr(self._pack, name)


# ---------------------------------------------------------------------------
# PreparedSolver cache
# ---------------------------------------------------------------------------


class PreparedSolver:
    """Cache prepared geometry, ray tables and device packs across solves.

    Reusing one instance across repeated solves on the same mesh set skips
    rebuilding triangle buffers, Halton tables and device uploads (reference
    semantics: prepared.py:324-431; changing only the seed reuses everything).
    """

    def __init__(self, meshes: List[Mesh]):
        self.meshes = list(meshes)
        self.total_faces = int(sum(F.shape[0] for _, _, F in self.meshes))
        self._scene_cache: Dict[bool, PreparedScene] = {}
        self._emitter_cache: Dict[Tuple[int, int, bool], List[PreparedEmitter]] = {}
        self._scene_pack_cache: Dict[Tuple[str, bool], ScenePack] = {}
        self._emitter_pack_cache: Dict[Tuple[str, int, int, int, bool, int], EmitterPack] = {}
        self._flat_cache: Dict[Tuple, Tuple] = {}
        self._mesh_bounds_cache: Optional[Tuple[np.ndarray, np.ndarray]] = None

    # -- host state --------------------------------------------------------

    def get_scene(self, *, use_accel: bool = False) -> PreparedScene:
        key = bool(use_accel)
        if key not in self._scene_cache:
            self._scene_cache[key] = prepare_scene(self.meshes, use_accel=key)
        return self._scene_cache[key]

    def get_emitters(
        self, *, samples: int, rays: int, flip_faces: bool
    ) -> List[PreparedEmitter]:
        key = (int(samples), int(rays), bool(flip_faces))
        if key not in self._emitter_cache:
            self._emitter_cache[key] = prepare_emitters(
                self.meshes, samples=samples, rays=rays, flip_faces=flip_faces
            )
        return self._emitter_cache[key]

    def get_emitter(
        self, index: int, *, samples: int, rays: int, flip_faces: bool
    ) -> PreparedEmitter:
        return self.get_emitters(samples=samples, rays=rays, flip_faces=flip_faces)[
            int(index)
        ]

    def get_mesh_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        """Per-mesh AABB (centers, half-extents) for emitter-plane culling."""
        if self._mesh_bounds_cache is None:
            n_mesh = len(self.meshes)
            centers = np.zeros((n_mesh, 3), dtype=np.float32)
            extents = np.zeros((n_mesh, 3), dtype=np.float32)
            for idx, (_, V, _) in enumerate(self.meshes):
                if V.size == 0:
                    continue
                v = np.asarray(V, dtype=np.float32)
                vmin, vmax = v.min(axis=0), v.max(axis=0)
                centers[idx] = 0.5 * (vmin + vmax)
                extents[idx] = 0.5 * (vmax - vmin)
            self._mesh_bounds_cache = (centers, extents)
        return self._mesh_bounds_cache

    # -- device state -------------------------------------------------------

    def clear_device_cache(self) -> None:
        self._scene_pack_cache.clear()
        self._emitter_pack_cache.clear()
        self._flat_cache.clear()

    @staticmethod
    def _device_key(device) -> str:
        # ``None`` means "the default placement" — physically the same
        # device an explicit default-device argument would name. Key them
        # identically: a solver passing its resolved device must reuse a
        # pack a caller built with device=None (at slim pack-resident
        # scales a duplicate pack is ~10 GiB and OOMs the chip).
        if device is None:
            try:
                import jax

                device = jax.config.jax_default_device or jax.local_devices()[0]
            except Exception:
                return "default"
        return str(device)

    def get_scene_pack(self, *, use_accel: bool = False, device=None) -> ScenePack:
        key = (self._device_key(device), bool(use_accel))
        if key not in self._scene_pack_cache:
            scene = self.get_scene(use_accel=use_accel)
            self._scene_pack_cache[key] = pack_scene(
                scene, len(self.meshes), device=device
            )
        return self._scene_pack_cache[key]

    def get_flat_tables(
        self,
        *,
        samples: int,
        rays: int,
        flip_faces: bool,
        align: int = RAY_BLOCK,
        device=None,
    ):
        """Scene-wide flat ray tables + stacked geometry for scheduled solves.

        Concatenates every emitter's padded per-ray tables into one flat
        device array (7 of them) and stacks the per-emitter geometry padded
        to the max face count (CDF padded with 1.0, which a CDF search can
        never select). Returns
        ``(tables_flat, geom_stacked, offsets, n_rays_pad)`` where
        ``offsets[e]`` is emitter e's start in the flat tables.
        """
        key = (
            "flat", self._device_key(device), int(samples), int(rays),
            bool(flip_faces), int(align),
        )
        cached = self._flat_cache.get(key)
        if cached is not None:
            return cached

        import jax

        emitters = self.get_emitters(samples=samples, rays=rays, flip_faces=flip_faces)
        n_pad = np.array(
            [_pad_rays(e.n_cells * rays, align) for e in emitters], dtype=np.int64
        )
        offsets = np.concatenate([[0], np.cumsum(n_pad)[:-1]]).astype(np.int64)
        total = int(n_pad.sum())

        # Emitters between the device-build threshold (~2M entries) and the
        # scheduler budget (SCHED_MAX_FLAT_RAYS, 64M) carry device-resident
        # halton tables (ops/halton._halton_dim): concatenate those ON
        # device — fetching and re-uploading a 64M-ray scene's 7 flat
        # tables would move ~2 GB each way through a tunneled link. Scenes
        # with device tables have few (big) emitters, so the per-emitter
        # eager pad/concat dispatches stay cheap.
        device_tables = any(
            isinstance(em.halton_tri, jax.Array) for em in emitters
        )

        if device_tables:
            import jax.numpy as jnp

            def flat(per_emitter_fn):
                parts = []
                for e_idx, em in enumerate(emitters):
                    arr = jnp.asarray(per_emitter_fn(em))
                    pad = int(n_pad[e_idx]) - int(arr.shape[0])
                    if pad:
                        arr = jnp.concatenate(
                            [arr, jnp.zeros(pad, jnp.float32)]
                        )
                    parts.append(arr)
                out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
                return jax.device_put(out, device)

            rep = lambda grid: jnp.repeat(jnp.asarray(grid), rays)
        else:

            def flat(per_emitter_fn):
                out = np.zeros(total, dtype=np.float32)
                for e_idx, em in enumerate(emitters):
                    arr = np.asarray(per_emitter_fn(em))
                    out[offsets[e_idx] : offsets[e_idx] + arr.shape[0]] = arr
                return jax.device_put(out, device)

            rep = lambda grid: np.repeat(grid, rays)

        tables_flat = (
            flat(lambda em: rep(em.u_grid)),
            flat(lambda em: rep(em.v_grid)),
            flat(lambda em: em.halton_tri),
            flat(lambda em: em.halton_u),
            flat(lambda em: em.halton_v),
            flat(lambda em: em.halton_r1),
            flat(lambda em: em.halton_r2),
        )

        f_max = max(em.cdf.shape[0] for em in emitters)

        def stack2(get, fill=0.0):
            out = np.full((len(emitters), f_max), fill, dtype=np.float32)
            for e_idx, em in enumerate(emitters):
                arr = get(em)
                out[e_idx, : arr.shape[0]] = arr
            return jax.device_put(out, device)

        def stack3(get):
            out = np.zeros((len(emitters), f_max, 3), dtype=np.float32)
            for e_idx, em in enumerate(emitters):
                arr = get(em)
                out[e_idx, : arr.shape[0]] = arr
            return jax.device_put(out, device)

        geom_stacked = (
            stack2(lambda em: em.cdf, fill=1.0),
            stack3(lambda em: em.tri_a),
            stack3(lambda em: em.tri_e1),
            stack3(lambda em: em.tri_e2),
            stack3(lambda em: em.tri_u),
            stack3(lambda em: em.tri_v),
            stack3(lambda em: em.tri_n),
            stack2(lambda em: em.tri_origin_eps),
        )
        cached = (tables_flat, geom_stacked, offsets, n_pad)
        self._flat_cache[key] = cached
        return cached

    def get_emitter_pack(
        self,
        index: int,
        *,
        samples: int,
        rays: int,
        flip_faces: bool,
        align: int = RAY_BLOCK,
        device=None,
        ray_device=None,
    ) -> EmitterPack:
        key = (
            self._device_key(device),
            self._device_key(ray_device),
            int(index),
            int(samples),
            int(rays),
            bool(flip_faces),
            int(align),
        )
        if key not in self._emitter_pack_cache:
            emitter = self.get_emitter(
                index, samples=samples, rays=rays, flip_faces=flip_faces
            )
            self._emitter_pack_cache[key] = pack_emitter(
                emitter, rays, align=align, device=device, ray_device=ray_device
            )
        return self._emitter_pack_cache[key]


__all__ = [
    "PreparedScene",
    "PreparedEmitter",
    "ScenePack",
    "EmitterPack",
    "PreparedSolver",
    "prepare_scene",
    "prepare_emitters",
    "pack_scene",
    "pack_emitter",
    "pick_tri_tile",
]
