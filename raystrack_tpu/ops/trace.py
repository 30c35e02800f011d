"""Fused QMC solve step: ray generation + intersection + reduction.

This is the TPU-native replacement for the reference's per-iteration kernel
sequence (host/CUDA raygen, Möller–Trumbore trace, histogram reduce —
reference: src/raystrack/utils/ray_builder.py:25-94,
src/raystrack/utils/cpu_trace.py:54-583, cuda_trace.py kernels). One jitted
call processes a *chunk* of Monte-Carlo iterations:

    for each ray block (lax.scan, fully on device):
        rays   <- stratified Halton emission with Cranley-Patterson rotation
        trace  <- tiled all-pairs Möller–Trumbore sweep, masked min-reduction
        reduce <- per-surface front/back histograms, sky binning

and returns only tiny per-iteration count vectors, so host round-trips carry
(chunk, n_surf) int32s instead of per-ray buffers.

Intersection is expressed as dot products against precomputed per-triangle
operands (see prepared.ScenePack): for ray (o, d) and triangle i,

    det   = -(d . cross_e_i)
    u_num =  (o x d) . e2_i + d . (v0_i x e2_i)
    v_num = -((o x d) . e1_i) - d . (v0_i x e1_i)
    t_num =  o . cross_e_i - v0_i . cross_e_i

which makes the hot loop a set of (block, 3) @ (3, tile) contractions plus
elementwise predicates - no per-pair cross products, no branches, and the
front/back flag is sign(det). Validity tests multiply through by sign(det)
so no per-pair division happens except the single t = t_num / det needed for
the nearest-hit ordering. Surface skipping (emitter exclusion, reciprocity
half-matrix via min_sid, plane-culling masks) is mask algebra on the
per-triangle surface id; padded triangles have cross_e = 0 => det = 0 and can
never hit. Epsilons match the reference: |det| >= 1e-7, t > 1e-6.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .tregenza import tregenza_patch_id, TREGENZA_BINS

INF = 1.0e20
TWO_PI = 6.283185307179586


# ---------------------------------------------------------------------------
# Ray generation
# ---------------------------------------------------------------------------


def generate_rays(tables: Tuple, geom: Tuple, cp_row: jnp.ndarray):
    """Generate one block of ray origins/directions.

    tables: per-ray f32 vectors (u_cell, v_cell, h_tri, h_u, h_v, h_r1, h_r2),
    geom:   (cdf, tri_a, tri_e1, tri_e2, tri_u, tri_v, tri_n, tri_eps),
    cp_row: (7,) Cranley-Patterson offsets
            [grid_u, grid_v, tri, bary_u, bary_v, hemi_r1, hemi_r2].

    Per ray: jittered stratified cell -> area-CDF triangle pick -> uniform
    barycentric point -> cosine-weighted hemisphere direction in the
    triangle's tangent frame -> origin offset by eps * normal
    (reference math: ray_builder.py:52-94).
    """
    u_cell, v_cell, h_tri, h_u, h_v, h_r1, h_r2 = tables
    cdf, tri_a, tri_e1, tri_e2, tri_u, tri_v, tri_n, tri_eps = geom
    n_faces = cdf.shape[0]

    ug = jnp.mod(u_cell + cp_row[0], 1.0)
    vg = jnp.mod(v_cell + cp_row[1], 1.0)

    q_tri = jnp.mod(h_tri + cp_row[2], 1.0)
    tri = jnp.clip(jnp.searchsorted(cdf, q_tri, side="left"), 0, n_faces - 1)

    ur = jnp.mod(h_u + cp_row[3] + ug, 1.0)
    vr = jnp.mod(h_v + cp_row[4] + vg, 1.0)
    s = jnp.sqrt(ur)
    mix_b = (s * vr)[:, None]
    mix_c = (s * (1.0 - vr))[:, None]
    point = tri_a[tri] + mix_b * tri_e1[tri] + mix_c * tri_e2[tri]

    r1 = jnp.mod(h_r1 + cp_row[5], 1.0)
    r2 = jnp.mod(h_r2 + cp_row[6], 1.0)
    sin_t = jnp.sqrt(1.0 - r1)
    phi = TWO_PI * r2
    lx = (sin_t * jnp.cos(phi))[:, None]
    ly = (sin_t * jnp.sin(phi))[:, None]
    lz = jnp.sqrt(r1)[:, None]
    normal = tri_n[tri]
    direction = lx * tri_u[tri] + ly * tri_v[tri] + lz * normal
    origin = point + tri_eps[tri][:, None] * normal
    return origin, direction


# ---------------------------------------------------------------------------
# Surface masks and tile-level culling
# ---------------------------------------------------------------------------


def compute_masks(scene, surf_active_ext, emit_sid, min_sid, plane_vec=None):
    """Per-triangle (sky-eligible, matrix-eligible) masks for one emitter.

    Folds the active-surface vector, emitter exclusion, the reciprocity
    half-matrix minimum sid, and — for planar emitters — triangle-exact
    plane culling: a triangle whose three vertices all lie at signed
    distance <= plane_tol behind the emission plane can never be hit by a
    ray launched from that plane, exactly the reference's mesh-level cull
    (main.py:167-204) applied per triangle.

    ``plane_vec`` is an (8,) f32 device vector
    ``[origin(3), normal(3), tol, is_planar]``.
    """
    v0, e1, e2, cross_e, w_u, w_v, d0, sid = scene
    active = surf_active_ext[sid] > 0
    m_any = active & (sid != emit_sid)
    m_mat = m_any & (sid >= min_sid)
    if plane_vec is not None:
        origin = plane_vec[:3]
        normal = plane_vec[3:6]
        tol = plane_vec[6]
        is_planar = plane_vec[7] > 0.0
        s0 = (v0 - origin[None, :]) @ normal
        s1 = s0 + e1 @ normal
        s2 = s0 + e2 @ normal
        reachable = jnp.maximum(jnp.maximum(s0, s1), s2) > tol
        keep = jnp.where(is_planar, reachable, True)
        m_any = m_any & keep
        m_mat = m_mat & keep
    return m_any, m_mat


def compute_masks_slim(sid, surf_active_ext, emit_sid, min_sid):
    """Per-triangle masks from surface ids only (slim pack-resident scenes).

    Identical to :func:`compute_masks` minus the per-triangle plane-cull
    refinement, which needs the raw vertex arrays a slim scene no longer
    keeps on device. Exact: the per-SURFACE plane cull (a culled surface
    lies entirely behind the emission plane, so no launched ray can hit
    it — reference: main.py:167-204) is already folded into
    ``surf_active_ext``, and the per-triangle refinement only removes more
    provably-unhittable triangles. These masks feed tile activity and gate
    compaction; the kernel's per-pair tests run from the pack's code row
    (trace_pallas._tile_step ``code_bounds``).
    """
    active = surf_active_ext[sid] > 0  # padding sid = n_surf -> ext 0
    m_any = active & (sid != emit_sid)
    m_mat = m_any & (sid >= min_sid)
    return m_any, m_mat


def tile_activity(mask: jnp.ndarray, tri_tile: int) -> jnp.ndarray:
    """(n_tiles,) int32 flags: does any eligible triangle live in the tile?

    With Morton-ordered triangles (prepared.pack_scene, accel on), culled
    regions are contiguous, so whole tiles drop out of the sweep.
    """
    n_tiles = mask.shape[0] // tri_tile
    return jnp.any(mask.reshape(n_tiles, tri_tile), axis=1).astype(jnp.int32)


def plan_tiles(accel: Tuple, geom: Tuple, tri_tile: int):
    """Sweep-granularity tile AABBs and a near-to-far visit order.

    ``accel`` is the (tile_lo, tile_hi) pair at ACCEL_GRAIN granularity from
    prepared.pack_scene; the sweep's (wider) tile boxes reduce from it.
    Visit order sorts tiles by squared distance from the emitter's AABB
    (derived from the emission triangles in ``geom``), so the running
    nearest-hit distance shrinks early and far tiles get pruned — the flat
    analogue of the reference BVH's near-child-first traversal
    (reference: cpu_trace.py:224-250). The order is a heuristic only;
    results are identical for any order.
    """
    from ..config import ACCEL_GRAIN

    lo_g, hi_g = accel
    per = tri_tile // ACCEL_GRAIN
    n_tiles = lo_g.shape[0] // per
    lo = jnp.min(lo_g.reshape(n_tiles, per, 3), axis=1)
    hi = jnp.max(hi_g.reshape(n_tiles, per, 3), axis=1)

    tri_a, tri_e1, tri_e2 = geom[1], geom[2], geom[3]
    pts = jnp.concatenate([tri_a, tri_a + tri_e1, tri_a + tri_e2], axis=0)
    e_lo = jnp.min(pts, axis=0)
    e_hi = jnp.max(pts, axis=0)
    gap = jnp.maximum(jnp.maximum(lo - e_hi[None, :], e_lo[None, :] - hi), 0.0)
    dist = jnp.sum(gap * gap, axis=1)  # empty tiles overflow to +inf: last
    order = jnp.argsort(dist).astype(jnp.int32)
    return order, lo, hi


def _morton3(q: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Interleave the low ``bits`` of (..., 3) int32 coords into one code."""
    code = jnp.zeros(q.shape[:-1], dtype=jnp.int32)
    for b in range(bits):
        for axis in range(3):
            code = code | (((q[..., axis] >> b) & 1) << (3 * b + axis))
    return code


def sort_rays_for_coherence(o, d, valid, *, scene_lo, scene_hi):
    """Per-iteration coherence sort: permutation of rays by (direction,
    origin) Morton key.

    The per-surface/per-bin reductions are permutation-invariant, so rays may
    be freely reordered inside an iteration. Sorting makes each ray *block* a
    tight bundle (nearby origins, similar directions), which is what lets the
    block-level AABB gate actually skip tiles: an incoherent block touches
    every tile through some stray ray. This is the TPU-shaped counterpart of
    wavefront ray reordering in GPU path tracers; the reference's BVH gets
    its coherence per ray from the traversal stack instead
    (reference: cpu_trace.py:173-274).

    o, d, valid: (chunk, N, 3)/(chunk, N, 3)/(chunk, N). Returns permuted
    (o, d, valid). Origin Morton bits are the sort's major key — a block
    then covers a compact origin patch, so near geometry caps best_t for
    every ray at once and escaping rays cross few tile boxes; direction
    bits only break ties within a patch. (Direction-major sorting measures
    far worse here: blocks with scattered origins touch every tile.)
    """
    dq = jnp.clip(((d + 1.0) * 0.5 * 7.9999), 0.0, 7.0).astype(jnp.int32)
    span = jnp.maximum(scene_hi - scene_lo, 1e-12)
    oq = jnp.clip(
        (o - scene_lo) / span * 63.9999, 0.0, 63.0
    ).astype(jnp.int32)
    key = (_morton3(oq, 6) << 9) | _morton3(dq, 3)
    perm = jnp.argsort(key, axis=1)
    take = lambda a: jnp.take_along_axis(a, perm[..., None], axis=1)
    return take(o), take(d), jnp.take_along_axis(valid, perm, axis=1)


def _ray_box_interval(o, d_pos, d_zero, inv_d, lo, hi):
    """Conservative slab test of a ray block against one AABB.

    ``o``/``d_pos``/``d_zero``/``inv_d`` are (B, 3); ``lo``/``hi`` are (3,)
    (or broadcastable). Returns (near_c, far_c): the ray-parameter interval
    that could contain any hit inside the box, widened by a relative margin
    so float rounding of the slab math can never exclude a true hit — the
    pruning this feeds stays bitwise-exact. Misses come out with
    far_c < near_c (empty boxes with lo > hi always miss).
    """
    t_near = (jnp.where(d_pos, lo, hi) - o) * inv_d
    t_far = (jnp.where(d_pos, hi, lo) - o) * inv_d
    inside = (o >= lo) & (o <= hi)
    t_near = jnp.where(d_zero, jnp.where(inside, -INF, INF), t_near)
    t_far = jnp.where(d_zero, jnp.where(inside, INF, -INF), t_far)
    near = jnp.max(t_near, axis=-1)
    far = jnp.min(t_far, axis=-1)
    near_c = near - (jnp.abs(near) * 1e-4 + 1e-6)
    far_c = far + (jnp.abs(far) * 1e-4 + 1e-6)
    return near_c, far_c


# ---------------------------------------------------------------------------
# Tiled intersection sweep
# ---------------------------------------------------------------------------


def _sweep_tiles(
    o: jnp.ndarray,
    d: jnp.ndarray,
    ray_valid: jnp.ndarray,
    scene: Tuple,
    mask_any: jnp.ndarray,
    mask_mat: jnp.ndarray,
    *,
    tri_tile: int,
    want_matrix: bool,
    want_any: bool,
    tile_active: jnp.ndarray | None = None,
    tile_bounds: Tuple | None = None,
    tile_order: jnp.ndarray | None = None,
):
    """All-pairs sweep of one ray block against all triangle tiles.

    Returns (best_code, any_hit): best_code packs the nearest matrix-eligible
    hit as sid*2 + front (or -1 for a miss); any_hit marks rays blocked by
    any sky-eligible surface.

    With ``tile_bounds`` (per-tile AABB lo/hi from :func:`plan_tiles`), each
    tile is gated by a conservative ray-interval test before its pair math
    runs: a tile is skipped when no ray's box interval could beat its
    running nearest hit (matrix) or block it anew (any-hit). Combined with
    the near-to-far ``tile_order`` this is the dense-sweep equivalent of the
    reference BVH's ``node_t >= best`` subtree pruning
    (reference: cpu_trace.py:243-250), and it is exact: gating never changes
    a result, only skips provably irrelevant work.
    """
    v0, e1, e2, cross_e, w_u, w_v, d0, sid = scene
    n_block = o.shape[0]
    n_tri_pad = v0.shape[0]
    n_tiles = n_tri_pad // tri_tile

    oxd = jnp.cross(o, d)

    # True-f32 contractions, written as explicit broadcast multiply-adds so
    # they stay on the VPU. A plain jnp.dot here would route these K=3
    # contractions to the MXU in bf16, whose ~0.4% relative error
    # systematically misclassifies edge rays (measured as a +3e-4 bias on
    # the parallel-plates case); Precision.HIGHEST fixes the bias but pays
    # for 6-pass MXU emulation at 3/128 utilization. Elementwise f32 is both
    # exact and faster.
    def dot3(a, b):  # (B, 3) x (T, 3) -> (B, T)
        return (
            a[:, None, 0] * b[None, :, 0]
            + a[:, None, 1] * b[None, :, 1]
            + a[:, None, 2] * b[None, :, 2]
        )

    def tile_body(i, carry):
        best_t, best_code, any_hit = carry
        off = i * tri_tile
        sl1 = lambda a: jax.lax.dynamic_slice_in_dim(a, off, tri_tile, axis=0)
        ce = sl1(cross_e)  # (T, 3)
        det = -dot3(d, ce)  # (B, T)
        t_num = dot3(o, ce) - sl1(d0)[None, :]
        u_num = dot3(oxd, sl1(e2)) + dot3(d, sl1(w_u))
        v_num = -dot3(oxd, sl1(e1)) - dot3(d, sl1(w_v))

        sign = jnp.where(det >= 0.0, 1.0, -1.0).astype(det.dtype)
        abs_det = det * sign
        un = u_num * sign
        vn = v_num * sign
        t_hit = t_num / det
        # Predicate min-tree (see trace_pallas._tile_step): bitwise-
        # equivalent to the five chained compares (IEEE: a <= b iff
        # b - a >= 0; min >= 0 iff all >= 0; NaNs fail either way), fewer
        # (B, T) ops. The t_hit test has no equivalent subtraction form and
        # stays a separate compare.
        # 4-term tree: the (un <= abs_det) compare is bitwise-redundant,
        # see trace_pallas._tile_step
        margin = jnp.minimum(
            jnp.minimum(abs_det - 1e-7, un),
            jnp.minimum(vn, abs_det - (un + vn)),
        )
        valid = (margin >= 0.0) & (t_hit > 1e-6) & ray_valid[:, None]

        if want_any:
            any_hit = any_hit | jnp.any(valid & sl1(mask_any)[None, :], axis=1)

        if want_matrix:
            t_masked = jnp.where(valid & sl1(mask_mat)[None, :], t_hit, INF)
            tile_best = jnp.min(t_masked, axis=1)
            # Winner's packed code via a second min-reduction (no gather /
            # argmin: TPU gathers serialize). Ties pick the smallest code.
            codes = sl1(sid)[None, :] * 2 + (det > 0.0).astype(jnp.int32)
            code_masked = jnp.where(
                t_masked == tile_best[:, None], codes, jnp.int32(2**30)
            )
            code = jnp.min(code_masked, axis=1)
            take = tile_best < best_t
            best_t = jnp.where(take, tile_best, best_t)
            best_code = jnp.where(take, code, best_code)

        return best_t, best_code, any_hit

    if tile_bounds is not None:
        lo_all, hi_all = tile_bounds
        d_zero = jnp.abs(d) <= 1e-30
        inv_d = 1.0 / jnp.where(d_zero, 1.0, d)
        d_pos = d >= 0.0

    if tile_active is not None or tile_bounds is not None:
        inner_body = tile_body

        def tile_body(i, carry):  # noqa: F811 - conditional wrapper
            needed = jnp.bool_(True)
            if tile_active is not None:
                needed = tile_active[i] > 0
            if tile_bounds is not None:
                best_t, _, any_hit = carry
                near_c, far_c = _ray_box_interval(
                    o, d_pos, d_zero, inv_d, lo_all[i][None, :], hi_all[i][None, :]
                )
                hit_box = (far_c >= near_c) & (far_c > 1e-6) & ray_valid
                ray_need = jnp.zeros_like(hit_box)
                if want_matrix:
                    ray_need = hit_box & (near_c < best_t)
                if want_any:
                    ray_need = ray_need | (hit_box & ~any_hit)
                needed = needed & jnp.any(ray_need)
            return jax.lax.cond(
                needed, lambda c: inner_body(i, c), lambda c: c, carry
            )

    if tile_order is not None:
        ordered_body = tile_body

        def tile_body(j, carry):  # noqa: F811 - visit-order indirection
            return ordered_body(tile_order[j], carry)

    # Derive the loop carry from the (possibly shard_map-varying) ray arrays
    # so its variance annotation matches the loop body's outputs.
    zero = o[:, 0] * 0.0
    init = (
        zero + INF,
        zero.astype(jnp.int32) - 1,
        zero > 0.0,
    )
    best_t, best_code, any_hit = jax.lax.fori_loop(0, n_tiles, tile_body, init)
    best_code = jnp.where(best_t < INF, best_code, -1)
    return best_code, any_hit


# ---------------------------------------------------------------------------
# Per-block histograms
# ---------------------------------------------------------------------------


def _matrix_histogram(best_code: jnp.ndarray, n_surf: int):
    """Front/back hit counts per surface from packed hit codes (sid*2+front)."""
    hit = best_code >= 0
    sid = best_code >> 1
    front = (best_code & 1) == 1
    eq = (sid[:, None] == jnp.arange(n_surf, dtype=jnp.int32)[None, :]) & hit[:, None]
    counts_f = jnp.sum(eq & front[:, None], axis=0, dtype=jnp.int32)
    counts_b = jnp.sum(eq & ~front[:, None], axis=0, dtype=jnp.int32)
    return counts_f, counts_b


def _sky_histogram(direction: jnp.ndarray, miss: jnp.ndarray):
    """Tregenza bin counts of unblocked upward rays."""
    pid = tregenza_patch_id(direction[:, 0], direction[:, 1], direction[:, 2])
    eq = (pid[:, None] == jnp.arange(TREGENZA_BINS, dtype=jnp.int32)[None, :]) & miss[
        :, None
    ]
    return jnp.sum(eq, axis=0, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Chunked solve step
# ---------------------------------------------------------------------------


def _trace_and_reduce_block(
    scene: Tuple,
    tables_block: Tuple,
    geom: Tuple,
    cp_row,
    ray_valid,
    m_any,
    m_mat,
    tiles_on,
    *,
    tri_tile: int,
    want_matrix: bool,
    want_any: bool,
    discrete: bool,
    n_surf: int,
    tile_bounds: Tuple | None = None,
    tile_order: jnp.ndarray | None = None,
) -> Dict[str, jnp.ndarray]:
    """Raygen + sweep + histograms for one ray block (shared by the chunked
    and scheduled solve steps)."""
    o, d = generate_rays(tables_block, geom, cp_row)
    best_code, any_hit = _sweep_tiles(
        o,
        d,
        ray_valid,
        scene,
        m_any,
        m_mat,
        tri_tile=tri_tile,
        want_matrix=want_matrix,
        want_any=want_any,
        tile_active=tiles_on,
        tile_bounds=tile_bounds,
        tile_order=tile_order,
    )
    out: Dict[str, jnp.ndarray] = {}
    if want_matrix:
        counts_f, counts_b = _matrix_histogram(best_code, n_surf)
        out["counts_f"] = counts_f
        out["counts_b"] = counts_b
    if want_any:
        miss = ~any_hit & ray_valid
        if discrete:
            out["sky_bins"] = _sky_histogram(d, miss)
        else:
            out["upward"] = jnp.sum(miss & (d[:, 2] > 0.0), dtype=jnp.int32)
    return out


def chunk_body(
    scene: Tuple,
    tables: Tuple,
    geom: Tuple,
    cp: jnp.ndarray,
    surf_active_ext: jnp.ndarray,
    emit_sid: jnp.ndarray,
    min_sid: jnp.ndarray,
    n_rays_once: jnp.ndarray,
    *,
    ray_block: int,
    tri_tile: int,
    want_matrix: bool,
    want_any: bool,
    discrete: bool,
    ray_index_base=0,
    plane_vec=None,
    accel=None,
) -> Dict[str, jnp.ndarray]:
    """Trace ``chunk`` iterations over the local per-ray tables.

    ``tables`` may be the full per-emitter tables or a shard of them (for
    multi-device solves, each device traces a disjoint ray-index slice,
    ``ray_index_base`` is its global offset, and the partial counts are
    psummed by the caller). Per-iteration ray counts are raw local counts;
    normalization happens on host. ``accel`` is the optional fine-grained
    (tile_lo, tile_hi) AABB pair enabling distance-pruned tile gating.
    """
    if scene[0] is None:
        raise ValueError(
            "slim (pack-resident) scene packs keep only sid + the operand "
            "pack on device; the XLA sweep needs the full scene arrays — "
            "use the Pallas kernel (chunk_body_pallas with tri_pack=)"
        )
    chunk = cp.shape[0]
    n_local = tables[0].shape[0]
    blocks_per_iter = n_local // ray_block
    n_blocks = chunk * blocks_per_iter

    m_any, m_mat = compute_masks(scene, surf_active_ext, emit_sid, min_sid, plane_vec)
    tiles_on = tile_activity(m_any if want_any else m_mat, tri_tile)
    n_surf = surf_active_ext.shape[0] - 1
    if accel is not None:
        tile_order, tile_lo, tile_hi = plan_tiles(accel, geom, tri_tile)
        tile_bounds = (tile_lo, tile_hi)
    else:
        tile_order = tile_bounds = None

    block_ids = jnp.arange(n_blocks, dtype=jnp.int32)

    def run_block(bid):
        itr = bid // blocks_per_iter
        off = (bid % blocks_per_iter) * ray_block
        tb = tuple(
            jax.lax.dynamic_slice_in_dim(t, off, ray_block, axis=0) for t in tables
        )
        # Global ray index inside the iteration decides validity (tail pad).
        ray_idx = ray_index_base + off + jnp.arange(ray_block, dtype=jnp.int32)
        return _trace_and_reduce_block(
            scene, tb, geom, cp[itr], ray_idx < n_rays_once,
            m_any, m_mat, tiles_on,
            tri_tile=tri_tile, want_matrix=want_matrix, want_any=want_any,
            discrete=discrete, n_surf=n_surf,
            tile_bounds=tile_bounds, tile_order=tile_order,
        )

    stacked = jax.lax.map(run_block, block_ids)
    # (n_blocks, ...) -> (chunk, blocks_per_iter, ...) -> per-iteration sums
    out: Dict[str, jnp.ndarray] = {}
    for key, val in stacked.items():
        per_iter = val.reshape((chunk, blocks_per_iter) + val.shape[1:])
        out[key] = jnp.sum(per_iter, axis=1, dtype=jnp.int32)
    return out


@partial(
    jax.jit,
    static_argnames=(
        "ray_block", "tri_tile", "want_matrix", "want_any", "discrete",
        "pack_out",
    ),
)
def scheduled_trace(
    scene: Tuple,
    tables_flat: Tuple,  # 7 x (N_flat,) concatenated per-emitter tables
    geom_stacked: Tuple,  # 8 x (E, Fmax[, 3]) padded per-emitter geometry
    cp: jnp.ndarray,  # (R, 7) CP rows, indexed by the schedule
    surf_active_ext: jnp.ndarray,  # (E, S+1) — E may be a compacted subset
    emit_sid: jnp.ndarray,  # (E,)
    min_sid: jnp.ndarray,  # (E,)
    n_rays_once: jnp.ndarray,  # (E,)
    plane_vec: jnp.ndarray,  # (E, 8)
    schedule: jnp.ndarray,  # (nb, 4) i32: [emitter_row, cp_row, table_off, ray_base]
    accel=None,  # optional (tile_lo, tile_hi) at ACCEL_GRAIN granularity
    sel=None,  # optional (E,) i32: emitter row -> row of the FULL geom stack
    *,
    ray_block: int,
    tri_tile: int,
    want_matrix: bool,
    want_any: bool,
    discrete: bool,
    pack_out: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Trace an arbitrary block schedule spanning many emitters/iterations.

    The scheduler's generalization of :func:`chunk_body`: each of the ``nb``
    blocks names its emitter, Cranley-Patterson row, offset into the flat
    ray tables and in-iteration ray base, so ONE dispatch can cover any mix
    of (emitter, iteration) work — e.g. a whole scene's convergence round.
    Returns per-block histograms (nb, ...) that the host aggregates back to
    (emitter, iteration) using the same schedule. Padding blocks (used to
    keep ``nb`` in a small set of compiled sizes) are simply ignored by the
    host aggregation.
    """
    n_emit = surf_active_ext.shape[0]
    n_surf = surf_active_ext.shape[1] - 1
    if sel is not None:
        # compact the full geometry stack to this round's emitter set inside
        # the program (one fused gather) instead of 8 host-driven device ops
        geom_stacked = jax.tree.map(
            lambda g: jnp.take(g, sel, axis=0), geom_stacked
        )

    # Per-emitter triangle masks and tile activity for the (compacted) set
    # of emitters this schedule references. Callers pass per-round stacks,
    # so late rounds with a few stragglers don't pay full-scene mask work.
    def emitter_masks(e):
        m_any, m_mat = compute_masks(
            scene, surf_active_ext[e], emit_sid[e], min_sid[e], plane_vec[e]
        )
        relevant = m_any if want_any else m_mat
        return m_any, m_mat, tile_activity(relevant, tri_tile)

    m_any_all, m_mat_all, tiles_on_all = jax.vmap(emitter_masks)(
        jnp.arange(n_emit, dtype=jnp.int32)
    )
    if accel is not None:
        # tile boxes are scene-wide; only the near-to-far order is
        # per-emitter (stacked geometry is zero-padded, which can only
        # loosen the emitter AABB — order is a heuristic, results exact)
        def emitter_order(e):
            geom_e = tuple(g[e] for g in geom_stacked[:4])
            order, _, _ = plan_tiles(accel, geom_e, tri_tile)
            return order

        order_all = jax.vmap(emitter_order)(jnp.arange(n_emit, dtype=jnp.int32))
        _, tile_lo, tile_hi = plan_tiles(
            accel, tuple(g[0] for g in geom_stacked[:4]), tri_tile
        )
        tile_bounds = (tile_lo, tile_hi)
    else:
        order_all = tile_bounds = None

    def run_block(block_row):
        e = block_row[0]
        off = block_row[2]
        tb = tuple(
            jax.lax.dynamic_slice_in_dim(t, off, ray_block, axis=0)
            for t in tables_flat
        )
        geom_e = tuple(
            jax.lax.dynamic_index_in_dim(g, e, axis=0, keepdims=False)
            for g in geom_stacked
        )
        ray_idx = block_row[3] + jnp.arange(ray_block, dtype=jnp.int32)
        return _trace_and_reduce_block(
            scene, tb, geom_e, cp[block_row[1]], ray_idx < n_rays_once[e],
            m_any_all[e], m_mat_all[e], tiles_on_all[e],
            tri_tile=tri_tile, want_matrix=want_matrix, want_any=want_any,
            discrete=discrete, n_surf=n_surf,
            tile_bounds=tile_bounds,
            tile_order=order_all[e] if order_all is not None else None,
        )

    out = jax.lax.map(run_block, schedule)
    return pack_outputs(out) if pack_out else out


@partial(
    jax.jit,
    static_argnames=(
        "sched_block", "ray_block", "tri_tile", "want_matrix", "want_any",
        "discrete", "interpret", "pack_out",
    ),
)
def scheduled_trace_pallas(
    scene: Tuple,
    tables_flat: Tuple,  # 7 x (N_flat,) concatenated per-emitter tables
    geom_stacked: Tuple,  # 8 x (E, Fmax[, 3]) padded per-emitter geometry
    cp: jnp.ndarray,  # (R, 7) CP rows, indexed by the schedule
    surf_active_ext: jnp.ndarray,  # (E, S+1) — compacted per-round subset
    emit_sid: jnp.ndarray,  # (E,)
    min_sid: jnp.ndarray,  # (E,)
    n_rays_once: jnp.ndarray,  # (E,)
    plane_vec: jnp.ndarray,  # (E, 8)
    schedule: jnp.ndarray,  # (nb, 4) i32: [emitter_row, cp_row, table_off, ray_base]
    accel=None,  # optional (tile_lo, tile_hi) at ACCEL_GRAIN granularity
    sel=None,  # optional (E,) i32: emitter row -> row of the FULL geom stack
    *,
    sched_block: int,  # rays per schedule row (the driver's RAY_BLOCK)
    ray_block: int,  # Pallas grid block (divides sched_block)
    tri_tile: int,
    want_matrix: bool,
    want_any: bool,
    discrete: bool,
    interpret: bool = False,
    pack_out: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Pallas variant of :func:`scheduled_trace`: one dispatch per convergence
    round AND the fused AABB-gated sweep kernel.

    Raygen runs vectorized over the schedule rows, rays are materialized
    once (the driver caps the round's ray budget accordingly), and the
    multi-emitter sweep (ops.trace_pallas.sweep_rays_scheduled) selects each
    block's eligibility masks through the scalar-prefetched emitter map.
    Returns the same per-block histogram contract as :func:`scheduled_trace`.
    """
    from .trace_pallas import build_tri_pack, sweep_rays_scheduled

    # The batched raygen below slices the flat tables as (-1, sched_block)
    # rows, so every emitter's table offset — and hence the flat total —
    # must be a sched_block multiple. The driver guarantees this by
    # requesting get_flat_tables(align=RAY_BLOCK); a caller with a
    # different align would silently read the wrong QMC slices, so fail
    # loudly here (shapes are static, this raises at trace time).
    if tables_flat[0].shape[0] % sched_block:
        raise ValueError(
            f"flat ray tables ({tables_flat[0].shape[0]} rows) are not a "
            f"multiple of sched_block={sched_block}; build them with "
            f"get_flat_tables(align=<multiple of sched_block>)"
        )

    nb = schedule.shape[0]
    n_emit = surf_active_ext.shape[0]
    n_surf = surf_active_ext.shape[1] - 1
    if sel is not None:
        # compact the full geometry stack to this round's emitter set inside
        # the program (one fused gather) instead of 8 host-driven device ops
        geom_stacked = jax.tree.map(
            lambda g: jnp.take(g, sel, axis=0), geom_stacked
        )

    def emitter_masks(e):
        return compute_masks(
            scene, surf_active_ext[e], emit_sid[e], min_sid[e], plane_vec[e]
        )

    m_any_all, m_mat_all = jax.vmap(emitter_masks)(
        jnp.arange(n_emit, dtype=jnp.int32)
    )
    # combined rows: m_any + m_mat in {0, 1, 2} (m_mat is a subset of m_any)
    masks = m_any_all.astype(jnp.float32) + m_mat_all.astype(jnp.float32)

    # Batched raygen: whole-row takes from (n_blocks, SB)-shaped tables and
    # single-level per-ray gathers from emitter-flattened geometry. Bitwise
    # identical to per-row generate_rays, ~2x faster than vmapping dynamic
    # slices (which lower to elementwise gathers).
    cdf_s, tri_a, tri_e1, tri_e2, tri_u, tri_v, tri_n, tri_eps = geom_stacked
    n_geom, f_max = cdf_s.shape  # may carry more rows than the emitter set
    flat3 = lambda g: g.reshape(n_geom * f_max, 3)
    a_f, e1_f, e2_f, u_f, v_f, n_f = map(
        flat3, (tri_a, tri_e1, tri_e2, tri_u, tri_v, tri_n)
    )
    eps_f = tri_eps.reshape(n_geom * f_max)
    row_ids = schedule[:, 2] // sched_block
    u_c, v_c, h_tri, h_u, h_v, h_r1, h_r2 = (
        jnp.take(t.reshape(-1, sched_block), row_ids, axis=0)
        for t in tables_flat
    )
    cp_b = jnp.take(cp, schedule[:, 1], axis=0)  # (nb, 7)
    c = lambda k: cp_b[:, k : k + 1]
    ug = jnp.mod(u_c + c(0), 1.0)
    vg = jnp.mod(v_c + c(1), 1.0)
    q_tri = jnp.mod(h_tri + c(2), 1.0)
    cdf_b = jnp.take(cdf_s, schedule[:, 0], axis=0)
    from ..config import RAYGEN_ONEHOT_MAX_FACES

    if f_max <= RAYGEN_ONEHOT_MAX_FACES:
        # Dense small-F formulation, value-identical to the gather path
        # and ~10x faster (TPU scalar gathers serialize; searchsorted
        # lowers to a per-ray binary-search gather chain):
        # - CDF pick by compare-sum: searchsorted(cdf, q, "left") is by
        #   definition the count of cdf entries < q.
        # - Geometry fetch as a one-hot batched matmul: exactly one operand
        #   row per ray is nonzero, and Precision.HIGHEST's f32 emulation
        #   reproduces 1.0 * v exactly (the bf16 triple-split of v sums
        #   back to v) — with one caveat: a -0.0 geometry value returns as
        #   +0.0 (1.0 * -0.0 summed with +0.0 zero terms is +0.0 in IEEE).
        #   No downstream comparison observes the sign of zero, so counts
        #   and results still match the gather path exactly.
        tri = jnp.clip(
            jnp.sum(cdf_b[:, None, :] < q_tri[:, :, None], axis=2,
                    dtype=jnp.int32),
            0, f_max - 1,
        )
        pack19 = jnp.concatenate(
            [tri_a, tri_e1, tri_e2, tri_u, tri_v, tri_n, tri_eps[..., None]],
            axis=-1,
        )  # (n_geom, F, 19)
        pk = jnp.take(pack19, schedule[:, 0], axis=0)  # (nb, F, 19)
        onehot = (
            tri[:, :, None] == jnp.arange(f_max, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)
        g19 = jax.lax.dot_general(
            onehot, pk,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
        )  # (nb, SB, 19)
        g_a, g_e1, g_e2, g_u, g_v, g_n = (
            g19[..., 3 * k : 3 * k + 3] for k in range(6)
        )
        g_eps = g19[..., 18]
    else:
        tri = jnp.clip(
            jax.vmap(lambda cd, q: jnp.searchsorted(cd, q, side="left"))(
                cdf_b, q_tri
            ),
            0, f_max - 1,
        )
        gidx = schedule[:, 0:1] * f_max + tri  # (nb, SB) flat triangle ids
        take3 = lambda g: jnp.take(g, gidx.reshape(-1), axis=0).reshape(
            gidx.shape + (3,)
        )
        g_a, g_e1, g_e2, g_u, g_v, g_n = map(
            take3, (a_f, e1_f, e2_f, u_f, v_f, n_f)
        )
        g_eps = jnp.take(eps_f, gidx.reshape(-1), axis=0).reshape(gidx.shape)
    ur = jnp.mod(h_u + c(3) + ug, 1.0)
    vr = jnp.mod(h_v + c(4) + vg, 1.0)
    s = jnp.sqrt(ur)
    point = g_a + (s * vr)[..., None] * g_e1 + (s * (1.0 - vr))[..., None] * g_e2
    r1 = jnp.mod(h_r1 + c(5), 1.0)
    r2 = jnp.mod(h_r2 + c(6), 1.0)
    sin_t = jnp.sqrt(1.0 - r1)
    phi = TWO_PI * r2
    d = (
        (sin_t * jnp.cos(phi))[..., None] * g_u
        + (sin_t * jnp.sin(phi))[..., None] * g_v
        + jnp.sqrt(r1)[..., None] * g_n
    )
    o = point + g_eps[..., None] * g_n
    ray_valid = (
        schedule[:, 3:4] + jnp.arange(sched_block, dtype=jnp.int32)[None, :]
        < jnp.take(n_rays_once, schedule[:, 0])[:, None]
    )  # (nb, SB)
    from .trace_pallas import gate_prunes

    if gate_prunes(accel, scene[0].shape[0], tri_tile):
        # Coherence sort within each schedule row (rows never mix emitters),
        # so the block-level AABB gate sees tight ray bundles. Histograms
        # are permutation-invariant per row: results unchanged. Skipped
        # whenever the gate cannot prune (no accel tables, or the scene
        # fits a single tile) — the sort exists only to make the gate fire,
        # and costs more than the whole sweep on small scenes.
        scene_lo = jnp.min(accel[0], axis=0)
        scene_hi = jnp.max(accel[1], axis=0)
        o, d, ray_valid = sort_rays_for_coherence(
            o, d, ray_valid, scene_lo=scene_lo, scene_hi=scene_hi
        )
    # transposed (9, N) store: 16-sublane tiles are waste-free where the
    # former (N, 9->16) layout lane-padded to 128 (8x round temp memory)
    rays9 = jnp.concatenate(
        [o, d, jnp.cross(o, d)], axis=-1
    ).reshape(nb * sched_block, 9).T

    zeros_mask = jnp.zeros_like(scene[7], dtype=bool)
    tri_pack = build_tri_pack(scene, zeros_mask, zeros_mask)
    emap = jnp.repeat(schedule[:, 0], sched_block // ray_block)
    codes, any_hit = sweep_rays_scheduled(
        rays9, tri_pack, masks, emap,
        ray_block=ray_block, tri_tile=tri_tile,
        want_matrix=want_matrix, want_any=want_any,
        interpret=interpret, accel=accel,
    )
    codes = codes.reshape(nb, sched_block)
    any_hit = any_hit.reshape(nb, sched_block) > 0

    out: Dict[str, jnp.ndarray] = {}
    if want_matrix:
        codes = jnp.where(ray_valid, codes, -1)

        def count_code(target):
            return jnp.sum(codes == target, axis=1, dtype=jnp.int32)

        targets_b = jnp.arange(n_surf, dtype=jnp.int32) * 2
        out["counts_b"] = jax.lax.map(count_code, targets_b).T
        out["counts_f"] = jax.lax.map(count_code, targets_b + 1).T
    if want_any:
        miss = ~any_hit & ray_valid
        dz = d[..., 2]
        if discrete:
            pid = tregenza_patch_id(d[..., 0], d[..., 1], dz)
            pid = jnp.where(miss, pid, -1)

            def count_bin(b):
                return jnp.sum(pid == b, axis=1, dtype=jnp.int32)

            out["sky_bins"] = jax.lax.map(
                count_bin, jnp.arange(TREGENZA_BINS, dtype=jnp.int32)
            ).T
        else:
            out["upward"] = jnp.sum(miss & (dz > 0.0), axis=1, dtype=jnp.int32)
    return pack_outputs(out) if pack_out else out


def pack_outputs(out: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Flatten a scheduled-trace output dict (all i32) into ONE vector in
    sorted-key order. Every device->host read on a remote-tunnel TPU is a
    blocking RPC (~35-100 ms); fetching one packed array instead of one per
    output halves the per-round host round-trips. unpack_outputs inverts."""
    return jnp.concatenate([out[k].reshape(-1) for k in sorted(out)])


def unpack_outputs(flat, nb: int, n_surf: int, *, want_matrix: bool,
                   want_any: bool, discrete: bool) -> Dict:
    """Host-side inverse of :func:`pack_outputs` (numpy, zero-copy views)."""
    import numpy as np

    shapes = {}
    if want_matrix:
        shapes["counts_b"] = (nb, n_surf)
        shapes["counts_f"] = (nb, n_surf)
    if want_any:
        if discrete:
            shapes["sky_bins"] = (nb, TREGENZA_BINS)
        else:
            shapes["upward"] = (nb,)
    host, off = {}, 0
    for k in sorted(shapes):
        n = int(np.prod(shapes[k]))
        host[k] = np.asarray(flat[off : off + n]).reshape(shapes[k])
        off += n
    if off != flat.size:
        raise ValueError(f"packed output size mismatch: {off} != {flat.size}")
    return host


def chunk_body_pallas(
    scene: Tuple,
    tables: Tuple,
    geom: Tuple,
    cp: jnp.ndarray,
    surf_active_ext: jnp.ndarray,
    emit_sid: jnp.ndarray,
    min_sid: jnp.ndarray,
    n_rays_once: jnp.ndarray,
    *,
    ray_block: int,
    tri_tile: int,
    want_matrix: bool,
    want_any: bool,
    discrete: bool,
    ray_index_base=0,
    plane_vec=None,
    accel=None,
    tri_pack=None,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Pallas-kernel variant of :func:`chunk_body`.

    Raygen runs as one vectorized XLA program over the whole chunk, the
    sweep is the fused VMEM kernel (ops/trace_pallas.py), and the histograms
    reduce the (chunk, n_local) hit codes with plain fused comparisons.

    ``tri_pack`` (a prebuilt (24, Tpad) operand pack — prepared.pack_scene
    slim mode) switches to the pack-resident path for huge scenes: the
    dispatch reuses the device-resident pack instead of assembling one from
    the scene arrays (which would hold both the ~80 B/tri scene fields and
    the 96 B/tri pack in HBM at once — an OOM past ~90M triangles on a
    16 GB chip), and the kernel derives eligibility from the pack's code
    row plus two scalars (trace_pallas ``code_bounds``). The scene tuple
    then only needs ``sid``; results match the baked path exactly.
    """
    from .trace_pallas import build_tri_pack, gate_prunes, sweep_rays

    chunk = cp.shape[0]
    n_local = tables[0].shape[0]
    n_total = chunk * n_local
    n_surf = surf_active_ext.shape[0] - 1
    n_tri_pad = tri_pack.shape[1] if tri_pack is not None else scene[0].shape[0]

    o, d = jax.vmap(generate_rays, in_axes=(None, None, 0))(tables, geom, cp)
    ray_valid = jnp.broadcast_to(
        (jnp.arange(n_local, dtype=jnp.int32) + ray_index_base < n_rays_once),
        (chunk, n_local),
    )
    if gate_prunes(accel, n_tri_pad, tri_tile):
        # Coherence sort (per iteration): the block-level AABB gate only
        # fires when a whole block agrees a tile is irrelevant, which needs
        # direction/origin-coherent blocks. Reductions are permutation-
        # invariant, so this cannot change any count. Skipped when the gate
        # cannot prune (single-tile scene / no tables): sorting would cost
        # more than the sweep and save nothing.
        scene_lo = jnp.min(accel[0], axis=0)
        scene_hi = jnp.max(accel[1], axis=0)
        o, d, ray_valid = sort_rays_for_coherence(
            o, d, ray_valid, scene_lo=scene_lo, scene_hi=scene_hi
        )
    # transposed (9, N) store — see scheduled_trace_pallas: lane-waste-free
    rays9 = jnp.concatenate([o, d, jnp.cross(o, d)], axis=-1).reshape(n_total, 9).T

    if tri_pack is not None:
        # slim pack-resident mode: masks from sid only (tile activity and
        # gate compaction); per-pair eligibility runs in-kernel from the
        # pack's code row against (emit_code, min_code)
        m_any, m_mat = compute_masks_slim(
            scene[7], surf_active_ext, emit_sid, min_sid
        )
        primary = m_any if want_any else m_mat
        code_bounds = jnp.stack(
            [
                (emit_sid * 2).astype(jnp.float32),
                (min_sid * 2).astype(jnp.float32),
            ]
        )
        codes, any_hit = sweep_rays(
            rays9,
            tri_pack,
            primary,
            ray_block=ray_block,
            tri_tile=tri_tile,
            want_matrix=want_matrix,
            want_any=want_any,
            interpret=interpret,
            accel=accel,
            code_bounds=code_bounds,
        )
    else:
        m_any, m_mat = compute_masks(
            scene, surf_active_ext, emit_sid, min_sid, plane_vec
        )
        # bake the primary mask into zeroed cross_e rows (det = 0
        # rejection), so the kernel's hot loop runs without per-pair mask
        # tests — result-exact
        primary = m_any if want_any else m_mat
        pack = build_tri_pack(scene, m_any, m_mat, bake=primary)
        codes, any_hit = sweep_rays(
            rays9,
            pack,
            primary,
            ray_block=ray_block,
            tri_tile=tri_tile,
            want_matrix=want_matrix,
            want_any=want_any,
            interpret=interpret,
            accel=accel,
            masks_baked=True,
        )

    codes = codes.reshape(chunk, n_local)
    any_hit = any_hit.reshape(chunk, n_local) > 0

    out: Dict[str, jnp.ndarray] = {}
    if want_matrix:
        codes = jnp.where(ray_valid, codes, -1)

        def count_code(target):
            return jnp.sum(codes == target, axis=1, dtype=jnp.int32)

        targets_b = jnp.arange(n_surf, dtype=jnp.int32) * 2
        out["counts_b"] = jax.lax.map(count_code, targets_b).T
        out["counts_f"] = jax.lax.map(count_code, targets_b + 1).T
    if want_any:
        miss = ~any_hit & ray_valid
        dz = d[..., 2].reshape(chunk, n_local)
        if discrete:
            pid = tregenza_patch_id(
                d[..., 0].reshape(chunk, n_local),
                d[..., 1].reshape(chunk, n_local),
                dz,
            )
            pid = jnp.where(miss, pid, -1)

            def count_bin(b):
                return jnp.sum(pid == b, axis=1, dtype=jnp.int32)

            out["sky_bins"] = jax.lax.map(
                count_bin, jnp.arange(TREGENZA_BINS, dtype=jnp.int32)
            ).T
        else:
            out["upward"] = jnp.sum(miss & (dz > 0.0), axis=1, dtype=jnp.int32)
    return out


@partial(
    jax.jit,
    static_argnames=(
        "ray_block", "tri_tile", "want_matrix", "want_any", "discrete",
        "kernel", "interpret",
    ),
)
def trace_chunk(
    scene: Tuple,
    tables: Tuple,
    geom: Tuple,
    cp: jnp.ndarray,
    surf_active_ext: jnp.ndarray,
    emit_sid: jnp.ndarray,
    min_sid: jnp.ndarray,
    n_rays_once: jnp.ndarray,
    plane_vec=None,
    accel=None,
    tri_pack=None,
    *,
    ray_block: int,
    tri_tile: int,
    want_matrix: bool,
    want_any: bool,
    discrete: bool,
    kernel: str = "xla",
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Single-device jitted chunk step. See :func:`chunk_body`."""
    if tri_pack is not None and kernel != "pallas":
        raise ValueError(
            "slim (pack-resident) scene packs require kernel='pallas'"
        )
    body = chunk_body_pallas if kernel == "pallas" else chunk_body
    kwargs = dict(
        ray_block=ray_block,
        tri_tile=tri_tile,
        want_matrix=want_matrix,
        want_any=want_any,
        discrete=discrete,
        plane_vec=plane_vec,
        accel=accel,
    )
    if kernel == "pallas":
        kwargs["interpret"] = interpret
        kwargs["tri_pack"] = tri_pack
    return body(
        scene,
        tables,
        geom,
        cp,
        surf_active_ext,
        emit_sid,
        min_sid,
        n_rays_once,
        **kwargs,
    )


__all__ = [
    "generate_rays",
    "pack_outputs",
    "unpack_outputs",
    "chunk_body",
    "chunk_body_pallas",
    "compute_masks_slim",
    "scheduled_trace",
    "scheduled_trace_pallas",
    "trace_chunk",
    "plan_tiles",
    "INF",
]
