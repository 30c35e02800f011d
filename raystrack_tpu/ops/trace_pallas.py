"""Pallas TPU sweep kernel: Möller-Trumbore over ray blocks x triangle tiles.

Replaces the XLA per-block sweep of ops/trace.py with a single fused VMEM
kernel. The XLA path materializes several (block, tile) intermediates across
fusion boundaries (HBM round trips); here one grid step keeps everything in
VMEM: the per-triangle operand pack is VMEM-resident for the whole grid, a
ray block is (B, 9) [o | d | o x d] on sublanes, and each tile step computes
the intersection predicates as (B,1)x(1,T) broadcast multiply-adds (exact
f32 on the VPU — no MXU, no bf16 rounding), then folds a masked min over the
tile into the running nearest-hit carry.

Layout choices (HBM-compact; one in-kernel relayout):
- rays   (16, N) f32 [o | d | o x d | pad]: 16 sublanes x N lanes tiles
  waste-free, where the former (N, 16) store lane-padded 16 -> 128 (8x HBM
  memory and write+read traffic — 2.1 GB of temp at the 4.2M-ray round
  budget). The kernel block is (16, B); one swapaxes relayouts it to
  (B, 16) so ray components stay (B, 1) columns for the sweep math.
- tris   (24, Tpad), VMEM-resident: operand rows are (1, T) slices
  rows: 0-2 cross_e, 3-5 e1, 6-8 e2, 9-11 v0 x e2, 12-14 v0 x e1,
        15 d0 = v0.cross_e, 16 code_base = 2*sid, 17 mask_any, 18 mask_mat
- outputs (n_blocks, B) i32 hit code / any-hit flag: 8-row blocks revisited
  by 8 consecutive grid steps (an (N, 1) output lane-pads 1 -> 128, 128x)

Per-pair math and epsilons are identical to ops/trace.py (|det| >= 1e-7,
t > 1e-6, front = det > 0); ray-validity masking of padded rays and the
per-surface histograms stay outside the kernel.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1.0e20
TRI_ROWS = 24  # 19 used, padded to a sublane multiple

# Scalar-memory budget (entries) for the scheduled sweep's per-emitter tile
# activity table; past it the table collapses to the union over emitters
# (conservative, results unchanged — extra tiles run fully-masked pair math).
SCHED_TILES_SMEM_BUDGET = 65536

ROW_CE = 0
ROW_E1 = 3
ROW_E2 = 6
ROW_WU = 9
ROW_WV = 12
ROW_D0 = 15
ROW_CODE = 16
ROW_MASK_ANY = 17
ROW_MASK_MAT = 18


def sweep_tile_width(n_tri_pad: int, tri_tile: int) -> int:
    """The tile width the sweep kernels will actually use: the requested
    width shrunk (halved) until it divides the padded triangle count."""
    tile = min(tri_tile, n_tri_pad)
    while tile > 128 and n_tri_pad % tile != 0:
        tile //= 2
    return tile


def gate_prunes(accel, n_tri_pad: int, tri_tile: int) -> bool:
    """Whether the in-kernel distance gate can skip any pair math for this
    scene shape: it needs the AABB tables (``accel``), more than one tile
    (with a single tile there is nothing to prune past), and a per-box
    group size within GATE_MAX_GROUP (past the SMEM budget the gate goes
    two-level rather than off). Callers use this to decide whether the
    per-iteration coherence sort — whose only purpose is making the gate
    fire — is worth running."""
    from ..config import GATE_MAX_GROUP

    if accel is None:
        return False
    n_tiles = n_tri_pad // sweep_tile_width(n_tri_pad, tri_tile)
    return n_tiles > 1 and gate_group_size(n_tiles) <= GATE_MAX_GROUP


def build_tri_pack(scene: Tuple, m_any, m_mat, *, bake=None) -> jnp.ndarray:
    """Assemble the (24, Tpad) f32 operand pack for one dispatch.

    The precomputed masks (ops.trace.compute_masks) fold emitter exclusion,
    plane culling and the reciprocity half-matrix into two f32 rows; padded
    triangles carry cross_e = 0 so det = 0 rejects them without any extra
    mask.

    With ``bake`` (a per-triangle bool mask) the cross_e rows of ineligible
    triangles are zeroed, so det = 0 rejects them exactly like padding and
    the kernel can skip its per-pair mask test entirely (the hot-loop win:
    two fewer (B, T) ops per tile). Baking is RESULT-EXACT: a baked-out
    pair fails the same validity test a mask-row rejection fails, and
    eligible pairs compute identical values.
    """
    v0, e1, e2, cross_e, w_u, w_v, d0, sid = scene
    if bake is not None:
        cross_e = jnp.where(bake[:, None], cross_e, 0.0)
    rows = [
        cross_e.T,  # (3, T)
        e1.T,
        e2.T,
        w_u.T,
        w_v.T,
        d0[None, :],
        (sid * 2).astype(jnp.float32)[None, :],
        m_any.astype(jnp.float32)[None, :],
        m_mat.astype(jnp.float32)[None, :],
    ]
    rows32 = [r.astype(jnp.float32) for r in rows]
    pad = TRI_ROWS - sum(r.shape[0] for r in rows32)
    if pad:
        # Pad rows ride INSIDE the concatenate: a trailing jnp.pad would
        # materialize a second full-size HLO temp next to the concatenate
        # result (measured: 2 x 8.94 GB at 1e8 triangles = HBM OOM on v5e;
        # one fused concatenate peaks at half that).
        rows32.append(jnp.zeros((pad, rows32[0].shape[1]), jnp.float32))
    return jnp.concatenate(rows32, axis=0)


def _ray_columns(rays_ref):
    """(B, 1) component columns [o | d | o x d] from a (16, B) ray block.

    One whole-block swapaxes relayouts the transposed store back to
    ray-major; Mosaic legalizes the (16, B) -> (B, 16) transpose (probed on
    hardware) and it runs once per block against a tile loop of pair math.
    """
    r = jnp.swapaxes(rays_ref[...], 0, 1)  # (B, 16)
    col = lambda j: r[:, j : j + 1]
    return tuple(col(j) for j in range(9))


def _store_results(row, code_ref, any_ref, best_t, best_code, any_hit):
    """Write one block's (B, 1) results into output row ``row`` (the
    caller's program_id % 8 — computed OUTSIDE run_scoped bodies, where
    pl.program_id has no grid context). Outputs are (n_blocks, B) arrays
    visited in 8-row blocks by 8 consecutive grid steps (Pallas keeps a
    revisited output block in VMEM and flushes it once the index map moves
    on); an (N, 1) output would lane-pad 1 -> 128 = 128x HBM memory and
    traffic."""
    code = jnp.where(best_t < INF, best_code, -1)
    code_ref[pl.ds(row, 1), :] = jnp.swapaxes(code, 0, 1)
    any_ref[pl.ds(row, 1), :] = jnp.swapaxes(any_hit, 0, 1)


def _tile_step(rays, row, carry, *, want_matrix: bool, want_any: bool,
               m_any_row=None, m_mat_row=None, code_bounds=None):
    """One triangle-tile of the Möller-Trumbore sweep.

    ``rays`` are the 9 (B, 1) ray columns, ``row(r)`` yields the (1, T)
    operand row r of the current tile (VMEM-resident slice or DMA buffer),
    and ``carry`` is the running (best_t, best_code, any_hit). Shared by the
    resident and HBM-streaming kernels so the intersection math exists once.

    The eligibility masks default to the operand pack's baked-in rows;
    the scheduled kernels (one dispatch spanning many emitters) override
    them with ``m_any_row``/``m_mat_row`` getters returning per-tile BOOL
    eligibility rows read from per-emitter mask arrays instead. Passing the
    string ``"baked"`` for a mask skips its per-pair test entirely — use
    when the pack was built with :func:`build_tri_pack`'s ``bake`` option
    so ineligible triangles already fail the det test (two (B, T) ops saved
    per tile).

    ``code_bounds`` (a pair of f32 scalars ``(emit_code, min_code)``, both
    ``2 * sid``) derives the masks from the pack's OWN code row instead:
    ``m_any = code != emit_code`` (emitter exclusion) and
    ``m_mat = m_any & (code >= min_code)`` (the reciprocity half-matrix
    skip). This is the slim pack-resident mode for huge scenes whose pack
    is prebuilt once and never rewritten per dispatch: the surface-active
    plane cull is NOT re-tested per pair — exact, because a culled surface
    lies entirely behind the emission plane and can never be hit (the same
    invariant the baked path relies on when it masks those triangles out;
    reference: main.py:167-204) — while whole inactive tiles still drop
    out via ``tiles_on``. The extra cost is (1, T) compares only.
    """
    ox, oy, oz, dx, dy, dz, cx, cy, cz = rays
    best_t, best_code, any_hit = carry
    if code_bounds is not None:
        code = row(ROW_CODE)
        not_emit = code != code_bounds[0]
        m_any_row = lambda: not_emit
        m_mat_row = lambda: not_emit & (code >= code_bounds[1])
    if m_any_row is None:
        m_any_row = lambda: row(ROW_MASK_ANY) > 0.0
    if m_mat_row is None:
        m_mat_row = lambda: row(ROW_MASK_MAT) > 0.0

    # det = -(d . cross_e); t_num = o . cross_e - d0
    ce_x, ce_y, ce_z = row(ROW_CE), row(ROW_CE + 1), row(ROW_CE + 2)
    det = -(dx * ce_x + dy * ce_y + dz * ce_z)
    t_num = ox * ce_x + oy * ce_y + oz * ce_z - row(ROW_D0)

    # u_num = (o x d) . e2 + d . (v0 x e2)
    u_num = (
        cx * row(ROW_E2) + cy * row(ROW_E2 + 1) + cz * row(ROW_E2 + 2)
        + dx * row(ROW_WU) + dy * row(ROW_WU + 1) + dz * row(ROW_WU + 2)
    )
    # v_num = -((o x d) . e1) - d . (v0 x e1)
    v_num = -(
        cx * row(ROW_E1) + cy * row(ROW_E1 + 1) + cz * row(ROW_E1 + 2)
        + dx * row(ROW_WV) + dy * row(ROW_WV + 1) + dz * row(ROW_WV + 2)
    )

    sign = jnp.where(det >= 0.0, 1.0, -1.0)
    abs_det = det * sign
    un = u_num * sign
    vn = v_num * sign
    t_hit = t_num / det
    # Predicate min-tree: IEEE guarantees a <= b iff b - a >= 0 (a nonzero
    # real difference of two floats never rounds across zero; -0 >= 0 is
    # true), and min(x...) >= 0 iff every x >= 0 (NaNs propagate and fail
    # either way) — so this margin fold is BITWISE-equivalent to the five
    # chained compares it replaces, measurably faster (fewer (B, T) ops).
    # The t_hit test stays separate: t_num/det > 1e-6 has no subtraction
    # form with identical rounding.
    # The reference's fifth compare (un <= abs_det) is redundant — with
    # vn >= 0 and fl(un+vn) <= abs_det, IEEE round-to-nearest gives
    # un <= fl(un+vn) <= abs_det (rounding a value >= un, with un
    # representable, cannot land below un) — so the 4-term tree decides
    # identically, one sub and one min cheaper per (B, T) tile.
    margin = jnp.minimum(
        jnp.minimum(abs_det - 1e-7, un),
        jnp.minimum(vn, abs_det - (un + vn)),
    )
    valid = (margin >= 0.0) & (t_hit > 1e-6)

    if want_any:
        blocked = valid if m_any_row == "baked" else (valid & m_any_row())
        any_hit = jnp.maximum(
            any_hit, jnp.any(blocked, axis=1, keepdims=True).astype(jnp.int32)
        )

    if want_matrix:
        mat_ok = valid if m_mat_row == "baked" else (valid & m_mat_row())
        t_masked = jnp.where(mat_ok, t_hit, INF)
        tile_best = jnp.min(t_masked, axis=1, keepdims=True)
        codes = row(ROW_CODE).astype(jnp.int32) + (det > 0.0).astype(jnp.int32)
        code_masked = jnp.where(t_masked == tile_best, codes, jnp.int32(2**30))
        code = jnp.min(code_masked, axis=1, keepdims=True)
        take = tile_best < best_t
        best_t = jnp.where(take, tile_best, best_t)
        best_code = jnp.where(take, code, best_code)

    return best_t, best_code, any_hit


def _sweep_init(dx):
    # any_hit is carried as int32 0/1, NOT bool: Mosaic cannot legalize an
    # i1-vector loop carry (scf.for relayout of the packed mask layout fails
    # to compile), and an i32 flag folds identically.
    zero = dx * 0.0  # (B, 1), inherits any shard_map variance
    return (zero + INF, zero.astype(jnp.int32) - 1, zero.astype(jnp.int32))


def _ray_inv(rays):
    """Per-component (d_zero, 1/d, d >= 0) triples for the slab gate."""
    out = []
    for d_c in rays[3:6]:
        d_zero = jnp.abs(d_c) <= 1e-30
        out.append((d_zero, 1.0 / jnp.where(d_zero, 1.0, d_c), d_c >= 0.0))
    return tuple(out)


def _gate_need_rays(rays, inv, aabb_ref, i, carry, *, want_matrix, want_any):
    """Conservative per-ray tile-gate test: (B, 1) flags of rays whose AABB
    interval against tile ``i`` could still matter. Mirrors
    ops.trace._ray_box_interval — the relative margin makes pruning strictly
    conservative, so skipped tiles provably cannot change the result (the
    flat-sweep form of the reference BVH's node_t >= best pruning,
    reference: cpu_trace.py:243-250).

    ``aabb_ref`` is the (8, n_tiles) SMEM table with rows
    [lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, pad, pad] (row-per-field layout:
    SMEM pads the last dimension to 128 words, so wide rows are 16x denser
    than an (n_tiles, 8) layout)."""
    ox, oy, oz = rays[0], rays[1], rays[2]
    best_t, _, any_hit = carry

    def axis(o_c, tpl, lo_s, hi_s):
        d_zero, inv_c, d_pos = tpl
        t_n = (jnp.where(d_pos, lo_s, hi_s) - o_c) * inv_c
        t_f = (jnp.where(d_pos, hi_s, lo_s) - o_c) * inv_c
        inside = (o_c >= lo_s) & (o_c <= hi_s)
        t_n = jnp.where(d_zero, jnp.where(inside, -INF, INF), t_n)
        t_f = jnp.where(d_zero, jnp.where(inside, INF, -INF), t_f)
        return t_n, t_f

    nx, fx = axis(ox, inv[0], aabb_ref[0, i], aabb_ref[3, i])
    ny, fy = axis(oy, inv[1], aabb_ref[1, i], aabb_ref[4, i])
    nz, fz = axis(oz, inv[2], aabb_ref[2, i], aabb_ref[5, i])
    near = jnp.maximum(jnp.maximum(nx, ny), nz)
    far = jnp.minimum(jnp.minimum(fx, fy), fz)
    near_c = near - (jnp.abs(near) * 1e-4 + 1e-6)
    far_c = far + (jnp.abs(far) * 1e-4 + 1e-6)
    hit_box = (far_c >= near_c) & (far_c > 1e-6)
    need = jnp.zeros_like(hit_box)
    if want_matrix:
        need = hit_box & (near_c < best_t)
    if want_any:
        need = need | (hit_box & (any_hit == 0))
    return need


def _gate_needed(rays, inv, aabb_ref, i, carry, *, want_matrix, want_any):
    """Block-level tile gate: any ray in the block still needs tile ``i``."""
    return jnp.any(
        _gate_need_rays(rays, inv, aabb_ref, i, carry,
                        want_matrix=want_matrix, want_any=want_any)
    )


def _gate_window_mask(rays, inv, wtab_ref, w, K, carry, *,
                      want_matrix, want_any):
    """(int32 bitmask, int32 done) of gate decisions for visit positions
    w*K .. w*K+K-1.

    ``wtab_ref`` is this block's (1, n_windows_pad, 128) VMEM gate table
    (_gate_tables): row ``w`` packs the window's six K-wide AABB fields
    plus the visit-order suffix-min near bound in STATIC lane positions —
    window rows index the sublane dim because Mosaic rejects dynamic
    LANE-offset slices (probed on hardware). The K slab tests vectorize
    as (B, K) ops — the same math _gate_need_rays does per box, but with
    ONE vector->scalar sync (the bitmask fold) per window instead of one
    any-reduce per box. Decisions use the carry AT THE WINDOW BOUNDARY:
    monotone-safe (the gate predicate only ever turns off as best_t
    shrinks and any_hit fills, so a stale carry errs toward visiting — a
    wasted DMA/math pass, never a missed one).

    ``done`` = every ray's best_t is at or below the suffix bound (and
    any_hit is settled when wanted): no remaining visit position can pass
    the gate, so the caller breaks out of its loop. Exact — a box holding
    a result-improving true hit keeps the bound strictly below that ray's
    best_t (the margins absorb cross-backend rounding)."""
    ox, oy, oz = rays[0], rays[1], rays[2]
    best_t, _, any_hit = carry
    row = wtab_ref[0, pl.ds(w, 1), :]  # (1, 128)
    box = lambda r: row[:, r * K : (r + 1) * K]  # (1, K) static lanes

    def axis(o_c, tpl, lo_s, hi_s):
        d_zero, inv_c, d_pos = tpl
        t_n = (jnp.where(d_pos, lo_s, hi_s) - o_c) * inv_c
        t_f = (jnp.where(d_pos, hi_s, lo_s) - o_c) * inv_c
        inside = (o_c >= lo_s) & (o_c <= hi_s)
        t_n = jnp.where(d_zero, jnp.where(inside, -INF, INF), t_n)
        t_f = jnp.where(d_zero, jnp.where(inside, INF, -INF), t_f)
        return t_n, t_f

    nx, fx = axis(ox, inv[0], box(0), box(3))
    ny, fy = axis(oy, inv[1], box(1), box(4))
    nz, fz = axis(oz, inv[2], box(2), box(5))
    near = jnp.maximum(jnp.maximum(nx, ny), nz)
    far = jnp.minimum(jnp.minimum(fx, fy), fz)
    near_c = near - (jnp.abs(near) * 1e-4 + 1e-6)
    far_c = far + (jnp.abs(far) * 1e-4 + 1e-6)
    hit_box = (far_c >= near_c) & (far_c > 1e-6)  # (B, K)
    need = jnp.zeros_like(hit_box)
    if want_matrix:
        need = hit_box & (near_c < best_t)
    if want_any:
        need = need | (hit_box & (any_hit == 0))
    flags = jnp.any(need, axis=0, keepdims=True)  # (1, K)
    pow2 = jnp.left_shift(
        jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    )
    mask = jnp.sum(jnp.where(flags, pow2, 0))

    suffmin = jnp.sum(row[:, 6 * K : 6 * K + 1])
    done = jnp.max(best_t) <= suffmin
    if want_any:
        done = done & (jnp.min(any_hit) > 0)
    return mask, done.astype(jnp.int32)


def _gate_indexers(order_ref, order_row, use_gate: bool, gate_group: int):
    """(tile index, gate-box index) getters for loop step j.

    With ``gate_group == 1`` boxes ARE tiles (the classic fine gate); with
    bigger groups each SMEM box covers ``gate_group`` consecutive
    Morton-ordered tiles and the visit order enumerates boxes, members
    consecutively — the two-level gate for scenes past the SMEM budget.
    """
    if not use_gate:
        return (lambda j: j), (lambda j: j)
    if gate_group == 1:
        box = lambda j: order_ref[order_row, j]
        return box, box
    box = lambda j: order_ref[order_row, j // gate_group]
    tile = lambda j: box(j) * gate_group + j % gate_group
    return tile, box


def _gate_loop_bound(n_tiles: int, use_gate: bool, gate_group: int) -> int:
    """Gated loops run over whole groups; callers pad tiles_on to match so
    the trailing phantom tiles are inactive (never DMA'd or computed)."""
    if not use_gate or gate_group == 1:
        return n_tiles
    return -(-n_tiles // gate_group) * gate_group


def _sweep_kernel(
    rays_ref, tris_ref, scal_ref, tiles_on_ref, aabb_ref, wtab_ref,
    order_ref, counts_ref, code_ref, any_ref,
    *, tri_tile: int, want_matrix: bool, want_any: bool, use_gate: bool,
    masks_baked: bool = False, masks_from_code: bool = False,
    gate_group: int = 1, gate_window: int = 0
):
    n_tiles = tris_ref.shape[1] // tri_tile
    n_loop = _gate_loop_bound(n_tiles, use_gate, gate_group)
    rays = _ray_columns(rays_ref)
    inv = _ray_inv(rays) if use_gate else None
    order_row = pl.program_id(0) % 8  # order blocks are 8 grid rows tall
    src_tile, src_box = _gate_indexers(order_ref, order_row, use_gate, gate_group)
    if use_gate:
        # compacted visit list: only this block's statically-crossed boxes
        # (sorted first in its order row) are enumerated — the tail could
        # only ever fail the gate test (hit_box is a sub-predicate of need)
        n_loop = counts_ref[order_row, 0] * gate_group
    # baked packs: the *primary* mask (m_any when any-hits are wanted, else
    # m_mat) is folded into zeroed cross_e rows; the secondary m_mat row
    # test survives only when both output types are wanted and differ
    m_any_row = "baked" if masks_baked else None
    m_mat_row = "baked" if (masks_baked and not want_any) else None
    # slim pack-resident mode: masks derive from the pack's code row and
    # the two SMEM scalars (emit_code, min_code) — see _tile_step
    code_bounds = (scal_ref[0, 0], scal_ref[0, 1]) if masks_from_code else None

    def tile_math(i, carry):
        off = i * tri_tile
        row = lambda r: tris_ref[r : r + 1, pl.ds(off, tri_tile)]  # (1, T)
        return _tile_step(rays, row, carry, want_matrix=want_matrix,
                          want_any=want_any, m_any_row=m_any_row,
                          m_mat_row=m_mat_row, code_bounds=code_bounds)

    init = _sweep_init(rays[3])
    if use_gate and gate_window:
        # Windowed gate + early exit: one (B, K) slab pass per window
        # folds K gate decisions into a bitmask (one vector->scalar sync
        # per window instead of per box), and the window's suffix-min
        # bound breaks the loop once no remaining box can pass.
        K = gate_window
        wmask = lambda w, c: _gate_window_mask(
            rays, inv, wtab_ref, w, K, c,
            want_matrix=want_matrix, want_any=want_any)
        n_dyn = n_loop

        def w_cond(state):
            return (state[0] < n_dyn) & (state[5] == 0)

        def w_body(state):
            j, bt, bc, ah, mask, done = state
            carry = (bt, bc, ah)
            mask, done = jax.lax.cond(
                j % K == 0, wmask, lambda w, c: (mask, done), j // K, carry
            )
            i = src_tile(j)
            needed = (tiles_on_ref[0, i] > 0) & (
                jnp.bitwise_and(jnp.right_shift(mask, j % K), 1) > 0
            )
            new_carry = jax.lax.cond(
                needed, lambda c: tile_math(i, c), lambda c: c, carry
            )
            return (j + 1, *new_carry, mask, done)

        state = jax.lax.while_loop(
            w_cond, w_body,
            (jnp.int32(0), *init, jnp.int32(0), jnp.int32(0)),
        )
        best_t, best_code, any_hit = state[1:4]
    else:
        def guarded_body(j, carry):
            # whole-tile skip: mask-culled tiles (Morton clustering makes
            # culled regions contiguous) and, with the gate, tiles no ray
            # can improve
            i = src_tile(j)
            needed = tiles_on_ref[0, i] > 0
            if use_gate:
                needed = needed & _gate_needed(
                    rays, inv, aabb_ref, src_box(j), carry,
                    want_matrix=want_matrix, want_any=want_any,
                )
            return jax.lax.cond(
                needed, lambda c: tile_math(i, c), lambda c: c, carry
            )

        best_t, best_code, any_hit = jax.lax.fori_loop(
            0, n_loop, guarded_body, init
        )
    _store_results(order_row, code_ref, any_ref, best_t, best_code, any_hit)


def _sweep_kernel_streamed(
    rays_ref, tris_hbm, scal_ref, tiles_on_ref, aabb_ref, wtab_ref,
    order_ref, counts_ref, code_ref, any_ref,
    *, tri_tile: int, n_tiles: int, want_matrix: bool, want_any: bool,
    use_gate: bool, masks_baked: bool = False, masks_from_code: bool = False,
    gate_group: int = 1, gate_window: int = 0
):
    """HBM-streaming variant: the operand pack stays in HBM and tile slices
    are double-buffered into VMEM scratch, so scene size is unbounded.

    The sweep is compute-bound for blocks of >= a few hundred rays (each
    streamed byte feeds ray_block pair tests). With the gate, tiles stream
    in near-to-far visit order AND the DMA itself is conditional: tile j+1's
    copy starts only if the gate (evaluated against the carry at step j)
    says some ray could still need it. The gate predicate is monotone
    non-increasing as best_t shrinks and any_hit fills, so a tile judged
    unneeded at prefetch time can never become needed — skipping its copy
    is exact, and the streamed bytes scale with VISITED tiles instead of
    scene size. A carried flag records whether each slot's copy was issued
    so waits pair with starts exactly.
    """
    rays = _ray_columns(rays_ref)
    inv = _ray_inv(rays) if use_gate else None
    order_row = pl.program_id(0) % 8  # order blocks are 8 grid rows tall
    src_tile, src_box = _gate_indexers(order_ref, order_row, use_gate, gate_group)
    n_loop = _gate_loop_bound(n_tiles, use_gate, gate_group)
    # compacted visit list (see _gate_tables): the loop runs only over this
    # block's statically-crossed boxes; n_loop stays the static in-bounds
    # clamp for the DMA lookahead index
    n_dyn = counts_ref[order_row, 0] * gate_group if use_gate else n_loop
    m_any_row = "baked" if masks_baked else None
    m_mat_row = "baked" if (masks_baked and not want_any) else None
    # slim pack-resident mode (see _sweep_kernel / _tile_step)
    code_bounds = (scal_ref[0, 0], scal_ref[0, 1]) if masks_from_code else None

    def body(buf_ref, sem_ref):
        def tile_dma(slot, j):
            return pltpu.make_async_copy(
                tris_hbm.at[:, pl.ds(src_tile(j) * tri_tile, tri_tile)],
                buf_ref.at[slot],
                sem_ref.at[slot],
            )

        if not use_gate:
            tile_dma(0, 0).start()

            def tile_body(j, carry):
                slot = j % 2

                @pl.when(j + 1 < n_tiles)
                def _():
                    tile_dma((j + 1) % 2, j + 1).start()

                tile_dma(slot, j).wait()
                row = lambda r: buf_ref[slot, r : r + 1, :]  # (1, T)
                # tiles stream regardless; skipping saves no DMA here
                return _tile_step(rays, row, carry, want_matrix=want_matrix,
                                  want_any=want_any, m_any_row=m_any_row,
                                  m_mat_row=m_mat_row,
                                  code_bounds=code_bounds)

            carry = jax.lax.fori_loop(
                0, n_tiles, tile_body, _sweep_init(rays[3])
            )
        elif use_gate and gate_window:
            # Windowed gate + early exit: decisions for K visit positions
            # come from ONE (B, K) slab pass folded into an int32 bitmask
            # (one vector->scalar sync per window instead of per box); the
            # skip path is a scalar bit test + branch, and the window's
            # suffix-min bound breaks the loop once no remaining box can
            # pass. Window decisions use the window-boundary carry —
            # monotone-safe, measured +0.1% visits at K=32
            # (docs/measurements/gate_oracle_10m_window_r04.txt).
            K = gate_window
            init = _sweep_init(rays[3])
            wmask = lambda w, c: _gate_window_mask(
                rays, inv, wtab_ref, w, K, c,
                want_matrix=want_matrix, want_any=want_any)
            bit = lambda m, j: jnp.bitwise_and(jnp.right_shift(m, j % K), 1) > 0
            tiles_ok = lambda j: tiles_on_ref[0, src_tile(j)] > 0

            # n_dyn == 0 would make even reading window 0 out of bounds
            mask0, done0 = jax.lax.cond(
                n_dyn > 0, wmask,
                lambda w, c: (jnp.int32(0), jnp.int32(1)), 0, init,
            )
            started0 = bit(mask0, 0) & tiles_ok(0)

            @pl.when(started0)
            def _():
                tile_dma(0, 0).start()

            def w_cond(state):
                return (state[0] < n_dyn) & (state[6] == 0)

            def w_body(state):
                j, bt, bc, ah, started_i, mask, done = state
                carry = (bt, bc, ah)
                started = started_i > 0
                slot = j % 2
                j_next = jnp.minimum(j + 1, n_loop - 1)
                # refresh at window boundaries (guarded by n_dyn: a
                # boundary at the loop end would slice past the table)
                mask, done = jax.lax.cond(
                    ((j + 1) % K == 0) & (j + 1 < n_dyn),
                    wmask, lambda w, c: (mask, done), (j + 1) // K, carry,
                )
                start_next = (j + 1 < n_dyn) & bit(mask, j + 1) & tiles_ok(j_next)

                @pl.when(start_next)
                def _():
                    tile_dma((j + 1) % 2, j_next).start()

                @pl.when(started)
                def _():
                    tile_dma(slot, j).wait()

                row = lambda r: buf_ref[slot, r : r + 1, :]  # (1, T)
                new_carry = jax.lax.cond(
                    started,
                    lambda c: _tile_step(rays, row, c, want_matrix=want_matrix,
                                         want_any=want_any,
                                         m_any_row=m_any_row,
                                         m_mat_row=m_mat_row,
                                         code_bounds=code_bounds),
                    lambda c: c,
                    carry,
                )
                return (j + 1, *new_carry, start_next.astype(jnp.int32),
                        mask, done)

            state = jax.lax.while_loop(
                w_cond, w_body,
                (jnp.int32(0), *init, started0.astype(jnp.int32), mask0, done0),
            )
            carry = state[1:4]
        else:
            def need(j, carry):
                return (tiles_on_ref[0, src_tile(j)] > 0) & _gate_needed(
                    rays, inv, aabb_ref, src_box(j), carry,
                    want_matrix=want_matrix, want_any=want_any,
                )

            init = _sweep_init(rays[3])
            started0 = need(0, init)

            @pl.when(started0)
            def _():
                tile_dma(0, 0).start()

            def tile_body(j, state):
                carry = state[:3]
                started = state[3] > 0
                slot = j % 2

                # Decide tile j+1's copy from the CURRENT carry. Monotone
                # gate: false now implies false forever, so the skip is
                # exact; true now may turn false by math time (a wasted
                # copy, never a missed one). The lookahead index is clamped:
                # the predicate short-circuits logically but its operands
                # still evaluate, and order/aabb reads at n_loop would be
                # out of bounds on the last iteration.
                j_next = jnp.minimum(j + 1, n_loop - 1)
                start_next = (j + 1 < n_dyn) & need(j_next, carry)

                @pl.when(start_next)
                def _():
                    tile_dma((j + 1) % 2, j_next).start()

                @pl.when(started)
                def _():
                    tile_dma(slot, j).wait()

                row = lambda r: buf_ref[slot, r : r + 1, :]  # (1, T)
                # math runs iff this tile's copy was issued — i.e. the gate
                # approved it one step ago. Re-checking against the current
                # carry would halve nothing (the fold is idempotent) and
                # costs a second slab pass per tile.
                new_carry = jax.lax.cond(
                    started,
                    lambda c: _tile_step(rays, row, c, want_matrix=want_matrix,
                                         want_any=want_any,
                                         m_any_row=m_any_row,
                                         m_mat_row=m_mat_row,
                                         code_bounds=code_bounds),
                    lambda c: c,
                    carry,
                )
                return (*new_carry, start_next.astype(jnp.int32))

            state = jax.lax.fori_loop(
                0, n_dyn, tile_body, (*init, started0.astype(jnp.int32))
            )
            carry = state[:3]

        best_t, best_code, any_hit = carry
        _store_results(order_row, code_ref, any_ref, best_t, best_code, any_hit)

    pl.run_scoped(
        body,
        pltpu.VMEM((2, TRI_ROWS, tri_tile), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    )


def gate_group_size(n_tiles: int) -> int:
    """Tiles per gate box: 1 while the per-tile tables fit SMEM, then the
    smallest group count that brings the box count back under the budget."""
    from ..config import GATE_MAX_TILES

    return -(-n_tiles // GATE_MAX_TILES)


def _resolve_gate_window(gate_group: int) -> int:
    """Window width for the bitmask gate, or 0 for per-box gate tests.

    Windowing currently applies only at gate_group == 1 (per-tile boxes;
    group mode enumerates member tiles per box and would need group-aware
    bit indexing). A window's six K-wide AABB fields plus its suffix-min
    bound live in one 128-lane row (6K + 1 <= 128 -> K <= 21; kept to
    powers of two, so 8 or 16)."""
    from ..config import GATE_WINDOW

    k = GATE_WINDOW
    if gate_group != 1 or k <= 1:
        return 0
    if k not in (8, 16):
        return 16
    return k


def _gate_tables(accel, rays, n_blocks: int, ray_block: int, n_tiles: int,
                 tile: int, window: int = 0):
    """(aabb SMEM table, per-block windowed VMEM gate table, per-block
    near-to-far visit order, per-block crossed-box counts, group) for the
    gate.

    ``accel`` is the ACCEL_GRAIN-granularity (tile_lo, tile_hi) pair from
    prepared.pack_scene; boxes reduce to the sweep tile width, then — for
    scenes whose tile count exceeds the SMEM budget — to GROUPS of
    ``group`` consecutive Morton-ordered tiles (the two-level gate: the
    SMEM tables stay bounded while exact pruning extends to arbitrarily
    large scenes, the flat analogue of pruning a whole BVH subtree,
    reference: cpu_trace.py:243-250). Visit order sorts boxes by squared
    distance from each ray block's mean origin so best_t shrinks early and
    far boxes get pruned.

    COMPACTION: boxes no ray in the block statically crosses (the same
    margined slab test the in-kernel gate applies, minus the carry terms)
    sort to the END of the order row, and ``counts`` holds the number of
    crossed boxes — the kernel loops only over those. Exact twice over:
    (a) the visit SEQUENCE of crossed boxes is unchanged (stable argsort,
    same distance keys), and (b) an excluded box's in-kernel gate test
    could only ever be false — hit_box is a sub-predicate of ``need`` —
    so the skipped iterations were guaranteed no-ops. The margins make
    the slab test conservative against true intersections under any
    faithful f32 evaluation, so XLA-vs-Mosaic ulp differences cannot drop
    a contributing tile. (At 10M occluded tris ~95% of loop iterations
    branched away after a gate test; the static union is ~38%, so
    compaction removes ~62% of loop iterations outright.)

    ``order``/``counts`` come back padded to 8-row blocks (Mosaic
    sublane-divisibility).
    """
    from ..config import ACCEL_GRAIN

    per = tile // ACCEL_GRAIN
    lo = jnp.min(accel[0].reshape(n_tiles, per, 3), axis=1)
    hi = jnp.max(accel[1].reshape(n_tiles, per, 3), axis=1)
    group = gate_group_size(n_tiles)
    n_boxes = -(-n_tiles // group)
    if group > 1:
        # empty-box padding (lo=+BIG, hi=-BIG) never widens a group box
        pad = n_boxes * group - n_tiles
        big = jnp.float32(3.0e37)
        lo = jnp.min(
            jnp.pad(lo, ((0, pad), (0, 0)), constant_values=big)
            .reshape(n_boxes, group, 3),
            axis=1,
        )
        hi = jnp.max(
            jnp.pad(hi, ((0, pad), (0, 0)), constant_values=-big)
            .reshape(n_boxes, group, 3),
            axis=1,
        )
    # (8, n_boxes) row-per-field: [lo_x..lo_z, hi_x..hi_z, pad, pad]
    aabb = jnp.concatenate(
        [lo.T, hi.T, jnp.zeros((2, n_boxes), jnp.float32)], axis=0
    )
    # rays come in transposed — (16, N): [o | d | o x d | pad] rows
    cent = jnp.mean(rays[:3].reshape(3, n_blocks, ray_block), axis=2).T
    gap = jnp.maximum(
        jnp.maximum(lo[None, :, :] - cent[:, None, :],
                    cent[:, None, :] - hi[None, :, :]),
        0.0,
    )
    dist2 = jnp.sum(gap * gap, axis=2)  # (n_blocks, n_boxes)

    # static per-(block, box) crossing union — the kernel's hit_box test
    # (_gate_need_rays) verbatim, vectorized; batched so the transient
    # (blocks_per_step * ray_block, n_boxes) slabs stay a few MB
    o3 = rays[0:3].reshape(3, n_blocks, ray_block).transpose(1, 2, 0)
    d3 = rays[3:6].reshape(3, n_blocks, ray_block).transpose(1, 2, 0)

    def block_union(args):
        ob, db = args  # (B, 3)
        dz = (jnp.abs(db) <= 1e-30)[:, None, :]
        iv = (1.0 / jnp.where(dz[:, 0], 1.0, db))[:, None, :]
        dp = (db >= 0.0)[:, None, :]
        ob = ob[:, None, :]
        lo_s, hi_s = lo[None, :, :], hi[None, :, :]
        t_n = (jnp.where(dp, lo_s, hi_s) - ob) * iv
        t_f = (jnp.where(dp, hi_s, lo_s) - ob) * iv
        inside = (ob >= lo_s) & (ob <= hi_s)
        t_n = jnp.where(dz, jnp.where(inside, -INF, INF), t_n)
        t_f = jnp.where(dz, jnp.where(inside, INF, -INF), t_f)
        near = jnp.max(t_n, axis=2)
        far = jnp.min(t_f, axis=2)
        near_c = near - (jnp.abs(near) * 1e-4 + 1e-6)
        far_c = far + (jnp.abs(far) * 1e-4 + 1e-6)
        hit = (far_c >= near_c) & (far_c > 1e-6)  # (B, n_boxes)
        # per-box min near_c over CROSSING rays: the early-exit bound
        # (+INF when no ray crosses)
        return jnp.any(hit, axis=0), jnp.min(
            jnp.where(hit, near_c, INF), axis=0
        )

    per_step = max(1, min(n_blocks, (1 << 22) // max(ray_block * n_boxes, 1)))
    crossed, minnear = jax.lax.map(block_union, (o3, d3), batch_size=per_step)

    order = jnp.argsort(
        jnp.where(crossed, dist2, jnp.inf), axis=1
    ).astype(jnp.int32)
    counts = jnp.sum(crossed, axis=1, dtype=jnp.int32)[:, None]

    wtab = None
    if window:
        # Windowed VMEM gate table: one 128-lane row per K-box window of
        # the block's visit order, lanes
        #   [lo_x(K) | lo_y | lo_z | hi_x | hi_y | hi_z | suffmin | pad]
        # (window rows index the SUBLANE dim — Mosaic rejects dynamic
        # LANE-offset slices, probed on hardware). Pad boxes are empty
        # (lo=+BIG, hi=-BIG: hit_box always false) with +INF minnear.
        # suffmin[w] = min over visit positions >= w*K of the box's
        # min-crossing-ray near_c — once every ray's best_t is at or
        # below it (and any_hit is settled), no remaining box can pass
        # the gate and the kernel breaks out of the visit loop. Exact:
        # a box holding a true hit at t* < some best_t has
        # minnear <= near_c(ray) < t* margin-strictly, so the bound
        # cannot exit past a result-contributing box.
        K = window
        n_w = -(-n_boxes // K)
        n_w_pad = ((n_w + 7) // 8) * 8
        pad_b = n_w * K - n_boxes
        big = jnp.float32(3.0e37)

        lo_p = jnp.take(lo, order, axis=0)  # (n_blocks, n_boxes, 3)
        hi_p = jnp.take(hi, order, axis=0)
        mn_p = jnp.take_along_axis(minnear, order, axis=1)
        lo_p = jnp.pad(lo_p, ((0, 0), (0, pad_b), (0, 0)),
                       constant_values=big)
        hi_p = jnp.pad(hi_p, ((0, 0), (0, pad_b), (0, 0)),
                       constant_values=-big)
        mn_p = jnp.pad(mn_p, ((0, 0), (0, pad_b)), constant_values=INF)
        suffix = jax.lax.associative_scan(
            jnp.minimum, mn_p, reverse=True, axis=1
        )
        fields = jnp.concatenate(
            [
                lo_p.reshape(n_blocks, n_w, K, 3).transpose(0, 1, 3, 2)
                .reshape(n_blocks, n_w, 3 * K),
                hi_p.reshape(n_blocks, n_w, K, 3).transpose(0, 1, 3, 2)
                .reshape(n_blocks, n_w, 3 * K),
                suffix[:, ::K][:, :, None],  # window-start suffix bound
            ],
            axis=2,
        )  # (n_blocks, n_w, 6K + 1)
        wtab = jnp.pad(
            fields,
            ((0, 0), (0, n_w_pad - n_w), (0, 128 - 6 * K - 1)),
            constant_values=INF,
        )

    n_blocks_pad = ((n_blocks + 7) // 8) * 8
    pad_rows = n_blocks_pad - n_blocks
    return (
        aabb,
        wtab,
        jnp.pad(order, ((0, pad_rows), (0, 0))),
        jnp.pad(counts, ((0, pad_rows), (0, 0))),
        group,
    )


def _sweep_kernel_sched(
    rays_ref, tris_ref, emap_ref, masks_hbm, tiles_on_ref, aabb_ref,
    wtab_ref, order_ref, counts_ref, code_ref, any_ref,
    *, tri_tile: int, want_matrix: bool, want_any: bool, use_gate: bool,
    per_emitter_tiles: bool, gate_group: int = 1, gate_window: int = 0,
):
    """Scheduled (multi-emitter) resident sweep: one dispatch spans blocks of
    DIFFERENT emitters. ``emap_ref`` (SMEM) maps each grid block to its
    emitter row; the block's combined eligibility row (0 = masked,
    1 = any-only, 2 = any+matrix; m_mat is always a subset of m_any) is
    DMA'd once per block from the (E, Tpad) HBM mask table. Pair math and
    carries are identical to _sweep_kernel."""
    n_tri_pad = tris_ref.shape[1]
    n_tiles = n_tri_pad // tri_tile
    n_loop = _gate_loop_bound(n_tiles, use_gate, gate_group)
    rays = _ray_columns(rays_ref)
    inv = _ray_inv(rays) if use_gate else None
    pid = pl.program_id(0)
    order_row = pid % 8  # order blocks are 8 grid rows tall
    src_tile, src_box = _gate_indexers(order_ref, order_row, use_gate, gate_group)
    if use_gate:
        # compacted visit list (see _gate_tables)
        n_loop = counts_ref[order_row, 0] * gate_group
    e = emap_ref[0, pid]
    e_tiles = e if per_emitter_tiles else 0

    def body(mrow_ref, msem_ref):
        # one (1, Tpad) row DMA per block — negligible next to the pair math
        copy = pltpu.make_async_copy(masks_hbm.at[e], mrow_ref, msem_ref)
        copy.start()
        copy.wait()

        def tile_math(i, carry):
            off = i * tri_tile
            row = lambda r: tris_ref[r : r + 1, pl.ds(off, tri_tile)]  # (1, T)
            comb = lambda: mrow_ref[0:1, pl.ds(off, tri_tile)]
            return _tile_step(
                rays, row, carry, want_matrix=want_matrix, want_any=want_any,
                m_any_row=lambda: comb() > 0.0,
                m_mat_row=lambda: comb() > 1.0,
            )

        init = _sweep_init(rays[3])
        if use_gate and gate_window:
            # windowed gate + early exit — see _sweep_kernel
            K = gate_window
            wmask = lambda w, c: _gate_window_mask(
                rays, inv, wtab_ref, w, K, c,
                want_matrix=want_matrix, want_any=want_any)
            n_dyn = n_loop

            def w_cond(state):
                return (state[0] < n_dyn) & (state[5] == 0)

            def w_body(state):
                j, bt, bc, ah, mask, done = state
                carry = (bt, bc, ah)
                mask, done = jax.lax.cond(
                    j % K == 0, wmask, lambda w, c: (mask, done),
                    j // K, carry,
                )
                i = src_tile(j)
                needed = (tiles_on_ref[e_tiles, i] > 0) & (
                    jnp.bitwise_and(jnp.right_shift(mask, j % K), 1) > 0
                )
                new_carry = jax.lax.cond(
                    needed, lambda c: tile_math(i, c), lambda c: c, carry
                )
                return (j + 1, *new_carry, mask, done)

            state = jax.lax.while_loop(
                w_cond, w_body,
                (jnp.int32(0), *init, jnp.int32(0), jnp.int32(0)),
            )
            best_t, best_code, any_hit = state[1:4]
        else:
            def guarded_body(j, carry):
                i = src_tile(j)
                needed = tiles_on_ref[e_tiles, i] > 0
                if use_gate:
                    needed = needed & _gate_needed(
                        rays, inv, aabb_ref, src_box(j), carry,
                        want_matrix=want_matrix, want_any=want_any,
                    )
                return jax.lax.cond(
                    needed, lambda c: tile_math(i, c), lambda c: c, carry
                )

            best_t, best_code, any_hit = jax.lax.fori_loop(
                0, n_loop, guarded_body, init
            )
        _store_results(order_row, code_ref, any_ref, best_t, best_code, any_hit)

    pl.run_scoped(
        body,
        pltpu.VMEM((1, n_tri_pad), jnp.float32),
        pltpu.SemaphoreType.DMA,
    )


def _sweep_kernel_sched_streamed(
    rays_ref, tris_hbm, emap_ref, masks_hbm, tiles_on_ref, aabb_ref,
    wtab_ref, order_ref, counts_ref, code_ref, any_ref,
    *, tri_tile: int, n_tiles: int, want_matrix: bool, want_any: bool,
    use_gate: bool, per_emitter_tiles: bool, gate_group: int = 1,
    gate_window: int = 0,
):
    """HBM-streaming scheduled sweep: operand pack AND the (E, Tpad) combined
    mask table stay in HBM; the block's emitter mask tile is double-buffered
    alongside the triangle tile (one extra (1, T) DMA per tile, ~4% of the
    pack stream). With the gate, both copies are conditional exactly as in
    :func:`_sweep_kernel_streamed`: a tile the gate rules out at prefetch
    time is never needed again (the predicate is monotone), so its copies
    are skipped and the streamed bytes scale with visited tiles."""
    rays = _ray_columns(rays_ref)
    inv = _ray_inv(rays) if use_gate else None
    pid = pl.program_id(0)
    order_row = pid % 8
    src_tile, src_box = _gate_indexers(order_ref, order_row, use_gate, gate_group)
    n_loop = _gate_loop_bound(n_tiles, use_gate, gate_group)
    # compacted visit list (see _gate_tables); n_loop stays the static
    # in-bounds clamp for the DMA lookahead index
    n_dyn = counts_ref[order_row, 0] * gate_group if use_gate else n_loop
    e = emap_ref[0, pid]
    e_tiles = e if per_emitter_tiles else 0

    def body(buf_ref, mbuf_ref, sem_ref, msem_ref):
        def tile_dma(slot, j):
            i = src_tile(j)
            return pltpu.make_async_copy(
                tris_hbm.at[:, pl.ds(i * tri_tile, tri_tile)],
                buf_ref.at[slot],
                sem_ref.at[slot],
            )

        def mask_dma(slot, j):
            i = src_tile(j)
            return pltpu.make_async_copy(
                masks_hbm.at[e, :, pl.ds(i * tri_tile, tri_tile)],
                mbuf_ref.at[slot],
                msem_ref.at[slot],
            )

        def start_pair(slot, j):
            tile_dma(slot, j).start()
            mask_dma(slot, j).start()

        def step_with(slot, carry):
            row = lambda r: buf_ref[slot, r : r + 1, :]  # (1, T)
            comb = lambda: mbuf_ref[slot, 0:1, :]
            return _tile_step(
                rays, row, carry, want_matrix=want_matrix, want_any=want_any,
                m_any_row=lambda: comb() > 0.0,
                m_mat_row=lambda: comb() > 1.0,
            )

        if not use_gate:
            start_pair(0, 0)

            def tile_body(j, carry):
                slot = j % 2

                @pl.when(j + 1 < n_tiles)
                def _():
                    start_pair((j + 1) % 2, j + 1)

                tile_dma(slot, j).wait()
                mask_dma(slot, j).wait()
                return step_with(slot, carry)

            carry = jax.lax.fori_loop(
                0, n_tiles, tile_body, _sweep_init(rays[3])
            )
        elif use_gate and gate_window:
            # windowed gate + early exit — see _sweep_kernel_streamed
            K = gate_window
            init = _sweep_init(rays[3])
            wmask = lambda w, c: _gate_window_mask(
                rays, inv, wtab_ref, w, K, c,
                want_matrix=want_matrix, want_any=want_any)
            bit = lambda m, j: jnp.bitwise_and(jnp.right_shift(m, j % K), 1) > 0
            tiles_ok = lambda j: tiles_on_ref[e_tiles, src_tile(j)] > 0

            mask0, done0 = jax.lax.cond(
                n_dyn > 0, wmask,
                lambda w, c: (jnp.int32(0), jnp.int32(1)), 0, init,
            )
            started0 = bit(mask0, 0) & tiles_ok(0)

            @pl.when(started0)
            def _():
                start_pair(0, 0)

            def w_cond(state):
                return (state[0] < n_dyn) & (state[6] == 0)

            def w_body(state):
                j, bt, bc, ah, started_i, mask, done = state
                carry = (bt, bc, ah)
                started = started_i > 0
                slot = j % 2
                j_next = jnp.minimum(j + 1, n_loop - 1)
                mask, done = jax.lax.cond(
                    ((j + 1) % K == 0) & (j + 1 < n_dyn),
                    wmask, lambda w, c: (mask, done), (j + 1) // K, carry,
                )
                start_next = (j + 1 < n_dyn) & bit(mask, j + 1) & tiles_ok(j_next)

                @pl.when(start_next)
                def _():
                    start_pair((j + 1) % 2, j_next)

                @pl.when(started)
                def _():
                    tile_dma(slot, j).wait()
                    mask_dma(slot, j).wait()

                new_carry = jax.lax.cond(
                    started, lambda c: step_with(slot, c), lambda c: c, carry
                )
                return (j + 1, *new_carry, start_next.astype(jnp.int32),
                        mask, done)

            state = jax.lax.while_loop(
                w_cond, w_body,
                (jnp.int32(0), *init, started0.astype(jnp.int32), mask0, done0),
            )
            carry = state[1:4]
        else:
            def need(j, carry):
                return (tiles_on_ref[e_tiles, src_tile(j)] > 0) & _gate_needed(
                    rays, inv, aabb_ref, src_box(j), carry,
                    want_matrix=want_matrix, want_any=want_any,
                )

            init = _sweep_init(rays[3])
            started0 = need(0, init)

            @pl.when(started0)
            def _():
                start_pair(0, 0)

            def tile_body(j, state):
                carry = state[:3]
                started = state[3] > 0
                slot = j % 2
                # clamped lookahead: operands evaluate even under a false
                # guard, and index n_loop would read out of bounds
                j_next = jnp.minimum(j + 1, n_loop - 1)
                start_next = (j + 1 < n_dyn) & need(j_next, carry)

                @pl.when(start_next)
                def _():
                    start_pair((j + 1) % 2, j_next)

                @pl.when(started)
                def _():
                    tile_dma(slot, j).wait()
                    mask_dma(slot, j).wait()

                new_carry = jax.lax.cond(
                    started, lambda c: step_with(slot, c), lambda c: c, carry
                )
                return (*new_carry, start_next.astype(jnp.int32))

            state = jax.lax.fori_loop(
                0, n_dyn, tile_body, (*init, started0.astype(jnp.int32))
            )
            carry = state[:3]

        best_t, best_code, any_hit = carry
        _store_results(order_row, code_ref, any_ref, best_t, best_code, any_hit)

    pl.run_scoped(
        body,
        pltpu.VMEM((2, TRI_ROWS, tri_tile), jnp.float32),
        pltpu.VMEM((2, 1, tri_tile), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    )


def sweep_rays_scheduled(
    rays: jnp.ndarray,  # (9, N) f32: [o | d | o x d] ROWS, N = n_blocks*ray_block
    tri_pack: jnp.ndarray,  # (24, Tpad) f32 (mask rows unused here)
    masks: jnp.ndarray,  # (E, Tpad) f32 combined rows: m_any + m_mat in {0,1,2}
    emap: jnp.ndarray,  # (n_blocks,) i32: grid block -> emitter row
    *,
    ray_block: int,
    tri_tile: int,
    want_matrix: bool,
    want_any: bool,
    interpret: bool = False,
    stream_from_hbm: bool | None = None,
    accel=None,
):
    """Multi-emitter sweep: like :func:`sweep_rays`, but each ray block may
    belong to a different emitter (the scheduled driver's one-dispatch-per-
    convergence-round schedules). Each block DMAs its emitter's combined
    mask row (m_any + m_mat, so the matrix mask is ``row > 1`` — m_mat is
    always a subset of m_any); all per-pair math, gating, and epsilons are
    the shared :func:`_tile_step`, so counts are bitwise-identical to the
    single-emitter kernels on the same rays."""
    from ..config import PALLAS_MAX_TRIS

    n = rays.shape[1]
    n_tri_pad = tri_pack.shape[1]
    tile = sweep_tile_width(n_tri_pad, tri_tile)
    n_blocks = n // ray_block
    n_tiles = n_tri_pad // tile
    n_emit = masks.shape[0]
    if stream_from_hbm is None:
        stream_from_hbm = n_tri_pad > PALLAS_MAX_TRIS

    # Per-emitter tile activity lives in SMEM; past the scalar-memory budget
    # it collapses to the union over emitters (conservative: extra tiles run
    # fully-masked pair math and produce no counts — results unchanged).
    thresh = 1.0 if (want_matrix and not want_any) else 0.0
    relevant = masks
    per_emitter_tiles = n_emit * n_tiles <= SCHED_TILES_SMEM_BUDGET
    if not per_emitter_tiles:
        relevant = jnp.max(relevant, axis=0, keepdims=True)
    tiles_on = jnp.any(
        relevant.reshape(relevant.shape[0], n_tiles, tile) > thresh, axis=2
    ).astype(jnp.int32)

    from ..config import GATE_MAX_GROUP

    # single-tile scenes run ungated (a one-box gate can never skip work;
    # ray_block here is fixed by the schedule row size, so unlike
    # sweep_rays no block widening applies) — matches the gate_prunes()
    # predicate callers use for the sort decision
    use_gate = (
        accel is not None
        and n_tiles > 1
        and gate_group_size(n_tiles) <= GATE_MAX_GROUP
    )
    gate_group = 1
    gate_window = 0
    if use_gate:
        gate_window = _resolve_gate_window(gate_group_size(n_tiles))
        aabb, wtab, order, counts, gate_group = _gate_tables(
            accel, rays, n_blocks, ray_block, n_tiles, tile,
            window=gate_window,
        )
        n_loop = _gate_loop_bound(n_tiles, use_gate, gate_group)
        if n_loop > n_tiles:  # phantom group-padding tiles: never active
            tiles_on = jnp.pad(tiles_on, ((0, 0), (0, n_loop - n_tiles)))
    else:
        aabb = jnp.zeros((8, 128), jnp.float32)
        order = jnp.zeros((8, 128), jnp.int32)
        counts = jnp.zeros((8, 1), jnp.int32)
    if not gate_window:  # dummy: the kernels never read wtab in this mode
        wtab = jnp.zeros((1, 8, 128), jnp.float32)

    common = dict(
        tri_tile=tile,
        want_matrix=want_matrix,
        want_any=want_any,
        use_gate=use_gate,
        per_emitter_tiles=per_emitter_tiles,
        gate_group=gate_group,
        gate_window=gate_window,
    )
    if stream_from_hbm:
        kernel = functools.partial(
            _sweep_kernel_sched_streamed, n_tiles=n_tiles, **common
        )
        tris_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        kernel = functools.partial(_sweep_kernel_sched, **common)
        tris_spec = pl.BlockSpec(
            (TRI_ROWS, n_tri_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        )

    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.SMEM
    )
    out_block = pl.BlockSpec(
        (8, ray_block), lambda i: (i // 8, 0), memory_space=pltpu.VMEM
    )
    codes, any_hit = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (16, ray_block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            tris_spec,
            smem((1, n_blocks)),
            pl.BlockSpec(memory_space=pl.ANY),  # mask table stays in HBM
            smem(tiles_on.shape),
            smem(aabb.shape),
            pl.BlockSpec(
                (1,) + wtab.shape[1:],
                (lambda i: (i, 0, 0)) if gate_window else (lambda i: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, order.shape[1]),
                (lambda i: (i // 8, 0)) if use_gate else (lambda i: (0, 0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (8, 1),
                (lambda i: (i // 8, 0)) if use_gate else (lambda i: (0, 0)),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=[out_block, out_block],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, ray_block), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, ray_block), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.pad(rays, ((0, 16 - rays.shape[0]), (0, 0))),
        tri_pack,
        emap.astype(jnp.int32)[None, :],
        # rank-3 (E, 1, Tpad): leading dims are untiled, so a scalar-indexed
        # single-row DMA is aligned (a (E, Tpad) row slice is not)
        masks[:, None, :],
        tiles_on,
        aabb,
        wtab,
        order,
        counts,
    )
    return codes.reshape(-1), any_hit.reshape(-1)


def sweep_rays(
    rays: jnp.ndarray,  # (9, N) f32: [o | d | o x d] ROWS
    tri_pack: jnp.ndarray,  # (24, Tpad) f32
    sweep_mask: jnp.ndarray,  # (Tpad,) bool: triangles this sweep may touch
    *,
    ray_block: int,
    tri_tile: int,
    want_matrix: bool,
    want_any: bool,
    interpret: bool = False,
    stream_from_hbm: bool | None = None,
    accel=None,
    masks_baked: bool = False,
    code_bounds=None,
):
    """Sweep all rays against all triangles; returns (codes (N,), any (N,)).

    ``masks_baked`` promises the pack was built with
    :func:`build_tri_pack`'s ``bake`` option (primary mask folded into
    zeroed cross_e), letting the kernels drop per-pair mask tests.

    ``code_bounds`` (a (2,) f32 array ``[emit_code, min_code]``, both
    ``2 * sid``) instead derives per-pair masks from the pack's code row
    in-kernel — the slim pack-resident mode for huge scenes whose operand
    pack is prebuilt once (prepared.pack_scene slim mode) and whose mask
    rows are never rewritten. Mutually exclusive with ``masks_baked``.

    For scenes whose operand pack exceeds the VMEM budget the kernel
    switches to the HBM-streaming variant (double-buffered tile DMA);
    ``stream_from_hbm`` forces either mode.

    ``accel`` (the ACCEL_GRAIN-granularity (tile_lo, tile_hi) pair from
    prepared.pack_scene) enables in-kernel distance pruning: each ray block
    visits tiles near-to-far from the block's mean ray origin, and a tile's
    pair math is skipped when no ray's conservative box interval can still
    improve its nearest hit or block it anew. Pair callers with
    ops.trace.sort_rays_for_coherence — gating is exact either way, but only
    coherent blocks make it fire.
    """
    from ..config import PALLAS_MAX_TRIS

    n = rays.shape[1]
    n_tri_pad = tri_pack.shape[1]
    tile = sweep_tile_width(n_tri_pad, tri_tile)
    n_blocks = n // ray_block
    grid = (n_blocks,)
    n_tiles = n_tri_pad // tile
    tiles_on = jnp.any(sweep_mask.reshape(n_tiles, tile), axis=1).astype(jnp.int32)
    if stream_from_hbm is None:
        stream_from_hbm = n_tri_pad > PALLAS_MAX_TRIS

    # The gate's AABB/order tables live in SMEM; past GATE_MAX_TILES boxes
    # the gate goes two-level (one box per GROUP of consecutive tiles), so
    # exact pruning survives to arbitrarily large scenes. Only absurd group
    # sizes (> GATE_MAX_GROUP) fall back to the ungated sweep.
    from ..config import GATE_MAX_GROUP

    # single-tile scenes run ungated (a one-box gate can never skip work,
    # and the ungated branch's ray-block widening applies) — matches the
    # gate_prunes() predicate callers use for the sort decision
    use_gate = (
        accel is not None
        and n_tiles > 1
        and gate_group_size(n_tiles) <= GATE_MAX_GROUP
    )
    gate_group = 1
    gate_window = 0
    if use_gate:
        gate_window = _resolve_gate_window(gate_group_size(n_tiles))
        aabb, wtab, order, counts, gate_group = _gate_tables(
            accel, rays, n_blocks, ray_block, n_tiles, tile,
            window=gate_window,
        )
        n_loop = _gate_loop_bound(n_tiles, use_gate, gate_group)
        if n_loop > n_tiles:  # phantom group-padding tiles: never active
            tiles_on = jnp.pad(tiles_on, (0, n_loop - n_tiles))
    else:
        # Ungated sweeps have no per-block gate granularity to protect, and
        # wider ray blocks amortize loop overhead (measured +4% at the
        # headline shape). Output partitioning is the only thing that
        # changes, so results are bitwise-identical for any block size.
        # Capped at 512: the tile step keeps ~3 (B, tile) f32 intermediates
        # live, and 1024-ray blocks blow the 16 MB scoped-VMEM limit next
        # to a resident operand pack (measured OOM at the headline shape).
        while ray_block < 512 and n % (ray_block * 2) == 0:
            ray_block *= 2
        n_blocks = n // ray_block
        grid = (n_blocks,)
        aabb = jnp.zeros((8, 128), jnp.float32)
        order = jnp.zeros((8, 128), jnp.int32)
        counts = jnp.zeros((8, 1), jnp.int32)
    if not gate_window:  # dummy: the kernels never read wtab in this mode
        wtab = jnp.zeros((1, 8, 128), jnp.float32)
    masks_from_code = code_bounds is not None
    if masks_from_code and masks_baked:
        raise ValueError("masks_baked and code_bounds are mutually exclusive")
    scal = (
        code_bounds.astype(jnp.float32).reshape(1, 2)
        if masks_from_code
        else jnp.zeros((1, 2), jnp.float32)  # dummy: never read
    )

    if stream_from_hbm:
        kernel = functools.partial(
            _sweep_kernel_streamed,
            tri_tile=tile,
            n_tiles=n_tiles,
            want_matrix=want_matrix,
            want_any=want_any,
            use_gate=use_gate,
            masks_baked=masks_baked,
            masks_from_code=masks_from_code,
            gate_group=gate_group,
            gate_window=gate_window,
        )
        tris_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        kernel = functools.partial(
            _sweep_kernel,
            tri_tile=tile,
            want_matrix=want_matrix,
            want_any=want_any,
            use_gate=use_gate,
            masks_baked=masks_baked,
            masks_from_code=masks_from_code,
            gate_group=gate_group,
            gate_window=gate_window,
        )
        tris_spec = pl.BlockSpec(
            (TRI_ROWS, n_tri_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        )

    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)
    out_block = pl.BlockSpec(
        (8, ray_block), lambda i: (i // 8, 0), memory_space=pltpu.VMEM
    )
    codes, any_hit = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (16, ray_block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            tris_spec,
            smem((1, 2)),
            smem((1, int(tiles_on.shape[0]))),
            smem(aabb.shape),
            pl.BlockSpec(
                (1,) + wtab.shape[1:],
                (lambda i: (i, 0, 0)) if gate_window else (lambda i: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            # per-block visit order: 8-row-tall blocks (Mosaic requires
            # sublane-dim block sizes divisible by 8); the kernel picks its
            # row via program_id % 8
            pl.BlockSpec(
                (8, order.shape[1]),
                (lambda i: (i // 8, 0)) if use_gate else (lambda i: (0, 0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (8, 1),
                (lambda i: (i // 8, 0)) if use_gate else (lambda i: (0, 0)),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=[out_block, out_block],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, ray_block), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, ray_block), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.pad(rays, ((0, 16 - rays.shape[0]), (0, 0))),
        tri_pack,
        scal,
        tiles_on[None, :],
        aabb,
        wtab,
        order,
        counts,
    )
    return codes.reshape(-1), any_hit.reshape(-1)


__all__ = [
    "build_tri_pack", "sweep_rays", "sweep_rays_scheduled",
    "sweep_tile_width", "gate_prunes", "TRI_ROWS",
]
