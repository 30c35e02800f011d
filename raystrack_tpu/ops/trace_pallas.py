"""Pallas TPU sweep kernel: Möller-Trumbore over ray blocks x triangle tiles.

Replaces the XLA per-block sweep of ops/trace.py with a single fused VMEM
kernel. The XLA path materializes several (block, tile) intermediates across
fusion boundaries (HBM round trips); here one grid step keeps everything in
VMEM: the per-triangle operand pack is VMEM-resident for the whole grid, a
ray block is (B, 9) [o | d | o x d] on sublanes, and each tile step computes
the intersection predicates as (B,1)x(1,T) broadcast multiply-adds (exact
f32 on the VPU — no MXU, no bf16 rounding), then folds a masked min over the
tile into the running nearest-hit carry.

Layout choices (all transpose-free):
- rays   (N, 9)  -> block (B, 9): ray components are (B, 1) columns
- tris   (24, Tpad), VMEM-resident: operand rows are (1, T) slices
  rows: 0-2 cross_e, 3-5 e1, 6-8 e2, 9-11 v0 x e2, 12-14 v0 x e1,
        15 d0 = v0.cross_e, 16 code_base = 2*sid, 17 mask_any, 18 mask_mat
- outputs (N, 1) i32 hit code / any-hit flag: block (B, 1)

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

ROW_CE = 0
ROW_E1 = 3
ROW_E2 = 6
ROW_WU = 9
ROW_WV = 12
ROW_D0 = 15
ROW_CODE = 16
ROW_MASK_ANY = 17
ROW_MASK_MAT = 18


def build_tri_pack(scene: Tuple, m_any, m_mat) -> jnp.ndarray:
    """Assemble the (24, Tpad) f32 operand pack for one dispatch.

    The precomputed masks (ops.trace.compute_masks) fold emitter exclusion,
    plane culling and the reciprocity half-matrix into two f32 rows; padded
    triangles carry cross_e = 0 so det = 0 rejects them without any extra
    mask.
    """
    v0, e1, e2, cross_e, w_u, w_v, d0, sid = scene
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
    pack = jnp.concatenate([r.astype(jnp.float32) for r in rows], axis=0)
    pad = TRI_ROWS - pack.shape[0]
    return jnp.pad(pack, ((0, pad), (0, 0)))


def _ray_columns(rays_ref):
    """(B, 1) component columns [o | d | o x d] from a ray block."""
    col = lambda j: rays_ref[:, j : j + 1]
    return tuple(col(j) for j in range(9))


def _tile_step(rays, row, carry, *, want_matrix: bool, want_any: bool):
    """One triangle-tile of the Möller-Trumbore sweep.

    ``rays`` are the 9 (B, 1) ray columns, ``row(r)`` yields the (1, T)
    operand row r of the current tile (VMEM-resident slice or DMA buffer),
    and ``carry`` is the running (best_t, best_code, any_hit). Shared by the
    resident and HBM-streaming kernels so the intersection math exists once.
    """
    ox, oy, oz, dx, dy, dz, cx, cy, cz = rays
    best_t, best_code, any_hit = carry

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
    valid = (
        (abs_det >= 1e-7)
        & (un >= 0.0)
        & (un <= abs_det)
        & (vn >= 0.0)
        & (un + vn <= abs_det)
        & (t_hit > 1e-6)
    )

    if want_any:
        blocked = valid & (row(ROW_MASK_ANY) > 0.0)
        any_hit = any_hit | jnp.any(blocked, axis=1, keepdims=True)

    if want_matrix:
        t_masked = jnp.where(valid & (row(ROW_MASK_MAT) > 0.0), t_hit, INF)
        tile_best = jnp.min(t_masked, axis=1, keepdims=True)
        codes = row(ROW_CODE).astype(jnp.int32) + (det > 0.0).astype(jnp.int32)
        code_masked = jnp.where(t_masked == tile_best, codes, jnp.int32(2**30))
        code = jnp.min(code_masked, axis=1, keepdims=True)
        take = tile_best < best_t
        best_t = jnp.where(take, tile_best, best_t)
        best_code = jnp.where(take, code, best_code)

    return best_t, best_code, any_hit


def _sweep_init(dx):
    zero = dx * 0.0  # (B, 1), inherits any shard_map variance
    return (zero + INF, zero.astype(jnp.int32) - 1, zero > 0.0)


def _sweep_kernel(
    rays_ref, tris_ref, tiles_on_ref, code_ref, any_ref, *, tri_tile: int,
    want_matrix: bool, want_any: bool
):
    n_tiles = tris_ref.shape[1] // tri_tile
    rays = _ray_columns(rays_ref)

    def tile_body(i, carry):
        off = i * tri_tile
        row = lambda r: tris_ref[r : r + 1, pl.ds(off, tri_tile)]  # (1, T)
        return _tile_step(rays, row, carry, want_matrix=want_matrix,
                          want_any=want_any)

    def guarded_body(i, carry):
        # whole-tile skip: Morton clustering makes culled regions contiguous
        return jax.lax.cond(
            tiles_on_ref[0, i] > 0, lambda c: tile_body(i, c), lambda c: c, carry
        )

    best_t, best_code, any_hit = jax.lax.fori_loop(
        0, n_tiles, guarded_body, _sweep_init(rays[3])
    )
    code_ref[:, :] = jnp.where(best_t < INF, best_code, -1)
    any_ref[:, :] = any_hit.astype(jnp.int32)


def _sweep_kernel_streamed(
    rays_ref, tris_hbm, tiles_on_ref, code_ref, any_ref, *,
    tri_tile: int, n_tiles: int, want_matrix: bool, want_any: bool
):
    """HBM-streaming variant: the operand pack stays in HBM and tile slices
    are double-buffered into VMEM scratch, so scene size is unbounded.

    The sweep is compute-bound for blocks of >= a few hundred rays (each
    streamed byte feeds ray_block pair tests), so the DMA pipeline hides
    entirely behind the tile math.
    """
    rays = _ray_columns(rays_ref)

    def body(buf_ref, sem_ref):
        def tile_dma(slot, i):
            return pltpu.make_async_copy(
                tris_hbm.at[:, pl.ds(i * tri_tile, tri_tile)],
                buf_ref.at[slot],
                sem_ref.at[slot],
            )

        tile_dma(0, 0).start()

        def tile_body(i, carry):
            slot = i % 2

            @pl.when(i + 1 < n_tiles)
            def _():
                tile_dma((i + 1) % 2, i + 1).start()

            tile_dma(slot, i).wait()
            row = lambda r: buf_ref[slot, r : r + 1, :]  # (1, T)
            return _tile_step(rays, row, carry, want_matrix=want_matrix,
                              want_any=want_any)

        best_t, best_code, any_hit = jax.lax.fori_loop(
            0, n_tiles, tile_body, _sweep_init(rays[3])
        )
        code_ref[:, :] = jnp.where(best_t < INF, best_code, -1)
        any_ref[:, :] = any_hit.astype(jnp.int32)

    pl.run_scoped(
        body,
        pltpu.VMEM((2, TRI_ROWS, tri_tile), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    )
    del tiles_on_ref  # tiles stream regardless; skipping saves no DMA here


def sweep_rays(
    rays: jnp.ndarray,  # (N, 9) f32: [o | d | o x d]
    tri_pack: jnp.ndarray,  # (24, Tpad) f32
    sweep_mask: jnp.ndarray,  # (Tpad,) bool: triangles this sweep may touch
    *,
    ray_block: int,
    tri_tile: int,
    want_matrix: bool,
    want_any: bool,
    interpret: bool = False,
    stream_from_hbm: bool | None = None,
):
    """Sweep all rays against all triangles; returns (codes (N,), any (N,)).

    For scenes whose operand pack exceeds the VMEM budget the kernel
    switches to the HBM-streaming variant (double-buffered tile DMA);
    ``stream_from_hbm`` forces either mode.
    """
    from ..config import PALLAS_MAX_TRIS

    n = rays.shape[0]
    n_tri_pad = tri_pack.shape[1]
    tile = min(tri_tile, n_tri_pad)
    while tile > 128 and n_tri_pad % tile != 0:
        tile //= 2
    grid = (n // ray_block,)
    n_tiles = n_tri_pad // tile
    tiles_on = jnp.any(sweep_mask.reshape(n_tiles, tile), axis=1).astype(jnp.int32)
    if stream_from_hbm is None:
        stream_from_hbm = n_tri_pad > PALLAS_MAX_TRIS

    if stream_from_hbm:
        kernel = functools.partial(
            _sweep_kernel_streamed,
            tri_tile=tile,
            n_tiles=n_tiles,
            want_matrix=want_matrix,
            want_any=want_any,
        )
        tris_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    else:
        kernel = functools.partial(
            _sweep_kernel,
            tri_tile=tile,
            want_matrix=want_matrix,
            want_any=want_any,
        )
        tris_spec = pl.BlockSpec(
            (TRI_ROWS, n_tri_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        )

    codes, any_hit = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ray_block, 16), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            tris_spec,
            pl.BlockSpec((1, n_tiles), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((ray_block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.pad(rays, ((0, 0), (0, 16 - rays.shape[1]))),
        tri_pack,
        tiles_on[None, :],
    )
    return codes[:, 0], any_hit[:, 0]


__all__ = ["build_tri_pack", "sweep_rays", "TRI_ROWS"]
