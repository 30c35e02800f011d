"""Oracle analysis at 10M tris (block-subsampled): how close is the per-tile
gate to the information-theoretic visit floor on the 10M-tri city?

Same method as docs/measurements/gate_oracle_r04.py (1M, full-ray), but the
pair sweep and simulation run over a random sample of ray blocks — the
visited-fraction statistic is an average over blocks, so a 24-block sample
estimates it tightly at 1/13 the pair-sweep cost.
"""
import sys, time
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import importlib.util

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

from raystrack_tpu.prepared import PreparedSolver
from raystrack_tpu.ops import trace as T
from raystrack_tpu.ops.trace_pallas import _gate_tables, sweep_tile_width
from raystrack_tpu.solver import _cp_rows
from raystrack_tpu.config import PALLAS_TRI_TILE, PALLAS_RAY_BLOCK

N_TRI = 10_000_000
SAMPLE_BLOCKS = 24
t0 = time.time()
ps = PreparedSolver(bench._city(N_TRI))
scene = ps.get_scene_pack(use_accel=True)
em = ps.get_emitter_pack(0, samples=1, rays=1, flip_faces=False)
n_surf = len(ps.meshes)
ext = np.zeros(n_surf + 1, dtype=np.int32)
ext[1:-1] = 1
print(f"scene packed {time.time()-t0:.1f}s n_tri_pad={scene.v0.shape[0]} "
      f"n_rays={em.n_rays_once} pad={em.n_rays_pad}", flush=True)

sc = (scene.v0, scene.e1, scene.e2, scene.cross_e,
      scene.w_u, scene.w_v, scene.d0, scene.sid)
tables = (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2)
geom = (em.cdf, em.tri_a, em.tri_e1, em.tri_e2,
        em.tri_u, em.tri_v, em.tri_n, em.tri_eps)
cp = _cp_rows(0, 0, 0, 1).astype(np.float32)

o, d = jax.vmap(T.generate_rays, in_axes=(None, None, 0))(tables, geom, jnp.asarray(cp))
ray_valid = jnp.broadcast_to(
    jnp.arange(o.shape[1], dtype=jnp.int32) < em.n_rays_once, (1, o.shape[1]))
accel = scene.accel
scene_lo = jnp.min(accel[0], axis=0)
scene_hi = jnp.max(accel[1], axis=0)
o, d, ray_valid = T.sort_rays_for_coherence(
    o, d, ray_valid, scene_lo=scene_lo, scene_hi=scene_hi)
o = np.asarray(o[0])
d = np.asarray(d[0])
N = o.shape[0]

m_any, m_mat = T.compute_masks(sc, jnp.asarray(ext), jnp.int32(0), jnp.int32(0), None)
m_mat = np.asarray(m_mat)

tile = sweep_tile_width(scene.v0.shape[0], PALLAS_TRI_TILE)
n_tiles = scene.v0.shape[0] // tile
B = PALLAS_RAY_BLOCK
n_blocks = N // B
rays16 = np.concatenate([o, d, np.cross(o, d)], axis=-1).T
aabb, order, _counts, group = _gate_tables(
    jax.tree.map(jnp.asarray, accel), jnp.asarray(rays16), n_blocks, B, n_tiles, tile)
aabb = np.asarray(aabb); order = np.asarray(order)
print(f"tile={tile} n_tiles={n_tiles} group={group} blocks={n_blocks} "
      f"{time.time()-t0:.1f}s", flush=True)
assert group == 1, group  # per-tile after the GATE_MAX_TILES raise

tiles_on = np.asarray(T.tile_activity(jnp.asarray(m_mat), tile))

rng = np.random.default_rng(3)
blocks = np.sort(rng.choice(n_blocks, size=min(SAMPLE_BLOCKS, n_blocks),
                            replace=False))
rows = np.concatenate([np.arange(b * B, (b + 1) * B) for b in blocks])
oS, dS = o[rows], d[rows]
cS = np.cross(oS, dS)
NS = oS.shape[0]

v0 = jnp.asarray(scene.v0); e1 = jnp.asarray(scene.e1); e2 = jnp.asarray(scene.e2)
ce = jnp.where(jnp.asarray(m_mat)[:, None], jnp.asarray(scene.cross_e), 0.0)
wu = jnp.asarray(scene.w_u); wv = jnp.asarray(scene.w_v); d0v = jnp.asarray(scene.d0)
INF = 1.0e20

@jax.jit
def tile_min_t(o_b, d_b, c_b, ceT, e1T, e2T, wuT, wvT, d0T):
    det = -(d_b @ ceT)
    t_num = o_b @ ceT - d0T[None, :]
    u_num = c_b @ e2T + d_b @ wuT
    v_num = -(c_b @ e1T + d_b @ wvT)
    sign = jnp.where(det >= 0.0, 1.0, -1.0)
    abs_det = det * sign
    un = u_num * sign; vn = v_num * sign
    t_hit = t_num / det
    margin = jnp.minimum(jnp.minimum(abs_det - 1e-7, un),
                         jnp.minimum(vn, abs_det - (un + vn)))
    ok = (margin >= 0.0) & (t_hit > 1e-6)
    return jnp.min(jnp.where(ok, t_hit, INF), axis=1)

ceN = np.asarray(ce); e1N = np.asarray(e1); e2N = np.asarray(e2)
wuN = np.asarray(wu); wvN = np.asarray(wv); d0N = np.asarray(d0v)
import os
_cache = "/tmp/oracle10m_M.npz"
if os.path.exists(_cache):
    _z = np.load(_cache)
    M = _z["M"]; assert M.shape == (NS, n_tiles)
else:
    M = np.empty((NS, n_tiles), np.float32)
    _run_sweep = True
for i in ([] if os.path.exists(_cache) else range(n_tiles)):
    lo, hi = i * tile, (i + 1) * tile
    ops = (jnp.asarray(ceN[lo:hi].T), jnp.asarray(e1N[lo:hi].T),
           jnp.asarray(e2N[lo:hi].T), jnp.asarray(wuN[lo:hi].T),
           jnp.asarray(wvN[lo:hi].T), jnp.asarray(d0N[lo:hi]))
    M[:, i] = np.asarray(tile_min_t(
        jnp.asarray(oS), jnp.asarray(dS), jnp.asarray(cS), *ops))
    if i % 512 == 0:
        print(f"  tile {i}/{n_tiles} {time.time()-t0:.1f}s", flush=True)
if not os.path.exists(_cache):
    np.savez_compressed(_cache, M=M)
t_final = M.min(axis=1)
print(f"pair sweep done {time.time()-t0:.1f}s hit_frac={(t_final<INF).mean():.3f}",
      flush=True)

lo_b = aabb[0:3].T
hi_b = aabb[3:6].T
d_zeroS = np.abs(dS) <= 1e-30
invS = 1.0 / np.where(d_zeroS, 1.0, dS)
d_posS = dS >= 0.0

def intervals(rs):
    oB = oS[rs][:, None, :]; inB = invS[rs][:, None, :]
    dp = d_posS[rs][:, None, :]; dz = d_zeroS[rs][:, None, :]
    t_n = (np.where(dp, lo_b[None], hi_b[None]) - oB) * inB
    t_f = (np.where(dp, hi_b[None], lo_b[None]) - oB) * inB
    inside = (oB >= lo_b[None]) & (oB <= hi_b[None])
    t_n = np.where(dz, np.where(inside, -INF, INF), t_n)
    t_f = np.where(dz, np.where(inside, INF, -INF), t_f)
    near = t_n.max(axis=2); far = t_f.min(axis=2)
    near_c = near - (np.abs(near) * 1e-4 + 1e-6)
    far_c = far + (np.abs(far) * 1e-4 + 1e-6)
    return near_c, (far_c >= near_c) & (far_c > 1e-6)

def simulate(seed_t):
    visited = 0
    crossings = 0
    for bi, b in enumerate(blocks):
        rs = slice(bi * B, (bi + 1) * B)
        near_c, hit_box = intervals(rs)
        crossings += hit_box.sum()
        best = seed_t[rs].copy() if seed_t is not None else np.full(B, INF, np.float32)
        for j in order[b]:
            if not tiles_on[j]:
                continue
            if np.any(hit_box[:, j] & (near_c[:, j] < best)):
                visited += 1
                np.minimum(best, M[rs, j], out=best)
    return visited, crossings

def simulate_early_exit(check_every=1):
    visited = 0
    iters = 0
    base_iters = 0
    for bi, b in enumerate(blocks):
        rs = slice(bi * B, (bi + 1) * B)
        near_c, hit_box = intervals(rs)
        best = np.full(B, INF, np.float32)
        row = [j for j in order[b] if tiles_on[j]]
        base_iters += len(row)
        # static per-box bound: min over rays of near_c, +INF when uncrossed
        minnear = np.where(hit_box[:, row].any(axis=0),
                           np.where(hit_box[:, row], near_c[:, row], INF).min(axis=0),
                           INF)
        suffmin = np.minimum.accumulate(minnear[::-1])[::-1]
        for p, j in enumerate(row):
            if p % check_every == 0 and best.max() <= suffmin[p]:
                break
            iters += 1
            if np.any(hit_box[:, j] & (near_c[:, j] < best)):
                visited += 1
                np.minimum(best, M[rs, j], out=best)
    return visited, iters, base_iters


def simulate_window(K):
    visited = 0
    for bi, b in enumerate(blocks):
        rs = slice(bi * B, (bi + 1) * B)
        near_c, hit_box = intervals(rs)
        best = np.full(B, INF, np.float32)
        row = [j for j in order[b] if tiles_on[j]]
        for w0 in range(0, len(row), K):
            win = row[w0:w0 + K]
            flags = [np.any(hit_box[:, j] & (near_c[:, j] < best)) for j in win]
            for j, f in zip(win, flags):
                if f:
                    visited += 1
                    np.minimum(best, M[rs, j], out=best)
    return visited

tot = len(blocks) * int(tiles_on.sum())
for name, seed_t in [("current (no seed)", None),
                     ("oracle-seeded (t_final)", t_final)]:
    v, x = simulate(seed_t)
    print(f"{name:30s} visited {v:8d} / {tot} = {v/tot:.4f}  "
          f"(per-ray crossing {x/(NS*int(tiles_on.sum())):.4f})", flush=True)
for K in (4, 8, 16, 32):
    v = simulate_window(K)
    print(f"window K={K:2d} (stale-carry flags)  visited {v:8d} / {tot} = {v/tot:.4f}",
          flush=True)
for ce in (1, 8, 16):
    v, it, base = simulate_early_exit(ce)
    print(f"early-exit check_every={ce:2d}  visited {v:8d}  iters {it:8d} "
          f"of {base} ({it/base:.3f})", flush=True)
print(f"done {time.time()-t0:.1f}s")
