"""Oracle analysis: how many gate boxes would the block gate visit on the
1M-tri occluded city if best_t were seeded (a) not at all (current), (b) by a
one-tile largest-triangle proxy pre-pass, (c) perfectly (oracle t_final)?

Bounds the value of any best_t-seeding pre-pass before implementing one.
Pure CPU (jax cpu backend + numpy); mirrors chunk_body_pallas exactly:
raygen -> coherence sort -> (16,N) gate tables -> near-to-far block sweep.
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

N_TRI = 1_000_000
t0 = time.time()
ps = PreparedSolver(bench._city(N_TRI))
scene = ps.get_scene_pack(use_accel=True)
em = ps.get_emitter_pack(0, samples=1, rays=2, flip_faces=False)
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
o = np.asarray(o[0])  # (N, 3)
d = np.asarray(d[0])
valid = np.asarray(ray_valid[0])
N = o.shape[0]

m_any, m_mat = T.compute_masks(sc, jnp.asarray(ext), jnp.int32(0), jnp.int32(0), None)
m_mat = np.asarray(m_mat)

tile = sweep_tile_width(scene.v0.shape[0], PALLAS_TRI_TILE)
n_tiles = scene.v0.shape[0] // tile
B = PALLAS_RAY_BLOCK
n_blocks = N // B
rays16 = np.concatenate([o, d, np.cross(o, d)], axis=-1).T  # (9, N)
aabb, _perm, order, _counts, group = _gate_tables(  # perm/counts added post-measurement (compacted/windowed gate)
    jax.tree.map(jnp.asarray, accel), jnp.asarray(rays16), n_blocks, B, n_tiles, tile)
aabb = np.asarray(aabb); order = np.asarray(order)
print(f"tile={tile} n_tiles={n_tiles} group={group} blocks={n_blocks} "
      f"{time.time()-t0:.1f}s", flush=True)
assert group == 1

tiles_on = np.asarray(T.tile_activity(jnp.asarray(m_mat), tile))

# ---- per-(ray, tile) min valid t (the tile math fold), chunked jax sweep ----
v0 = jnp.asarray(scene.v0); e1 = jnp.asarray(scene.e1); e2 = jnp.asarray(scene.e2)
ce = jnp.where(jnp.asarray(m_mat)[:, None], jnp.asarray(scene.cross_e), 0.0)
wu = jnp.asarray(scene.w_u); wv = jnp.asarray(scene.w_v); d0v = jnp.asarray(scene.d0)
INF = 1.0e20

@jax.jit
def tile_min_t(o_b, d_b, c_b, ceT, e1T, e2T, wuT, wvT, d0T):
    # (RB, 3) rays vs one tile's (3, T) operands -> (RB,) min valid t
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

RB = 16384
c = np.cross(o, d)
ceN = np.asarray(ce); e1N = np.asarray(e1); e2N = np.asarray(e2)
wuN = np.asarray(wu); wvN = np.asarray(wv); d0N = np.asarray(d0v)
M = np.empty((N, n_tiles), np.float32)
for i in range(n_tiles):
    lo, hi = i * tile, (i + 1) * tile
    ops = (jnp.asarray(ceN[lo:hi].T), jnp.asarray(e1N[lo:hi].T),
           jnp.asarray(e2N[lo:hi].T), jnp.asarray(wuN[lo:hi].T),
           jnp.asarray(wvN[lo:hi].T), jnp.asarray(d0N[lo:hi]))
    for r0 in range(0, N, RB):
        M[r0:r0 + RB, i] = np.asarray(tile_min_t(
            jnp.asarray(o[r0:r0 + RB]), jnp.asarray(d[r0:r0 + RB]),
            jnp.asarray(c[r0:r0 + RB]), *ops))
    if i % 64 == 0:
        print(f"  tile {i}/{n_tiles} {time.time()-t0:.1f}s", flush=True)
t_final = M.min(axis=1)
print(f"pair sweep done {time.time()-t0:.1f}s  hit_frac={(t_final<INF).mean():.3f}",
      flush=True)

# ---- per-(ray, box) conservative intervals (mirrors _gate_need_rays) ----
lo_b = aabb[0:3].T  # (n_tiles, 3)
hi_b = aabb[3:6].T
d_zero = np.abs(d) <= 1e-30
inv = 1.0 / np.where(d_zero, 1.0, d)
d_pos = d >= 0.0

def intervals(rs):  # rays slice -> (nr, n_tiles) near_c, hit_box
    oS = o[rs][:, None, :]; inS = inv[rs][:, None, :]
    dp = d_pos[rs][:, None, :]; dz = d_zero[rs][:, None, :]
    t_n = (np.where(dp, lo_b[None], hi_b[None]) - oS) * inS
    t_f = (np.where(dp, hi_b[None], lo_b[None]) - oS) * inS
    inside = (oS >= lo_b[None]) & (oS <= hi_b[None])
    t_n = np.where(dz, np.where(inside, -INF, INF), t_n)
    t_f = np.where(dz, np.where(inside, INF, -INF), t_f)
    near = t_n.max(axis=2); far = t_f.min(axis=2)
    near_c = near - (np.abs(near) * 1e-4 + 1e-6)
    far_c = far + (np.abs(far) * 1e-4 + 1e-6)
    return near_c, (far_c >= near_c) & (far_c > 1e-6)

# proxy seed: one tile's worth of the largest-area eligible triangles
area2 = np.linalg.norm(np.asarray(scene.cross_e), axis=1) * np.asarray(m_mat)
top = np.argsort(-area2)[:tile]
ceP = jnp.asarray(np.asarray(scene.cross_e)[top])
proxy = (jnp.asarray(np.asarray(scene.v0)[top]), jnp.asarray(np.asarray(scene.e1)[top]))

@jax.jit
def proxy_min_t(o_b, d_b, c_b):
    ceT = ceP.T
    e1T = jnp.asarray(np.asarray(scene.e1)[top]).T
    e2T = jnp.asarray(np.asarray(scene.e2)[top]).T
    wuT = jnp.asarray(np.asarray(scene.w_u)[top]).T
    wvT = jnp.asarray(np.asarray(scene.w_v)[top]).T
    d0T = jnp.asarray(np.asarray(scene.d0)[top])
    det = -(d_b @ ceT); t_num = o_b @ ceT - d0T[None, :]
    u_num = c_b @ e2T + d_b @ wuT
    v_num = -(c_b @ e1T + d_b @ wvT)
    sign = jnp.where(det >= 0.0, 1.0, -1.0)
    abs_det = det * sign; un = u_num * sign; vn = v_num * sign
    t_hit = t_num / det
    margin = jnp.minimum(jnp.minimum(abs_det - 1e-7, un),
                         jnp.minimum(vn, abs_det - (un + vn)))
    ok = (margin >= 0.0) & (t_hit > 1e-6)
    return jnp.min(jnp.where(ok, t_hit, INF), axis=1)

seed_proxy = np.empty(N, np.float32)
for r0 in range(0, N, RB):
    seed_proxy[r0:r0 + RB] = np.asarray(proxy_min_t(
        jnp.asarray(o[r0:r0 + RB]), jnp.asarray(d[r0:r0 + RB]),
        jnp.asarray(c[r0:r0 + RB])))
print(f"proxy capped frac={(seed_proxy<INF).mean():.3f} {time.time()-t0:.1f}s",
      flush=True)

# ---- simulate the gated sweep per block ----
def simulate(seed_t):
    visited = 0
    crossings = 0
    for b in range(n_blocks):
        rs = slice(b * B, (b + 1) * B)
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

for name, seed_t in [("current (no seed)", None),
                     ("proxy-seeded (1 tile largest tris)", seed_proxy),
                     ("oracle-seeded (t_final)", t_final)]:
    v, x = simulate(seed_t)
    tot = n_blocks * int(tiles_on.sum())
    print(f"{name:38s} visited {v:8d} / {tot} = {v/tot:.3f}  "
          f"(per-ray crossing {x/(N*int(tiles_on.sum())):.3f})", flush=True)
print(f"done {time.time()-t0:.1f}s")
