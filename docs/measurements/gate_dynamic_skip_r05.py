"""Dynamic skip fraction of the compacted+windowed gate loop (round 5).

Roadmap item A asked: after compaction removed statically-uncrossed boxes
from the visit lists and the suffix-min bound ends blocks early, how many
of the REMAINING executed loop iterations still skip (bitmask says "this
box cannot improve any ray" purely because best_t shrank below its static
crossing)? Only if that fraction is large (>30%) is set-bit iteration
(ctz-jumping the visit index) worth probing on hardware.

Method: exact CPU replay of the production gated sweep (same rays, same
coherence sort, same gate tables/order, same conservative slab margins,
true per-tile min-t folds), as in gate_oracle_10m_ee_r04.py, but the visit
loop replays the PRODUCTION fast path: per-block visit list compacted to
statically-crossed boxes, early exit via the visit-order suffix-min of
min-crossing near_c, and per-iteration dynamic gate = any(hit_box &
(near_c < best)).

Reported per scene size:
  compacted_iters   loop slots after compaction (no early exit)
  executed_iters    slots actually executed (early exit on)
  visits            executed slots that did pair math
  dynamic_skip      (executed - visits) / executed

Run: python docs/measurements/gate_dynamic_skip_r05.py [n_tri]
Committed output: gate_dynamic_skip_r05.txt
"""
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

from raystrack_tpu.prepared import PreparedSolver  # noqa: E402
from raystrack_tpu.ops import trace as T  # noqa: E402
from raystrack_tpu.ops.trace_pallas import _gate_tables, sweep_tile_width  # noqa: E402
from raystrack_tpu.solver import _cp_rows  # noqa: E402
from raystrack_tpu.config import PALLAS_TRI_TILE, PALLAS_RAY_BLOCK  # noqa: E402

INF = 1.0e20
N_TRI = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
SAMPLE_BLOCKS = 24 if N_TRI >= 10_000_000 else 10**9

t0 = time.time()
ps = PreparedSolver(bench._city(N_TRI))
scene = ps.get_scene_pack(use_accel=True)
em = ps.get_emitter_pack(0, samples=1, rays=1, flip_faces=False)
n_surf = len(ps.meshes)
ext = np.zeros(n_surf + 1, dtype=np.int32)
ext[1:-1] = 1
print(f"n_tri={N_TRI} packed {time.time()-t0:.1f}s "
      f"n_tri_pad={scene.v0.shape[0]} n_rays={em.n_rays_once}", flush=True)

sc = (scene.v0, scene.e1, scene.e2, scene.cross_e,
      scene.w_u, scene.w_v, scene.d0, scene.sid)
tables = (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2)
geom = (em.cdf, em.tri_a, em.tri_e1, em.tri_e2,
        em.tri_u, em.tri_v, em.tri_n, em.tri_eps)
cp = _cp_rows(0, 0, 0, 1).astype(np.float32)

o, d = jax.vmap(T.generate_rays, in_axes=(None, None, 0))(
    tables, geom, jnp.asarray(cp))
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

m_any, m_mat = T.compute_masks(
    sc, jnp.asarray(ext), jnp.int32(0), jnp.int32(0), None)
m_mat = np.asarray(m_mat)

tile = sweep_tile_width(scene.v0.shape[0], PALLAS_TRI_TILE)
n_tiles = scene.v0.shape[0] // tile
B = PALLAS_RAY_BLOCK
n_blocks = N // B
rays16 = np.concatenate([o, d, np.cross(o, d)], axis=-1).T
aabb, _wtab, order, counts, group = _gate_tables(
    jax.tree.map(jnp.asarray, accel), jnp.asarray(rays16),
    n_blocks, B, n_tiles, tile)
aabb = np.asarray(aabb)
order = np.asarray(order)
counts = np.asarray(counts)
print(f"tile={tile} n_tiles={n_tiles} group={group} blocks={n_blocks} "
      f"{time.time()-t0:.1f}s", flush=True)

tiles_on = np.asarray(T.tile_activity(jnp.asarray(m_mat), tile))

rng = np.random.default_rng(3)
blocks = np.sort(rng.choice(n_blocks, size=min(SAMPLE_BLOCKS, n_blocks),
                            replace=False))
rows = np.concatenate([np.arange(b * B, (b + 1) * B) for b in blocks])
oS, dS = o[rows], d[rows]
cS = np.cross(oS, dS)
NS = oS.shape[0]

ce = jnp.where(jnp.asarray(m_mat)[:, None], jnp.asarray(scene.cross_e), 0.0)
ceN = np.asarray(ce)
e1N = np.asarray(scene.e1)
e2N = np.asarray(scene.e2)
wuN = np.asarray(scene.w_u)
wvN = np.asarray(scene.w_v)
d0N = np.asarray(scene.d0)


@jax.jit
def tile_min_t(o_b, d_b, c_b, ceT, e1T, e2T, wuT, wvT, d0T):
    det = -(d_b @ ceT)
    t_num = o_b @ ceT - d0T[None, :]
    u_num = c_b @ e2T + d_b @ wuT
    v_num = -(c_b @ e1T + d_b @ wvT)
    sign = jnp.where(det >= 0.0, 1.0, -1.0)
    abs_det = det * sign
    un = u_num * sign
    vn = v_num * sign
    t_hit = t_num / det
    margin = jnp.minimum(jnp.minimum(abs_det - 1e-7, un),
                         jnp.minimum(vn, abs_det - (un + vn)))
    ok = (margin >= 0.0) & (t_hit > 1e-6)
    return jnp.min(jnp.where(ok, t_hit, INF), axis=1)


_cache = f"/tmp/dynskip_{N_TRI}_M.npz"
if os.path.exists(_cache):
    M = np.load(_cache)["M"]
    assert M.shape == (NS, n_tiles)
else:
    M = np.empty((NS, n_tiles), np.float32)
    for i in range(n_tiles):
        lo, hi = i * tile, (i + 1) * tile
        M[:, i] = np.asarray(tile_min_t(
            jnp.asarray(oS), jnp.asarray(dS), jnp.asarray(cS),
            jnp.asarray(ceN[lo:hi].T), jnp.asarray(e1N[lo:hi].T),
            jnp.asarray(e2N[lo:hi].T), jnp.asarray(wuN[lo:hi].T),
            jnp.asarray(wvN[lo:hi].T), jnp.asarray(d0N[lo:hi])))
        if i % 512 == 0:
            print(f"  tile {i}/{n_tiles} {time.time()-t0:.1f}s", flush=True)
    np.savez_compressed(_cache, M=M)
print(f"pair sweep done {time.time()-t0:.1f}s", flush=True)

lo_b = aabb[0:3].T
hi_b = aabb[3:6].T
d_zeroS = np.abs(dS) <= 1e-30
invS = 1.0 / np.where(d_zeroS, 1.0, dS)
d_posS = dS >= 0.0


def intervals(rs):
    oB = oS[rs][:, None, :]
    inB = invS[rs][:, None, :]
    dp = d_posS[rs][:, None, :]
    dz = d_zeroS[rs][:, None, :]
    t_n = (np.where(dp, lo_b[None], hi_b[None]) - oB) * inB
    t_f = (np.where(dp, hi_b[None], lo_b[None]) - oB) * inB
    inside = (oB >= lo_b[None]) & (oB <= hi_b[None])
    t_n = np.where(dz, np.where(inside, -INF, INF), t_n)
    t_f = np.where(dz, np.where(inside, INF, -INF), t_f)
    near = t_n.max(axis=2)
    far = t_f.min(axis=2)
    near_c = near - (np.abs(near) * 1e-4 + 1e-6)
    far_c = far + (np.abs(far) * 1e-4 + 1e-6)
    return near_c, (far_c >= near_c) & (far_c > 1e-6)


compacted_iters = 0
executed_iters = 0
visits = 0
for bi, b in enumerate(blocks):
    rs = slice(bi * B, (bi + 1) * B)
    near_c, hit_box = intervals(rs)
    best = np.full(B, INF, np.float32)
    # production compaction: statically-crossed AND active boxes, in the
    # original near-to-far visit order (counts from _gate_tables already
    # folds this; replicate from the raw crossing flags for transparency)
    row = [j for j in order[b]
           if tiles_on[j] and hit_box[:, j].any()]
    compacted_iters += len(row)
    minnear = np.array([
        np.where(hit_box[:, j], near_c[:, j], INF).min() for j in row],
        np.float32) if row else np.empty(0, np.float32)
    suffmin = (np.minimum.accumulate(minnear[::-1])[::-1]
               if row else minnear)
    for p, j in enumerate(row):
        if best.max() <= suffmin[p]:
            break  # production early exit (margin-exact bound)
        executed_iters += 1
        if np.any(hit_box[:, j] & (near_c[:, j] < best)):
            visits += 1
            np.minimum(best, M[rs, j], out=best)

dyn_skip = (executed_iters - visits) / max(executed_iters, 1)
print(f"n_tri={N_TRI} blocks={len(blocks)} "
      f"compacted_iters={compacted_iters} executed_iters={executed_iters} "
      f"visits={visits} dynamic_skip={dyn_skip:.4f}", flush=True)
print(f"done {time.time()-t0:.1f}s")
