"""Distance-pruned tile gating: AABB interval culling must be exact.

The gate (ops.trace._sweep_tiles tile_bounds / ops.trace_pallas._gate_needed)
may only skip tiles that provably cannot change a result: every kernel's
counts with acceleration enabled must match the brute-force sweep bitwise on
cluttered, heavily occluded scenes — the analogue of the reference BVH's
``node_t >= best`` pruning (reference: cpu_trace.py:243-250) being lossless.
"""
import numpy as np
import jax
import jax.numpy as jnp

from raystrack_tpu import MatrixParams, view_factor_matrix
from raystrack_tpu.config import ACCEL_GRAIN, RAY_BLOCK
from raystrack_tpu.ops.trace import compute_masks, generate_rays, trace_chunk
from raystrack_tpu.ops.trace_pallas import build_tri_pack, sweep_rays
from raystrack_tpu.prepared import PreparedSolver
from raystrack_tpu.solver import _cp_rows, _matrix_skip, _build_emitter_surface_mask


def _cluttered_scene(n_tri=1500, seed=0):
    """Emitter plate at z=0 plus a dense cloud of random triangles above and
    below it — layered so near geometry occludes far geometry."""
    h = 4.0
    V = np.array([[-h, -h, 0], [h, -h, 0], [h, h, 0], [-h, h, 0]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    emitter = ("emitter", V, F)

    rng = np.random.default_rng(seed)
    centers = rng.uniform([-4, -4, -3], [4, 4, 8], size=(n_tri, 3))
    spans = rng.normal(scale=0.5, size=(n_tri, 2, 3))
    Vc = np.concatenate(
        [centers, centers + spans[:, 0], centers + spans[:, 1]], axis=1
    ).reshape(-1, 3).astype(np.float32)
    Fc = np.arange(n_tri * 3, dtype=np.int32).reshape(-1, 3)
    return [emitter, ("cloud", Vc, Fc)]


def _chunk_inputs(meshes, idx_emit, *, samples=4, rays=64, chunk=2, seed=7,
                  use_accel=True):
    ps = PreparedSolver(meshes)
    scene = ps.get_scene_pack(use_accel=use_accel)
    em = ps.get_emitter_pack(idx_emit, samples=samples, rays=rays,
                             flip_faces=False)
    emitter = ps.get_emitter(idx_emit, samples=samples, rays=rays,
                             flip_faces=False)
    centers, extents = ps.get_mesh_bounds()
    surf_active = _build_emitter_surface_mask(idx_emit, emitter, centers, extents)
    emit_sid, min_sid = _matrix_skip(idx_emit, False)
    ext = np.zeros(len(meshes) + 1, dtype=np.int32)
    ext[:-1] = surf_active
    cp = _cp_rows(seed, idx_emit, 0, chunk)
    scene_t = (scene.v0, scene.e1, scene.e2, scene.cross_e,
               scene.w_u, scene.w_v, scene.d0, scene.sid)
    tables = (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2)
    geom = (em.cdf, em.tri_a, em.tri_e1, em.tri_e2,
            em.tri_u, em.tri_v, em.tri_n, em.tri_eps)
    return scene, scene_t, tables, geom, cp, ext, emit_sid, min_sid, em


def test_tile_bounds_cover_all_triangles():
    meshes = _cluttered_scene(n_tri=700)
    scene = PreparedSolver(meshes).get_scene_pack(use_accel=True)
    lo = np.asarray(scene.tile_lo)
    hi = np.asarray(scene.tile_hi)
    v0, e1, e2 = (np.asarray(a) for a in (scene.v0, scene.e1, scene.e2))
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=1)  # (Tp, 3, 3)
    n_tiles = scene.n_tri_pad // ACCEL_GRAIN
    for t in range(n_tiles):
        tri_lo = t * ACCEL_GRAIN
        tri_hi = min((t + 1) * ACCEL_GRAIN, scene.n_tri)
        if tri_lo >= scene.n_tri:
            assert np.all(lo[t] > hi[t])  # padded tile: empty box
            continue
        tile_pts = pts[tri_lo:tri_hi].reshape(-1, 3)
        assert np.all(lo[t] <= tile_pts.min(axis=0) + 1e-6)
        assert np.all(hi[t] >= tile_pts.max(axis=0) - 1e-6)


def test_accel_pack_has_no_bounds_when_off():
    meshes = _cluttered_scene(n_tri=300)
    pack = PreparedSolver(meshes).get_scene_pack(use_accel=False)
    assert pack.accel is None


def _trace(meshes, accel_on, *, want_matrix=True, want_any=False,
           discrete=False, kernel="xla"):
    (scene, scene_t, tables, geom, cp, ext, emit_sid, min_sid, em
     ) = _chunk_inputs(meshes, 0)
    out = trace_chunk(
        scene_t, tables, geom, jnp.asarray(cp), jnp.asarray(ext),
        jnp.int32(emit_sid), jnp.int32(min_sid), jnp.int32(em.n_rays_once),
        None, scene.accel if accel_on else None,
        ray_block=min(RAY_BLOCK, em.n_rays_pad),
        tri_tile=scene.tri_tile,
        want_matrix=want_matrix, want_any=want_any, discrete=discrete,
        kernel=kernel, interpret=(kernel == "pallas"),
    )
    return {k: np.asarray(v) for k, v in out.items()}


def test_gate_bitwise_xla_matrix():
    meshes = _cluttered_scene()
    base = _trace(meshes, False)
    gated = _trace(meshes, True)
    assert base.keys() == gated.keys()
    for k in base:
        np.testing.assert_array_equal(base[k], gated[k])
    # sanity: the scene actually produces hits
    assert base["counts_f"].sum() + base["counts_b"].sum() > 0


def test_gate_bitwise_xla_combined_discrete():
    meshes = _cluttered_scene(seed=3)
    base = _trace(meshes, False, want_any=True, discrete=True)
    gated = _trace(meshes, True, want_any=True, discrete=True)
    for k in base:
        np.testing.assert_array_equal(base[k], gated[k])
    assert base["sky_bins"].sum() > 0  # some rays escape upward


def _pallas_sweep(meshes, accel_on, stream, *, want_any=True):
    (scene, scene_t, tables, geom, cp, ext, emit_sid, min_sid, em
     ) = _chunk_inputs(meshes, 0)
    o, d = jax.vmap(generate_rays, in_axes=(None, None, 0))(
        tables, geom, jnp.asarray(cp)
    )
    n_total = cp.shape[0] * em.n_rays_pad
    rays9 = jnp.concatenate(
        [o, d, jnp.cross(o, d)], axis=-1
    ).reshape(n_total, 9).T  # (9, N) transposed store
    m_any, m_mat = compute_masks(
        scene_t, jnp.asarray(ext), jnp.int32(emit_sid), jnp.int32(min_sid)
    )
    tri_pack = build_tri_pack(scene_t, m_any, m_mat)
    codes, any_hit = sweep_rays(
        rays9, tri_pack, m_any,
        ray_block=512, tri_tile=512,
        want_matrix=True, want_any=want_any,
        interpret=True, stream_from_hbm=stream,
        accel=scene.accel if accel_on else None,
    )
    return np.asarray(codes), np.asarray(any_hit)


def test_gate_bitwise_pallas_resident():
    meshes = _cluttered_scene(seed=5)
    c0, a0 = _pallas_sweep(meshes, False, False)
    c1, a1 = _pallas_sweep(meshes, True, False)
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(a0, a1)
    assert (c0 >= 0).sum() > 0


def test_gate_bitwise_pallas_streamed():
    meshes = _cluttered_scene(seed=6)
    c0, a0 = _pallas_sweep(meshes, False, True)
    c1, a1 = _pallas_sweep(meshes, True, True)
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(a0, a1)


def test_gate_end_to_end_solvers_match(monkeypatch):
    """Full solves on an occluded scene: bvh='builtin' == bvh='off' for the
    default, scheduled, and Pallas-kernel drivers."""
    meshes = _cluttered_scene(n_tri=900, seed=8)
    params_off = MatrixParams(samples=2, rays=32, seed=4, device="cpu",
                              bvh="off", max_iters=4, min_iters=2, tol=1e-3)
    params_on = MatrixParams(**{**params_off.as_dict(), "bvh": "builtin"})
    base = view_factor_matrix(meshes, params=params_off)
    assert view_factor_matrix(meshes, params=params_on) == base

    from raystrack_tpu import config

    monkeypatch.setattr(config, "SCHEDULER", "scheduled")
    assert view_factor_matrix(meshes, params=params_on) == base
    monkeypatch.setattr(config, "SCHEDULER", "grouped")
    monkeypatch.setattr(config, "KERNEL", "pallas")
    assert view_factor_matrix(meshes, params=params_on) == base


def test_gate_sharded_matches_single_device():
    """Sharded accel sweep (XLA and Pallas kernels) == single-device counts."""
    from raystrack_tpu.parallel.sharding import ray_mesh, trace_chunk_sharded

    meshes = _cluttered_scene(n_tri=600, seed=9)
    (scene, scene_t, tables, geom, cp, ext, emit_sid, min_sid, em
     ) = _chunk_inputs(meshes, 0)
    mesh = ray_mesh(jax.devices())
    ndev = len(jax.devices())
    # re-pack with mesh-aligned ray padding
    ps = PreparedSolver(meshes)
    em = ps.get_emitter_pack(0, samples=4, rays=64, flip_faces=False,
                             align=RAY_BLOCK * ndev)
    tables = (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2)
    geom = (em.cdf, em.tri_a, em.tri_e1, em.tri_e2,
            em.tri_u, em.tri_v, em.tri_n, em.tri_eps)

    single = trace_chunk(
        scene_t, tables, geom, jnp.asarray(cp), jnp.asarray(ext),
        jnp.int32(emit_sid), jnp.int32(min_sid), jnp.int32(em.n_rays_once),
        None, scene.accel,
        ray_block=RAY_BLOCK, tri_tile=scene.tri_tile,
        want_matrix=True, want_any=True, discrete=False, kernel="xla",
    )
    for kernel in ("xla", "pallas"):
        sharded = trace_chunk_sharded(
            mesh, scene_t, tables, geom, cp, jnp.asarray(ext),
            jnp.int32(emit_sid), jnp.int32(min_sid), jnp.int32(em.n_rays_once),
            None, scene.accel,
            ray_block=RAY_BLOCK // (2 if kernel == "pallas" else 1),
            tri_tile=scene.tri_tile,
            want_matrix=True, want_any=True, discrete=False,
            kernel=kernel, interpret=(kernel == "pallas"),
        )
        for k in single:
            np.testing.assert_array_equal(
                np.asarray(single[k]), np.asarray(sharded[k]), err_msg=kernel
            )


def test_gate_bitwise_pallas_chunk_with_sorting():
    """The Pallas chunk path (coherence-sorted rays + per-block gate) must
    produce the same per-iteration counts as the ungated XLA sweep — ray
    reordering is invisible to the permutation-invariant reductions."""
    meshes = _cluttered_scene(seed=11)
    base = _trace(meshes, False, want_any=True, discrete=True)
    gated = _trace(meshes, True, want_any=True, discrete=True, kernel="pallas")
    assert base.keys() == gated.keys()
    for k in base:
        np.testing.assert_array_equal(base[k], gated[k])


def test_sort_rays_preserves_multiset():
    from raystrack_tpu.ops.trace import sort_rays_for_coherence

    rng = np.random.default_rng(0)
    o = rng.uniform(-5, 5, (3, 256, 3)).astype(np.float32)
    d = rng.normal(size=(3, 256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    valid = rng.uniform(size=(3, 256)) < 0.8
    so, sd, sv = sort_rays_for_coherence(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(valid),
        scene_lo=jnp.float32([-5, -5, -5]), scene_hi=jnp.float32([5, 5, 5]),
    )
    for itr in range(3):
        rows = {tuple(np.concatenate([o[itr, i], d[itr, i], [valid[itr, i]]]))
                for i in range(256)}
        srows = {tuple(np.concatenate(
            [np.asarray(so)[itr, i], np.asarray(sd)[itr, i],
             [np.asarray(sv)[itr, i]]])) for i in range(256)}
        assert rows == srows


def test_gate_two_level_groups_bitwise(monkeypatch):
    """Past the SMEM box budget the gate groups consecutive Morton-ordered
    tiles under one coarse box (two-level gate). Results must stay bitwise
    equal to the ungated sweep for both the resident and the HBM-streamed
    kernel — including the phantom group-padding tiles (3 tiles under a
    2-tile budget -> 2 boxes of 2, loop bound 4)."""
    from raystrack_tpu import config

    meshes = _cluttered_scene(seed=13)
    base_r = _pallas_sweep(meshes, False, False)
    base_s = _pallas_sweep(meshes, False, True)
    monkeypatch.setattr(config, "GATE_MAX_TILES", 2)
    gated_r = _pallas_sweep(meshes, True, False)
    gated_s = _pallas_sweep(meshes, True, True)
    for base, gated in ((base_r, gated_r), (base_s, gated_s)):
        np.testing.assert_array_equal(base[0], gated[0])
        np.testing.assert_array_equal(base[1], gated[1])
    assert (base_r[0] >= 0).sum() > 0


def test_gate_two_level_end_to_end(monkeypatch):
    """Full solve with the two-level gate (tiny box budget): accel on must
    equal accel off exactly through the public API."""
    from raystrack_tpu import config

    meshes = _cluttered_scene(n_tri=1100, seed=14)
    params_off = MatrixParams(samples=2, rays=32, seed=4, device="cpu",
                              bvh="off", max_iters=3, min_iters=2, tol=1e-3)
    params_on = MatrixParams(samples=2, rays=32, seed=4, device="cpu",
                             bvh="builtin", max_iters=3, min_iters=2, tol=1e-3)
    base = view_factor_matrix(meshes, params=params_off)
    monkeypatch.setattr(config, "GATE_MAX_TILES", 1)
    monkeypatch.setattr(config, "KERNEL", "pallas")
    assert view_factor_matrix(meshes, params=params_on) == base


def test_gate_tables_compaction_counts_and_order():
    """_gate_tables sorts each block's statically-crossed boxes first (near
    to far) and reports their count — the kernels loop only over those.
    Synthetic scene: four unit boxes at x = 0, 10, 20, 30."""
    from raystrack_tpu.ops.trace_pallas import _gate_tables

    tile = ACCEL_GRAIN  # one accel grain per tile: boxes ARE the tiles
    n_tiles = 4
    lo = np.array([[0, 0, 0], [10, 0, 0], [20, 0, 0], [30, 0, 0]], np.float32)
    hi = lo + 1.0
    accel = (jnp.asarray(lo), jnp.asarray(hi))

    B = 8
    blocks = []
    # block 0: from x=-1 toward +x -> crosses all four, near-to-far 0,1,2,3
    blocks.append((np.tile([[-1.0, 0.5, 0.5]], (B, 1)),
                   np.tile([[1.0, 0.0, 0.0]], (B, 1))))
    # block 1: from x=15 toward +x -> crosses only boxes 2 and 3
    blocks.append((np.tile([[15.0, 0.5, 0.5]], (B, 1)),
                   np.tile([[1.0, 0.0, 0.0]], (B, 1))))
    # block 2: from x=-1 toward -x -> crosses nothing
    blocks.append((np.tile([[-1.0, 0.5, 0.5]], (B, 1)),
                   np.tile([[-1.0, 0.0, 0.0]], (B, 1))))
    o = np.concatenate([b[0] for b in blocks])
    d = np.concatenate([b[1] for b in blocks])
    rays = jnp.asarray(
        np.concatenate([o, d, np.cross(o, d)], axis=1).T.astype(np.float32)
    )  # (9, 24)

    aabb, perm, order, counts, group = _gate_tables(accel, rays, 3, B, n_tiles, tile)
    assert group == 1
    counts = np.asarray(counts)[:3, 0]
    order = np.asarray(order)
    np.testing.assert_array_equal(counts, [4, 2, 0])
    np.testing.assert_array_equal(order[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(order[1][:2], [2, 3])
    # padded rows (Mosaic 8-row blocks) report zero crossed boxes
    assert np.asarray(order).shape[0] == 8
