"""Fused raygen+trace+reduce chunk step: geometric and statistical checks."""
import numpy as np
import jax.numpy as jnp

from raystrack_tpu.config import RAY_BLOCK
from raystrack_tpu.ops.trace import generate_rays, trace_chunk
from raystrack_tpu.prepared import PreparedSolver
from raystrack_tpu.solver import _build_emitter_surface_mask, _cp_rows, _matrix_skip


def _square(name, size, z, normal=1, center=(0.0, 0.0)):
    cx, cy = center
    h = size / 2.0
    V = np.array(
        [
            [cx - h, cy - h, z],
            [cx + h, cy - h, z],
            [cx + h, cy + h, z],
            [cx - h, cy + h, z],
        ],
        dtype=np.float32,
    )
    if normal >= 0:
        F = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    else:
        F = np.array([[0, 2, 1], [0, 3, 2]], dtype=np.int32)
    return name, V, F


def _unit_cube_interior():
    """Closed unit cube with all faces pointing inward; floor is mesh 0."""
    meshes = [_square("floor", 1.0, 0.0, normal=+1, center=(0.5, 0.5))]
    meshes.append(_square("ceil", 1.0, 1.0, normal=-1, center=(0.5, 0.5)))

    def wall(name, axis, offset, normal_sign):
        if axis == 0:  # x = offset plane
            V = np.array(
                [[offset, 0, 0], [offset, 1, 0], [offset, 1, 1], [offset, 0, 1]],
                dtype=np.float32,
            )
        else:  # y = offset plane
            V = np.array(
                [[0, offset, 0], [1, offset, 0], [1, offset, 1], [0, offset, 1]],
                dtype=np.float32,
            )
        F = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
        # check the winding's normal, flip if it points outward
        n = np.cross(V[1] - V[0], V[2] - V[0])
        want = np.zeros(3)
        want[axis] = normal_sign
        if np.dot(n, want) < 0:
            F = F[:, [0, 2, 1]]
        return name, V, F

    meshes.append(wall("x0", 0, 0.0, +1))
    meshes.append(wall("x1", 0, 1.0, -1))
    meshes.append(wall("y0", 1, 0.0, +1))
    meshes.append(wall("y1", 1, 1.0, -1))
    return meshes


def _run(meshes, idx_emit, *, chunk=2, reciprocity=False, want_matrix=True,
         want_any=False, discrete=False, samples=8, rays=32, seed=5,
         surf_active=None, itr_start=0):
    ps = PreparedSolver(meshes)
    scene = ps.get_scene_pack()
    em = ps.get_emitter_pack(idx_emit, samples=samples, rays=rays, flip_faces=False)
    emitter = ps.get_emitter(idx_emit, samples=samples, rays=rays, flip_faces=False)
    if surf_active is None:
        centers, extents = ps.get_mesh_bounds()
        surf_active = _build_emitter_surface_mask(idx_emit, emitter, centers, extents)
    emit_sid, min_sid = _matrix_skip(idx_emit, reciprocity)
    ext = np.zeros(len(meshes) + 1, dtype=np.int32)
    ext[:-1] = surf_active
    cp = _cp_rows(seed, idx_emit, itr_start, chunk)
    out = trace_chunk(
        (scene.v0, scene.e1, scene.e2, scene.cross_e, scene.w_u, scene.w_v, scene.d0, scene.sid),
        (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2),
        (em.cdf, em.tri_a, em.tri_e1, em.tri_e2, em.tri_u, em.tri_v, em.tri_n, em.tri_eps),
        jnp.asarray(cp),
        jnp.asarray(ext),
        jnp.int32(emit_sid),
        jnp.int32(min_sid),
        jnp.int32(em.n_rays_once),
        ray_block=RAY_BLOCK,
        tri_tile=scene.tri_tile,
        want_matrix=want_matrix,
        want_any=want_any,
        discrete=discrete,
    )
    return {k: np.asarray(v) for k, v in out.items()}, em.n_rays_once


def test_raygen_geometry():
    meshes = [_square("s", 2.0, 0.5)]
    ps = PreparedSolver(meshes)
    em = ps.get_emitter_pack(0, samples=8, rays=16, flip_faces=False)
    cp = _cp_rows(3, 0, 0, 1)[0]
    tables = (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2)
    geom = (em.cdf, em.tri_a, em.tri_e1, em.tri_e2, em.tri_u, em.tri_v, em.tri_n, em.tri_eps)
    o, d = generate_rays(tables, geom, jnp.asarray(cp))
    o = np.asarray(o)[: em.n_rays_once]
    d = np.asarray(d)[: em.n_rays_once]
    # origins on the emitter plane, offset along +Z by eps
    eps = np.asarray(em.tri_eps)[0]
    np.testing.assert_allclose(o[:, 2], 0.5 + eps, atol=1e-6)
    assert np.all(np.abs(o[:, 0]) <= 1.0 + 1e-5)
    assert np.all(np.abs(o[:, 1]) <= 1.0 + 1e-5)
    # unit, upward, cosine-weighted directions (E[cos theta] = 2/3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    assert np.all(d[:, 2] >= 0.0)
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.02


def test_full_occlusion_hits_everything():
    """Inside a closed cube (almost) every ray lands on exactly one surface.

    A handful of grazing rays may slip through triangle seams in f32 — the
    same watertightness behavior as the reference kernels — so totals are
    checked to 99% and misses must be consistently classified as sky.
    """
    meshes = _unit_cube_interior()
    out, n_rays = _run(meshes, 0, chunk=2, want_any=True)
    total = (out["counts_f"] + out["counts_b"]).sum(axis=1)
    assert np.all(total >= 0.99 * n_rays)
    # all faces point inward, all hits are front hits
    np.testing.assert_array_equal(out["counts_b"].sum(), 0)
    # every escaped ray goes up (emitter is the floor) -> exact consistency
    np.testing.assert_array_equal(out["upward"], n_rays - total)


def test_front_vs_back_classification():
    # receiver's normal points up (away from emitter below) -> back hits only
    meshes = [
        _square("emitter", 1.0, 0.0, normal=+1),
        _square("away", 20.0, 1.0, normal=+1),
    ]
    out, n_rays = _run(meshes, 0, chunk=1)
    assert out["counts_f"][0, 1] == 0
    assert out["counts_b"][0, 1] > 0.9 * n_rays

    # receiver facing the emitter -> front hits only
    meshes = [
        _square("emitter", 1.0, 0.0, normal=+1),
        _square("toward", 20.0, 1.0, normal=-1),
    ]
    out, _ = _run(meshes, 0, chunk=1)
    assert out["counts_b"][0, 1] == 0
    assert out["counts_f"][0, 1] > 0


def test_emitter_never_hits_itself():
    meshes = [_square("e", 1.0, 0.0), _square("r", 4.0, 1.0, normal=-1)]
    out, _ = _run(meshes, 0, chunk=2)
    assert np.all(out["counts_f"][:, 0] == 0)
    assert np.all(out["counts_b"][:, 0] == 0)


def test_min_sid_makes_lower_ids_transparent():
    """With reciprocity, surfaces below the emitter id don't occlude."""
    meshes = [
        _square("low", 6.0, 0.5, normal=-1),   # sid 0, between emitter and top
        _square("emitter", 1.0, 0.0),          # sid 1
        _square("top", 6.0, 1.0, normal=-1),   # sid 2
    ]
    # reciprocity=True -> min_sid=2: 'low' is transparent, hits land on 'top'
    out, n_rays = _run(meshes, 1, reciprocity=True, chunk=1)
    assert out["counts_f"][0, 0] == 0
    assert out["counts_f"][0, 2] > 0.5 * n_rays
    # reciprocity=False -> 'low' occludes and receives the nearest hits
    out2, _ = _run(meshes, 1, reciprocity=False, chunk=1)
    assert out2["counts_f"][0, 0] > 0.5 * n_rays
    assert out2["counts_f"][0, 2] < out["counts_f"][0, 2]


def test_surf_active_mask_disables_surface():
    meshes = [
        _square("emitter", 1.0, 0.0),
        _square("mid", 6.0, 0.5, normal=-1),
        _square("top", 6.0, 1.0, normal=-1),
    ]
    active = np.array([0, 0, 1], dtype=np.uint8)  # disable 'mid'
    out, n_rays = _run(meshes, 0, chunk=1, surf_active=active)
    assert out["counts_f"][0, 1] == 0
    assert out["counts_f"][0, 2] > 0.5 * n_rays


def test_sky_merged_counts_unblocked_upward():
    # nothing above the emitter except a tiny distant plate
    meshes = [
        _square("emitter", 1.0, 0.0),
        _square("plate", 0.5, 5.0, normal=-1, center=(30.0, 0.0)),
    ]
    out, n_rays = _run(meshes, 0, chunk=2, want_matrix=False, want_any=True)
    # virtually all rays go up unblocked
    assert np.all(out["upward"] >= n_rays - 2)

    # fully covered emitter -> zero sky
    meshes = [
        _square("emitter", 1.0, 0.0),
        _square("lid", 50.0, 0.5, normal=-1),
    ]
    out, _ = _run(meshes, 0, chunk=1, want_matrix=False, want_any=True)
    assert out["upward"][0] == 0


def test_sky_discrete_bins_sum_to_merged():
    meshes = [
        _square("emitter", 1.0, 0.0),
        _square("half", 4.0, 1.0, normal=-1, center=(2.0, 0.0)),
    ]
    merged, _ = _run(meshes, 0, chunk=2, want_matrix=False, want_any=True, discrete=False)
    binned, _ = _run(meshes, 0, chunk=2, want_matrix=False, want_any=True, discrete=True)
    np.testing.assert_array_equal(binned["sky_bins"].sum(axis=1), merged["upward"])


def test_chunking_is_deterministic():
    meshes = _unit_cube_interior()
    big, _ = _run(meshes, 0, chunk=4)
    small_a, _ = _run(meshes, 0, chunk=2, itr_start=0)
    small_b, _ = _run(meshes, 0, chunk=2, itr_start=2)
    np.testing.assert_array_equal(big["counts_f"][:2], small_a["counts_f"])
    np.testing.assert_array_equal(big["counts_f"][2:], small_b["counts_f"])


def test_matches_float64_oracle_statistically():
    """Counts from the f32 device sweep match a float64 NumPy tracer."""
    meshes = [
        _square("emitter", 1.0, 0.0),
        _square("mid", 1.5, 0.7, normal=-1, center=(0.3, -0.2)),
        _square("top", 3.0, 1.3, normal=+1, center=(-0.4, 0.1)),
    ]
    out, n_rays = _run(meshes, 0, chunk=1, rays=64)

    # independent float64 ray generation + Moller-Trumbore
    ps = PreparedSolver(meshes)
    em = ps.get_emitter(0, samples=8, rays=64, flip_faces=False)
    scene = ps.get_scene()
    cp = _cp_rows(5, 0, 0, 1)[0].astype(np.float64)

    idx = np.arange(em.n_cells * 64)
    cell = idx // 64
    ug = (em.u_grid[cell].astype(np.float64) + cp[0]) % 1.0
    vg = (em.v_grid[cell].astype(np.float64) + cp[1]) % 1.0
    q = (em.halton_tri[idx].astype(np.float64) + cp[2]) % 1.0
    tri = np.searchsorted(em.cdf, q, side="left").clip(0, em.cdf.shape[0] - 1)
    ur = (em.halton_u[idx].astype(np.float64) + cp[3] + ug) % 1.0
    vr = (em.halton_v[idx].astype(np.float64) + cp[4] + vg) % 1.0
    s = np.sqrt(ur)
    p = (
        em.tri_a[tri]
        + (s * vr)[:, None] * em.tri_e1[tri]
        + (s * (1 - vr))[:, None] * em.tri_e2[tri]
    )
    r1 = (em.halton_r1[idx].astype(np.float64) + cp[5]) % 1.0
    r2 = (em.halton_r2[idx].astype(np.float64) + cp[6]) % 1.0
    st = np.sqrt(1 - r1)
    phi = 2 * np.pi * r2
    d = (
        (st * np.cos(phi))[:, None] * em.tri_u[tri]
        + (st * np.sin(phi))[:, None] * em.tri_v[tri]
        + np.sqrt(r1)[:, None] * em.tri_n[tri]
    )
    o = p + em.tri_origin_eps[tri][:, None] * em.tri_n[tri]

    best_t = np.full(len(idx), np.inf)
    hit_sid = np.full(len(idx), -1)
    front = np.zeros(len(idx), bool)
    for i in range(scene.v0.shape[0]):
        if scene.sid[i] == 0:
            continue
        e1 = scene.e1[i].astype(np.float64)
        e2 = scene.e2[i].astype(np.float64)
        v0 = scene.v0[i].astype(np.float64)
        pvec = np.cross(d, e2)
        det = (pvec * e1).sum(1)
        ok = np.abs(det) >= 1e-7
        inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = o - v0
        u = (tvec * pvec).sum(1) * inv
        qvec = np.cross(tvec, e1)
        v = (d * qvec).sum(1) * inv
        t = (e2 * qvec).sum(1) * inv
        ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-6) & (t < best_t)
        best_t = np.where(ok, t, best_t)
        hit_sid = np.where(ok, scene.sid[i], hit_sid)
        front = np.where(ok, -(d * scene.normals[i]).sum(1) > 0, front)

    want_f = np.zeros(3, np.int64)
    want_b = np.zeros(3, np.int64)
    for sid in (1, 2):
        want_f[sid] = np.sum((hit_sid == sid) & front)
        want_b[sid] = np.sum((hit_sid == sid) & ~front)

    # f32 vs f64 disagreement only for rays within float eps of an edge
    tol = max(3, int(0.003 * n_rays))
    assert np.all(np.abs(out["counts_f"][0] - want_f) <= tol)
    assert np.all(np.abs(out["counts_b"][0] - want_b) <= tol)


def test_pallas_kernel_matches_xla():
    """The fused Pallas sweep (interpret mode on CPU) is bitwise-identical
    to the XLA tiled sweep."""
    meshes = [
        _square("emitter", 1.0, 0.0),
        _square("mid", 1.5, 0.7, normal=-1, center=(0.3, -0.2)),
        _square("top", 3.0, 1.3, normal=+1, center=(-0.4, 0.1)),
    ]
    import jax.numpy as jnp

    ps = PreparedSolver(meshes)
    scene = ps.get_scene_pack()
    em = ps.get_emitter_pack(0, samples=8, rays=32, flip_faces=False)
    emitter = ps.get_emitter(0, samples=8, rays=32, flip_faces=False)
    centers, extents = ps.get_mesh_bounds()
    surf_active = _build_emitter_surface_mask(0, emitter, centers, extents)
    ext = np.zeros(len(meshes) + 1, dtype=np.int32)
    ext[:-1] = surf_active
    cp = _cp_rows(5, 0, 0, 2)
    args = (
        (scene.v0, scene.e1, scene.e2, scene.cross_e, scene.w_u, scene.w_v, scene.d0, scene.sid),
        (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2),
        (em.cdf, em.tri_a, em.tri_e1, em.tri_e2, em.tri_u, em.tri_v, em.tri_n, em.tri_eps),
        jnp.asarray(cp), jnp.asarray(ext),
        jnp.int32(0), jnp.int32(0), jnp.int32(em.n_rays_once),
    )
    kw = dict(ray_block=RAY_BLOCK, tri_tile=scene.tri_tile,
              want_matrix=True, want_any=True, discrete=True)
    a = {k: np.asarray(v) for k, v in trace_chunk(*args, kernel="xla", **kw).items()}
    b = {k: np.asarray(v) for k, v in trace_chunk(*args, kernel="pallas", interpret=True, **kw).items()}
    assert set(a) == set(b) == {"counts_f", "counts_b", "sky_bins"}
    for key in a:
        np.testing.assert_array_equal(a[key], b[key])


def test_pallas_streamed_matches_resident():
    """The HBM-streaming Pallas variant equals the VMEM-resident one."""
    import jax.numpy as jnp
    from raystrack_tpu.ops.trace import compute_masks
    from raystrack_tpu.ops.trace_pallas import build_tri_pack, sweep_rays

    rng = np.random.default_rng(2)
    n_tri = 384
    V = rng.uniform(-3, 3, (n_tri * 3, 3)).astype(np.float32)
    F = np.arange(n_tri * 3, dtype=np.int32).reshape(-1, 3)
    ps = PreparedSolver([("cloud", V, F)])
    pk = ps.get_scene_pack()
    scene_t = (pk.v0, pk.e1, pk.e2, pk.cross_e, pk.w_u, pk.w_v, pk.d0, pk.sid)
    ext = jnp.asarray(np.array([1, 0], np.int32))
    m_any, m_mat = compute_masks(scene_t, ext, jnp.int32(99), jnp.int32(0))
    tp = build_tri_pack(scene_t, m_any, m_mat)

    o = rng.uniform(-5, -4, (1024, 3)).astype(np.float32)
    d = rng.normal(size=(1024, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays9 = jnp.asarray(
        np.concatenate([o, d, np.cross(o, d)], axis=1).astype(np.float32).T
    )  # (9, N) transposed store

    kw = dict(ray_block=512, tri_tile=128, want_matrix=True, want_any=True,
              interpret=True)
    c1, a1 = sweep_rays(rays9, tp, m_any, stream_from_hbm=False, **kw)
    c2, a2 = sweep_rays(rays9, tp, m_any, stream_from_hbm=True, **kw)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert int((np.asarray(c1) >= 0).sum()) > 0  # scene actually hit


def test_scheduled_trace_matches_chunk_body():
    """A block schedule spanning two emitters reproduces per-emitter chunk
    results exactly (matrix + sky outputs)."""
    from raystrack_tpu.ops.trace import scheduled_trace

    meshes = [
        _square("ground", 2.0, 0.0, normal=+1),
        _square("mid", 1.5, 0.7, normal=-1, center=(0.3, -0.2)),
        _square("top", 3.0, 1.3, normal=-1),
    ]
    ps = PreparedSolver(meshes)
    scene = ps.get_scene_pack()
    scene_t = (scene.v0, scene.e1, scene.e2, scene.cross_e,
               scene.w_u, scene.w_v, scene.d0, scene.sid)
    tables_flat, geom_stacked, offsets, n_pad = ps.get_flat_tables(
        samples=8, rays=32, flip_faces=False
    )
    E, S = len(meshes), len(meshes)
    surf_b = np.zeros((E, S + 1), np.int32)
    emit_b = np.zeros(E, np.int32)
    min_b = np.zeros(E, np.int32)
    once_b = np.zeros(E, np.int32)
    plane_b = np.zeros((E, 8), np.float32)
    centers, extents = ps.get_mesh_bounds()
    for e in range(E):
        em_host = ps.get_emitter(e, samples=8, rays=32, flip_faces=False)
        surf_b[e, :-1] = _build_emitter_surface_mask(e, em_host, centers, extents)
        emit_b[e], min_b[e] = _matrix_skip(e, False)
        once_b[e] = em_host.n_cells * 32
        pk = ps.get_emitter_pack(e, samples=8, rays=32, flip_faces=False)
        plane_b[e] = np.asarray(pk.plane_vec)

    # schedule: 2 iterations of emitter 0, 1 iteration of emitter 2
    rows, cps = [], []
    for e, itr in ((0, 0), (0, 1), (2, 0)):
        ci = len(cps)
        cps.append(_cp_rows(5, e, itr, 1)[0])
        for b in range(int(n_pad[e]) // RAY_BLOCK):
            rows.append([e, ci, int(offsets[e]) + b * RAY_BLOCK, b * RAY_BLOCK])
    out = scheduled_trace(
        scene_t, tables_flat, geom_stacked,
        jnp.asarray(np.stack(cps)), jnp.asarray(surf_b), jnp.asarray(emit_b),
        jnp.asarray(min_b), jnp.asarray(once_b), jnp.asarray(plane_b),
        jnp.asarray(np.asarray(rows, np.int32)),
        ray_block=RAY_BLOCK, tri_tile=scene.tri_tile,
        want_matrix=True, want_any=True, discrete=True,
    )
    sched = {k: np.asarray(v) for k, v in out.items()}

    # reference: per-emitter chunk_body through trace_chunk
    def per_emitter(e, chunk, itr0):
        ref, n_once = _run(meshes, e, chunk=chunk, itr_start=itr0,
                           want_matrix=True, want_any=True, discrete=True,
                           samples=8, rays=32)
        return ref

    ref0 = per_emitter(0, 2, 0)
    ref2 = per_emitter(2, 1, 0)
    bpi0 = int(n_pad[0]) // RAY_BLOCK
    bpi2 = int(n_pad[2]) // RAY_BLOCK
    for key in ("counts_f", "counts_b", "sky_bins"):
        np.testing.assert_array_equal(sched[key][:bpi0].sum(0), ref0[key][0])
        np.testing.assert_array_equal(sched[key][bpi0:2 * bpi0].sum(0), ref0[key][1])
        np.testing.assert_array_equal(sched[key][2 * bpi0:].sum(0), ref2[key][0])


def test_vertical_and_flipped_emitters_against_oracle():
    """Raygen + trace for a vertical (x-normal) emitter and a flip_faces
    emitter, checked against float64 brute force."""
    wall_V = np.array(
        [[0, -1, 0], [0, 1, 0], [0, 1, 2], [0, -1, 2]], dtype=np.float32
    )
    wall_F = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)  # +X normal
    meshes = [
        ("wall", wall_V, wall_F),
        _square("floor", 6.0, 0.0, normal=+1, center=(2.0, 0.0)),
        _square("lid", 6.0, 3.0, normal=-1, center=(2.0, 0.0)),
    ]
    for flip in (False, True):
        ps = PreparedSolver(meshes)
        em = ps.get_emitter_pack(0, samples=8, rays=64, flip_faces=flip)
        emitter = ps.get_emitter(0, samples=8, rays=64, flip_faces=flip)
        scene_pk = ps.get_scene_pack()
        scene = ps.get_scene()
        ext = np.array([0, 1, 1, 0], np.int32)
        cp = _cp_rows(7, 0, 0, 1)
        out = trace_chunk(
            (scene_pk.v0, scene_pk.e1, scene_pk.e2, scene_pk.cross_e,
             scene_pk.w_u, scene_pk.w_v, scene_pk.d0, scene_pk.sid),
            (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2),
            (em.cdf, em.tri_a, em.tri_e1, em.tri_e2, em.tri_u, em.tri_v,
             em.tri_n, em.tri_eps),
            jnp.asarray(cp), jnp.asarray(ext),
            jnp.int32(0), jnp.int32(0), jnp.int32(em.n_rays_once),
            ray_block=RAY_BLOCK, tri_tile=scene_pk.tri_tile,
            want_matrix=True, want_any=False, discrete=False,
        )
        got_f = np.asarray(out["counts_f"])[0]
        got_b = np.asarray(out["counts_b"])[0]

        # float64 oracle: rays from the emitter tables, brute-force MT
        tables = (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2)
        geom = (em.cdf, em.tri_a, em.tri_e1, em.tri_e2, em.tri_u, em.tri_v,
                em.tri_n, em.tri_eps)
        o, d = generate_rays(tables, geom, jnp.asarray(cp[0]))
        o = np.asarray(o, np.float64)[: em.n_rays_once]
        d = np.asarray(d, np.float64)[: em.n_rays_once]
        # flip flips emission direction: rays must go -X instead of +X
        assert (d[:, 0] < 0).mean() > 0.99 if flip else (d[:, 0] > 0).mean() > 0.99

        best_t = np.full(len(o), np.inf)
        hit_sid = np.full(len(o), -1)
        front = np.zeros(len(o), bool)
        for i in range(scene.v0.shape[0]):
            if scene.sid[i] == 0:
                continue
            e1 = scene.e1[i].astype(np.float64)
            e2 = scene.e2[i].astype(np.float64)
            v0 = scene.v0[i].astype(np.float64)
            p = np.cross(d, e2)
            det = (p * e1).sum(1)
            ok = np.abs(det) >= 1e-7
            inv = np.where(ok, 1 / np.where(det == 0, 1, det), 0.0)
            t_ = o - v0
            u = (t_ * p).sum(1) * inv
            q = np.cross(t_, e1)
            v = (d * q).sum(1) * inv
            tt = (q @ e2) * inv
            ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (tt > 1e-6) & (tt < best_t)
            best_t = np.where(ok, tt, best_t)
            hit_sid = np.where(ok, scene.sid[i], hit_sid)
            front = np.where(ok, -(d * scene.normals[i]).sum(1) > 0, front)

        tol = max(3, int(0.003 * em.n_rays_once))
        for sid in (1, 2):
            assert abs(got_f[sid] - int(((hit_sid == sid) & front).sum())) <= tol
            assert abs(got_b[sid] - int(((hit_sid == sid) & ~front).sum())) <= tol


def test_pallas_partial_output_block_rows():
    """Ten 256-ray blocks: the (8, B) revisited output blocks span one full
    block plus a PARTIAL second (rows 8-9 of a (10, B) array) — the new
    transposed-layout output path must place every block's codes on its own
    row with no bleed between grid steps (gated path: no block widening)."""
    import jax.numpy as jnp
    from raystrack_tpu.ops.trace import compute_masks
    from raystrack_tpu.ops.trace_pallas import build_tri_pack, sweep_rays

    rng = np.random.default_rng(7)
    n_tri = 1024
    V = rng.uniform(-3, 3, (n_tri * 3, 3)).astype(np.float32)
    F = np.arange(n_tri * 3, dtype=np.int32).reshape(-1, 3)
    ps = PreparedSolver([("cloud", V, F)])
    pk = ps.get_scene_pack(use_accel=True)
    scene_t = (pk.v0, pk.e1, pk.e2, pk.cross_e, pk.w_u, pk.w_v, pk.d0, pk.sid)
    ext = jnp.asarray(np.array([1, 0], np.int32))
    m_any, m_mat = compute_masks(scene_t, ext, jnp.int32(99), jnp.int32(0))
    tp = build_tri_pack(scene_t, m_any, m_mat)

    n = 10 * 256
    o = rng.uniform(-5, -4, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays9 = jnp.asarray(
        np.concatenate([o, d, np.cross(o, d)], axis=1).astype(np.float32).T
    )
    kw = dict(ray_block=256, tri_tile=128, want_matrix=True, want_any=True,
              interpret=True, accel=pk.accel)
    c10, a10 = sweep_rays(rays9, tp, m_any, **kw)
    # per-block ground truth: sweep each 256-ray block alone (1 out row)
    for b in range(10):
        cb, ab = sweep_rays(rays9[:, b * 256:(b + 1) * 256], tp, m_any, **kw)
        np.testing.assert_array_equal(np.asarray(c10)[b * 256:(b + 1) * 256],
                                      np.asarray(cb))
        np.testing.assert_array_equal(np.asarray(a10)[b * 256:(b + 1) * 256],
                                      np.asarray(ab))
    assert int((np.asarray(c10) >= 0).sum()) > 0
