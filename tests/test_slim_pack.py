"""Slim (pack-resident) scene mode for huge scenes.

At or above config.SLIM_PACK_MIN_TRIS padded triangles, pack_scene builds
the (TRI_ROWS, Tpad) sweep operand pack ONCE (chunked donated device build)
and keeps only it + sid on device; dispatches reuse the pack and the kernel
derives per-pair eligibility from the pack's code row against two scalars
(trace_pallas._tile_step ``code_bounds``). The full mode would hold both
the scene fields (~80 B/tri) and a per-dispatch pack temp (96 B/tri) in
HBM — an OOM past ~90M triangles on a 16 GB chip.

Exactness contract pinned here: slim results are BITWISE-equal to the
default baked path. The only semantic delta — the per-pair plane-cull test
is not re-applied in-kernel — removes nothing, because a culled surface
lies entirely behind the emission plane and can never be hit (the same
invariant the baked path relies on when it masks those triangles out;
reference: main.py:167-204).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from raystrack_tpu import (
    MatrixParams,
    SkyParams,
    view_factor_matrix,
    view_factor_matrix_and_sky,
    view_factor_to_tregenza_sky,
)
from raystrack_tpu.config import RAY_BLOCK
from raystrack_tpu.ops.trace import trace_chunk
from raystrack_tpu.ops.trace_pallas import TRI_ROWS
from raystrack_tpu.prepared import PreparedSolver, pack_scene, prepare_scene
from raystrack_tpu.solver import _build_emitter_surface_mask, _cp_rows


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
    F = (
        np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
        if normal >= 0
        else np.array([[0, 2, 1], [0, 3, 2]], dtype=np.int32)
    )
    return name, V, F


def _boxes(name, n_boxes, seed=0, extent=4.0):
    """Dense random boxes above z=0 (occluded-city style, 12 tris/box)."""
    rng = np.random.default_rng(seed)
    cx = rng.uniform(-extent, extent, (n_boxes, 2)).astype(np.float32)
    w = rng.uniform(0.2, 0.8, (n_boxes, 2)).astype(np.float32)
    h = rng.uniform(0.5, 2.0, n_boxes).astype(np.float32)
    box_f = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
                      [0, 4, 5], [0, 5, 1], [1, 5, 6], [1, 6, 2],
                      [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0]], np.int32)
    verts, faces = [], []
    for i in range(n_boxes):
        x0, y0 = cx[i] - w[i]
        x1, y1 = cx[i] + w[i]
        vs = np.array([[x0, y0, 0.05], [x1, y0, 0.05], [x1, y1, 0.05],
                       [x0, y1, 0.05], [x0, y0, h[i]], [x1, y0, h[i]],
                       [x1, y1, h[i]], [x0, y1, h[i]]], np.float32)
        verts.append(vs)
        faces.append(box_f + 8 * i)
    return name, np.concatenate(verts), np.concatenate(faces)


def _scene():
    """Emitter plane + occluding boxes + a plate BEHIND the plane.

    The behind plate exercises the plane cull: the full path masks its
    triangles out per pair, the slim path keeps them live in pair math —
    identical results because they are unhittable.
    """
    return [
        _square("emitter", 8.0, 0.0, normal=+1),
        _boxes("city", 24, seed=3),
        _square("behind", 8.0, -1.0, normal=-1),
        _square("top", 10.0, 3.0, normal=-1),
    ]


def _chunk_args(ps, idx_emit, *, use_accel, slim, reciprocity=True):
    scene = ps.get_scene(use_accel=use_accel)
    pack = pack_scene(scene, len(ps.meshes), slim=slim)
    em = ps.get_emitter_pack(idx_emit, samples=4, rays=16, flip_faces=False)
    emitter = ps.get_emitter(idx_emit, samples=4, rays=16, flip_faces=False)
    centers, extents = ps.get_mesh_bounds()
    surf_active = _build_emitter_surface_mask(idx_emit, emitter, centers, extents)
    ext = np.zeros(len(ps.meshes) + 1, dtype=np.int32)
    ext[:-1] = surf_active
    min_sid = idx_emit + 1 if reciprocity else 0
    cp = _cp_rows(7, idx_emit, 0, 2)
    args = (
        (pack.v0, pack.e1, pack.e2, pack.cross_e,
         pack.w_u, pack.w_v, pack.d0, pack.sid),
        (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2),
        (em.cdf, em.tri_a, em.tri_e1, em.tri_e2,
         em.tri_u, em.tri_v, em.tri_n, em.tri_eps),
        jnp.asarray(cp), jnp.asarray(ext),
        jnp.int32(idx_emit), jnp.int32(min_sid), jnp.int32(em.n_rays_once),
        em.plane_vec, pack.accel, pack.tri_pack,
    )
    return args, pack


def test_pack_rows_match_host_build():
    """The chunked donated device build reproduces the host NumPy formulas
    bitwise (rows 0-16; mask rows and padding stay zero)."""
    meshes = _scene()
    ps = PreparedSolver(meshes)
    scene = ps.get_scene(use_accel=True)
    full = pack_scene(scene, len(meshes), slim=False)
    slim = pack_scene(scene, len(meshes), slim=True)
    assert slim.slim and not full.slim
    assert slim.v0 is None and slim.cross_e is None and slim.d0 is None
    assert slim.tri_pack.shape == (TRI_ROWS, full.n_tri_pad)

    got = np.asarray(slim.tri_pack)
    np.testing.assert_array_equal(got[0:3], np.asarray(full.cross_e).T)
    np.testing.assert_array_equal(got[3:6], np.asarray(full.e1).T)
    np.testing.assert_array_equal(got[6:9], np.asarray(full.e2).T)
    np.testing.assert_array_equal(got[9:12], np.asarray(full.w_u).T)
    np.testing.assert_array_equal(got[12:15], np.asarray(full.w_v).T)
    np.testing.assert_array_equal(got[15], np.asarray(full.d0))
    np.testing.assert_array_equal(
        got[16], (np.asarray(full.sid) * 2).astype(np.float32)
    )
    np.testing.assert_array_equal(got[17:], 0.0)
    # sid survives on device for mask/tile-activity math
    np.testing.assert_array_equal(np.asarray(slim.sid), np.asarray(full.sid))


def test_pack_chunked_build_stitches_exactly(monkeypatch):
    """Multi-chunk builds (full chunks + remainder) equal the one-shot."""
    from raystrack_tpu import prepared as prep_mod

    meshes = _scene()
    ps = PreparedSolver(meshes)
    scene = ps.get_scene(use_accel=True)
    one = np.asarray(pack_scene(scene, len(meshes), slim=True).tri_pack)
    monkeypatch.setattr(prep_mod, "_PACK_BUILD_CHUNK", 128)
    many = np.asarray(pack_scene(scene, len(meshes), slim=True).tri_pack)
    np.testing.assert_array_equal(one, many)


@pytest.mark.parametrize("use_accel", [False, True])
@pytest.mark.parametrize(
    "want_matrix,want_any,discrete",
    [(True, False, False), (True, True, True), (False, True, False)],
)
def test_trace_chunk_slim_bitwise(use_accel, want_matrix, want_any, discrete):
    """Slim dispatches equal the default baked path bitwise, with and
    without the distance gate, across all output combinations."""
    ps = PreparedSolver(_scene())
    full_args, pack = _chunk_args(ps, 0, use_accel=use_accel, slim=False)
    slim_args, spack = _chunk_args(ps, 0, use_accel=use_accel, slim=True)
    assert spack.tri_pack is not None and full_args[-1] is None
    kw = dict(ray_block=min(RAY_BLOCK, 256), tri_tile=pack.tri_tile,
              want_matrix=want_matrix, want_any=want_any, discrete=discrete,
              kernel="pallas", interpret=True)
    a = {k: np.asarray(v) for k, v in trace_chunk(*full_args, **kw).items()}
    b = {k: np.asarray(v) for k, v in trace_chunk(*slim_args, **kw).items()}
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_array_equal(a[key], b[key])
    if want_matrix:
        assert int(a["counts_f"].sum()) > 0  # the scene is actually hit


def test_trace_chunk_slim_streamed_bitwise(monkeypatch):
    """Slim + HBM-streamed sweep (the real huge-scene configuration)."""
    from raystrack_tpu import config

    monkeypatch.setattr(config, "PALLAS_MAX_TRIS", 256)
    ps = PreparedSolver(_scene())
    full_args, pack = _chunk_args(ps, 0, use_accel=True, slim=False)
    slim_args, _ = _chunk_args(ps, 0, use_accel=True, slim=True)
    kw = dict(ray_block=256, tri_tile=pack.tri_tile, want_matrix=True,
              want_any=True, discrete=False, kernel="pallas", interpret=True)
    a = {k: np.asarray(v) for k, v in trace_chunk(*full_args, **kw).items()}
    b = {k: np.asarray(v) for k, v in trace_chunk(*slim_args, **kw).items()}
    for key in a:
        np.testing.assert_array_equal(a[key], b[key])


def test_slim_requires_pallas():
    ps = PreparedSolver(_scene())
    slim_args, pack = _chunk_args(ps, 0, use_accel=True, slim=True)
    with pytest.raises(ValueError, match="pallas"):
        trace_chunk(*slim_args, ray_block=256, tri_tile=pack.tri_tile,
                    want_matrix=True, want_any=False, discrete=False,
                    kernel="xla")


def _force_slim(monkeypatch):
    from raystrack_tpu import config

    monkeypatch.setattr(config, "SLIM_PACK_MIN_TRIS", 1)


def test_matrix_solve_slim_matches_default(monkeypatch):
    meshes = _scene()
    mp = MatrixParams(samples=4, rays=16, seed=9, max_iters=4, min_iters=2,
                      bvh="builtin")
    want = view_factor_matrix(meshes, mp, prepared=PreparedSolver(meshes))
    _force_slim(monkeypatch)
    ps = PreparedSolver(meshes)
    got = view_factor_matrix(meshes, mp, prepared=ps)
    assert ps.get_scene_pack(use_accel=True).slim  # slim actually engaged
    assert got == want


def test_sky_solve_slim_matches_default(monkeypatch):
    meshes = _scene()
    sp = SkyParams(samples=4, rays=16, seed=9, max_iters=4, min_iters=2,
                   discrete=True, bvh="builtin")
    want = view_factor_to_tregenza_sky(meshes, sp,
                                       prepared=PreparedSolver(meshes))
    _force_slim(monkeypatch)
    got = view_factor_to_tregenza_sky(meshes, sp,
                                      prepared=PreparedSolver(meshes))
    assert got == want


def test_matrix_solve_slim_sharded_matches_default(monkeypatch):
    """Slim + ray-mesh sharding: the replicated pack build and the sharded
    pack-resident sweep reproduce the single-device default bitwise on the
    8-virtual-device CPU mesh."""
    from raystrack_tpu.parallel.sharding import ray_mesh

    meshes = _scene()
    mp = MatrixParams(samples=4, rays=16, seed=9, max_iters=4, min_iters=2,
                      bvh="builtin")
    want = view_factor_matrix(meshes, mp, prepared=PreparedSolver(meshes))
    _force_slim(monkeypatch)
    ps = PreparedSolver(meshes)
    got = view_factor_matrix(meshes, mp, prepared=ps, mesh=ray_mesh())
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    pack_dev = NamedSharding(ray_mesh(), P())
    pack = ps.get_scene_pack(use_accel=True, device=pack_dev)
    assert pack.slim and pack.tri_pack.sharding.is_fully_replicated
    assert len(pack.tri_pack.sharding.device_set) == len(jax.devices())
    assert got == want


def test_scene_pack_default_device_key_collides(monkeypatch):
    """device=None and the explicitly-resolved default device must hit the
    SAME cache entry: a solver passing its resolved placement after a caller
    built the pack with device=None would otherwise duplicate the resident
    pack (~10 GiB at 1e8 tris — the OOM that killed the first 100M-demo
    solve phase)."""
    import jax

    _force_slim(monkeypatch)
    ps = PreparedSolver(_scene())
    a = ps.get_scene_pack(use_accel=True)
    b = ps.get_scene_pack(use_accel=True, device=jax.local_devices()[0])
    assert a is b
    assert len(ps._scene_pack_cache) == 1


def test_workflow_solve_slim_matches_default(monkeypatch):
    meshes = _scene()
    mp = MatrixParams(samples=4, rays=16, seed=9, max_iters=4, min_iters=2,
                      bvh="builtin")
    sp = SkyParams(samples=4, rays=16, seed=9, max_iters=4, min_iters=2,
                   bvh="builtin")
    want = view_factor_matrix_and_sky(
        meshes, matrix_params=mp, sky_params=sp,
        prepared=PreparedSolver(meshes),
    )
    _force_slim(monkeypatch)
    got = view_factor_matrix_and_sky(
        meshes, matrix_params=mp, sky_params=sp,
        prepared=PreparedSolver(meshes),
    )
    assert got == want
