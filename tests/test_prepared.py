"""Scene/emitter preparation and device-pack invariants."""
import numpy as np

from raystrack_tpu.prepared import (
    PreparedSolver,
    pack_emitter,
    pack_scene,
    prepare_emitters,
    prepare_scene,
)


def _square(name, size, z, normal=1):
    V = np.array(
        [[0, 0, z], [size, 0, z], [size, size, z], [0, size, z]], dtype=np.float32
    )
    if normal >= 0:
        F = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    else:
        F = np.array([[0, 2, 1], [0, 3, 2]], dtype=np.int32)
    return name, V, F


def test_scene_soup_and_sids():
    meshes = [_square("a", 1.0, 0.0), _square("b", 2.0, 1.0)]
    scene = prepare_scene(meshes)
    assert scene.v0.shape == (4, 3)
    np.testing.assert_array_equal(scene.sid, [0, 0, 1, 1])
    np.testing.assert_allclose(np.linalg.norm(scene.normals, axis=1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(scene.normals[:, 2], 1.0, atol=1e-6)


def test_emitter_frames_orthonormal_and_cdf():
    rng = np.random.default_rng(0)
    V = rng.normal(size=(30, 3)).astype(np.float32)
    F = rng.integers(0, 30, size=(40, 3)).astype(np.int32)
    # drop degenerate faces
    F = F[(F[:, 0] != F[:, 1]) & (F[:, 1] != F[:, 2]) & (F[:, 0] != F[:, 2])]
    (em,) = prepare_emitters([("m", V, F)], samples=8, rays=16, flip_faces=False)
    # orthonormal frame
    np.testing.assert_allclose(np.linalg.norm(em.tri_u, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(em.tri_v, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose((em.tri_u * em.tri_n).sum(1), 0.0, atol=1e-5)
    np.testing.assert_allclose((em.tri_u * em.tri_v).sum(1), 0.0, atol=1e-5)
    # area CDF
    assert em.cdf[-1] == np.float32(1.0)
    assert np.all(np.diff(em.cdf) >= 0)
    # halton tables sized g*g*rays
    assert em.halton_tri.shape == (em.g * em.g * 16,)


def test_emitter_plane_detection():
    (flat,) = prepare_emitters([_square("flat", 1.0, 0.5)], samples=8, rays=4, flip_faces=False)
    assert flat.plane_is_planar
    np.testing.assert_allclose(flat.plane_normal, [0, 0, 1], atol=1e-6)

    # bent emitter: two triangles with different normals
    V = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 1], [0, 1, 2]], dtype=np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    (bent,) = prepare_emitters([("bent", V, F)], samples=8, rays=4, flip_faces=False)
    assert not bent.plane_is_planar


def test_flip_faces_reverses_emission_normal():
    (fwd,) = prepare_emitters([_square("s", 1.0, 0.0)], samples=8, rays=4, flip_faces=False)
    (rev,) = prepare_emitters([_square("s", 1.0, 0.0)], samples=8, rays=4, flip_faces=True)
    np.testing.assert_allclose(fwd.tri_n, -rev.tri_n, atol=1e-6)


def test_scene_pack_padding():
    meshes = [_square("a", 1.0, 0.0), _square("b", 1.0, 1.0)]
    scene = prepare_scene(meshes)
    pack = pack_scene(scene, len(meshes))
    assert pack.n_tri == 4
    assert pack.n_tri_pad % 128 == 0
    assert pack.n_tri_pad % pack.tri_tile == 0
    sid = np.asarray(pack.sid)
    # padded triangles point at the sentinel surface slot
    np.testing.assert_array_equal(sid[4:], len(meshes))
    # padded triangles have zero cross product => det == 0 always
    np.testing.assert_array_equal(np.asarray(pack.cross_e)[4:], 0.0)
    # derived operands match definitions
    np.testing.assert_allclose(
        np.asarray(pack.cross_e)[:4], np.cross(scene.e1, scene.e2), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pack.d0)[:4],
        np.einsum("ij,ij->i", scene.v0, np.cross(scene.e1, scene.e2)),
        rtol=1e-5,
    )


def test_emitter_pack_expansion():
    (em,) = prepare_emitters([_square("s", 1.0, 0.0)], samples=8, rays=8, flip_faces=False)
    pack = pack_emitter(em, 8, align=2048)
    assert pack.n_rays_once == em.n_cells * 8
    assert pack.n_rays_pad % 2048 == 0
    u_cell = np.asarray(pack.u_cell)
    # rays of one cell share the jitter value
    np.testing.assert_array_equal(u_cell[:8], em.u_grid[0])
    np.testing.assert_array_equal(u_cell[8:16], em.u_grid[1])
    # padding is zero
    np.testing.assert_array_equal(u_cell[pack.n_rays_once:], 0.0)


def test_prepared_solver_caching():
    meshes = [_square("a", 1.0, 0.0), _square("b", 1.0, 1.0)]
    ps = PreparedSolver(meshes)
    assert ps.total_faces == 4
    assert ps.get_scene() is ps.get_scene()
    e1 = ps.get_emitters(samples=8, rays=4, flip_faces=False)
    assert ps.get_emitters(samples=8, rays=4, flip_faces=False) is e1
    assert ps.get_emitters(samples=8, rays=8, flip_faces=False) is not e1
    p1 = ps.get_scene_pack()
    assert ps.get_scene_pack() is p1
    centers, extents = ps.get_mesh_bounds()
    np.testing.assert_allclose(centers[0], [0.5, 0.5, 0.0])
    np.testing.assert_allclose(extents[1], [0.5, 0.5, 0.0])


def test_ray_bucketing_series():
    from raystrack_tpu.prepared import _pad_rays

    # exact block multiples in the {2^i, 3*2^(i-1)} series stay put
    assert _pad_rays(2048, 2048) == 2048
    assert _pad_rays(8192, 2048) == 8192
    assert _pad_rays(6 * 2048, 2048) == 6 * 2048
    # everything else rounds up within 33% (the bound applies to the block
    # count; tiny emitters below a few blocks can see up to 2x, which is
    # negligible in absolute terms)
    for n in (10000, 36864, 165888, 295936, 999999):
        pad = _pad_rays(n, 2048)
        blocks_in = -(-n // 2048)
        assert pad % 2048 == 0
        assert pad >= n
        assert (pad // 2048) / blocks_in <= 1.5 + 1e-9
    # distinct sizes collapse onto shared classes
    assert _pad_rays(295936, 2048) == _pad_rays(346112, 2048)
