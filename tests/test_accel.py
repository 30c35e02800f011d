"""Acceleration layer: Morton ordering, plane culling, tile skipping.

Culling must be *exact*: enabling the accelerated path may only skip
triangles that are provably unhittable, so counts match the brute-force
path bitwise.
"""
import numpy as np
import jax.numpy as jnp

from raystrack_tpu import MatrixParams, view_factor_matrix
from raystrack_tpu.config import RAY_BLOCK
from raystrack_tpu.ops.trace import compute_masks, tile_activity
from raystrack_tpu.prepared import PreparedSolver, morton_order, prepare_scene, pack_scene


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


def test_morton_order_is_permutation_and_clusters():
    rng = np.random.default_rng(0)
    v0 = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    e1 = rng.normal(scale=0.1, size=(500, 3)).astype(np.float32)
    e2 = rng.normal(scale=0.1, size=(500, 3)).astype(np.float32)
    perm = morton_order(v0, e1, e2)
    assert sorted(perm.tolist()) == list(range(500))
    # spatial locality: average centroid distance between Morton neighbors is
    # far below the distance between random pairs
    c = (v0 + (e1 + e2) / 3.0)[perm]
    neighbor = np.linalg.norm(np.diff(c, axis=0), axis=1).mean()
    shuffled = c[rng.permutation(500)]
    random_pair = np.linalg.norm(np.diff(shuffled, axis=0), axis=1).mean()
    assert neighbor < 0.5 * random_pair


def test_plane_culling_masks_exactly_unhittable():
    # emitter plane z=0 facing up; one plate above, one below, one straddling
    meshes = [
        _square("emitter", 1.0, 0.0, normal=+1),
        _square("above", 1.0, 1.0, normal=-1),
        _square("below", 1.0, -1.0, normal=-1),
    ]
    scene = prepare_scene(meshes)
    pack = pack_scene(scene, len(meshes))
    scene_t = (pack.v0, pack.e1, pack.e2, pack.cross_e,
               pack.w_u, pack.w_v, pack.d0, pack.sid)
    ext = jnp.asarray(np.array([0, 1, 1, 0], np.int32))
    plane_vec = jnp.asarray(
        np.array([0, 0, 0, 0, 0, 1, 1e-6, 1.0], np.float32)
    )
    m_any, _ = compute_masks(scene_t, ext, jnp.int32(0), jnp.int32(0), plane_vec)
    m = np.asarray(m_any)
    # 'above' triangles eligible, 'below' triangles culled, emitter excluded
    sid = np.asarray(pack.sid)
    assert np.all(m[sid == 1])
    assert not np.any(m[sid == 2])
    assert not np.any(m[sid == 0])
    # non-planar emitters never cull
    plane_off = plane_vec.at[7].set(0.0)
    m_any2, _ = compute_masks(scene_t, ext, jnp.int32(0), jnp.int32(0), plane_off)
    assert np.all(np.asarray(m_any2)[sid == 2])


def test_tile_activity():
    mask = jnp.asarray(np.array([0] * 128 + [1] + [0] * 127, dtype=bool))
    act = np.asarray(tile_activity(mask, 128))
    np.testing.assert_array_equal(act, [0, 1])


def test_accel_solve_matches_brute_force():
    """bvh='builtin' (Morton + tile skip) gives identical results to 'off'."""
    rng = np.random.default_rng(1)
    # emitter + a shell of plates above and below its plane
    meshes = [_square("emitter", 2.0, 0.0, normal=+1)]
    for i in range(6):
        z = float(rng.uniform(0.5, 3.0))
        meshes.append(_square(f"up{i}", 2.0, z, normal=-1,
                              center=tuple(rng.uniform(-1, 1, 2))))
    for i in range(4):
        z = float(rng.uniform(-3.0, -0.5))
        meshes.append(_square(f"down{i}", 2.0, z, normal=+1,
                              center=tuple(rng.uniform(-1, 1, 2))))

    params_off = MatrixParams(samples=8, rays=64, seed=9, device="cpu",
                              bvh="off", max_iters=5, min_iters=2, tol=1e-3)
    params_on = MatrixParams(**{**params_off.as_dict(), "bvh": "builtin"})
    vf_off = view_factor_matrix(meshes, params=params_off)
    vf_on = view_factor_matrix(meshes, params=params_on)
    # identical integer hit counts -> identical floats
    assert vf_off == vf_on
