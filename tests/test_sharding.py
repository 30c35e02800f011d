"""Multi-device ray sharding: bitwise equality with the single-device solve."""
import numpy as np
import jax
import jax.numpy as jnp

from raystrack_tpu import MatrixParams, SkyParams, view_factor_matrix
from raystrack_tpu.api import view_factor_outside_workflow
from raystrack_tpu.config import RAY_BLOCK
from raystrack_tpu.ops.trace import trace_chunk
from raystrack_tpu.parallel.sharding import ray_mesh, trace_chunk_sharded
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
    F = (
        np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
        if normal >= 0
        else np.array([[0, 2, 1], [0, 3, 2]], dtype=np.int32)
    )
    return name, V, F


MESHES = [
    _square("ground", 2.0, 0.0, normal=+1),
    _square("mid", 1.5, 0.6, normal=-1, center=(0.4, 0.1)),
    _square("top", 3.0, 1.2, normal=-1),
]


def _chunk_args(mesh=None):
    n_dev = 1 if mesh is None else len(jax.devices())
    ps = PreparedSolver(MESHES)
    scene = ps.get_scene_pack()
    em = ps.get_emitter_pack(
        0, samples=8, rays=64, flip_faces=False, align=RAY_BLOCK * n_dev
    )
    emitter = ps.get_emitter(0, samples=8, rays=64, flip_faces=False)
    centers, extents = ps.get_mesh_bounds()
    surf_active = _build_emitter_surface_mask(0, emitter, centers, extents)
    ext = np.zeros(len(MESHES) + 1, dtype=np.int32)
    ext[:-1] = surf_active
    emit_sid, min_sid = _matrix_skip(0, False)
    cp = _cp_rows(9, 0, 0, 2)
    return (
        (scene.v0, scene.e1, scene.e2, scene.cross_e, scene.w_u, scene.w_v, scene.d0, scene.sid),
        (em.u_cell, em.v_cell, em.h_tri, em.h_u, em.h_v, em.h_r1, em.h_r2),
        (em.cdf, em.tri_a, em.tri_e1, em.tri_e2, em.tri_u, em.tri_v, em.tri_n, em.tri_eps),
        jnp.asarray(cp),
        jnp.asarray(ext),
        jnp.int32(emit_sid),
        jnp.int32(min_sid),
        jnp.int32(em.n_rays_once),
    ), dict(ray_block=RAY_BLOCK, tri_tile=scene.tri_tile, want_matrix=True,
            want_any=True, discrete=False)


def test_host_platform_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_chunk_equals_single_device():
    mesh = ray_mesh()
    args, kwargs = _chunk_args(mesh)
    sharded = {k: np.asarray(v) for k, v in trace_chunk_sharded(mesh, *args, **kwargs).items()}
    args1, kwargs1 = _chunk_args(None)
    single = {k: np.asarray(v) for k, v in trace_chunk(*args1, **kwargs1).items()}
    # ray padding differs (x8 alignment) but padded rays are masked out, so
    # integer counts must agree exactly
    for key in single:
        np.testing.assert_array_equal(sharded[key], single[key])


def test_sharded_matrix_solve_equals_single():
    params = MatrixParams(
        samples=8, rays=64, seed=4, device="cpu", bvh="off",
        max_iters=6, min_iters=3, tol=1e-3, reciprocity=True,
    )
    vf_single = view_factor_matrix(MESHES, params=params)
    vf_sharded = view_factor_matrix(MESHES, params=params, mesh=ray_mesh())
    assert vf_single == vf_sharded


def test_sharded_sky_solve_equals_single():
    from raystrack_tpu import view_factor_to_tregenza_sky

    for discrete in (False, True):
        params = SkyParams(
            samples=8, rays=64, seed=4, device="cpu", bvh="off",
            max_iters=5, min_iters=2, tol=1e-3, discrete=discrete,
        )
        single = view_factor_to_tregenza_sky(MESHES, params=params)
        sharded = view_factor_to_tregenza_sky(
            MESHES, params=params, mesh=ray_mesh()
        )
        assert single == sharded


def test_sharded_outside_workflow_equals_single():
    mp = MatrixParams(
        samples=8, rays=64, seed=4, device="cpu", bvh="off",
        max_iters=5, min_iters=2, tol=5e-3,
    )
    sp = SkyParams(
        samples=8, rays=64, seed=4, device="cpu", bvh="off",
        max_iters=5, min_iters=2, tol=5e-3,
    )
    base = view_factor_outside_workflow(MESHES, matrix_params=mp, sky_params=sp)
    scene, sky, rest = view_factor_outside_workflow(
        MESHES, matrix_params=mp, sky_params=sp, mesh=ray_mesh()
    )
    # integer hit counts psum over the mesh: sharded == single bitwise
    assert (scene, sky, rest) == base
    for name, _, _ in MESHES:
        total = sum(scene.get(name, {}).values()) + sum(sky.get(name, {}).values()) + rest[name]["Rest"]
        assert abs(total - 1.0) < 1e-9


def test_sharded_scheduled_matrix_equals_single(monkeypatch):
    """Scheduled driver under a device mesh: one dispatch per convergence
    round, schedule blocks split over the mesh axis — must reproduce the
    single-device (grouped/pipelined) result bitwise, both sweep kernels."""
    from raystrack_tpu import config

    params = MatrixParams(
        samples=8, rays=64, seed=4, device="cpu", bvh="off",
        max_iters=6, min_iters=3, tol=1e-3, reciprocity=True,
    )
    base = view_factor_matrix(MESHES, params=params)
    monkeypatch.setattr(config, "SCHEDULER", "scheduled")
    for kern in ("xla", "pallas"):
        monkeypatch.setattr(config, "KERNEL", kern)
        sharded = view_factor_matrix(MESHES, params=params, mesh=ray_mesh())
        assert sharded == base, f"scheduled+mesh diverged (kernel={kern})"


def test_sharded_scheduled_sky_and_workflow_equal_single(monkeypatch):
    from raystrack_tpu import config, view_factor_to_tregenza_sky

    sp = SkyParams(
        samples=8, rays=64, seed=4, device="cpu", bvh="off",
        max_iters=5, min_iters=2, tol=1e-3, discrete=True,
    )
    sky_base = view_factor_to_tregenza_sky(MESHES, params=sp)
    mp = MatrixParams(
        samples=8, rays=64, seed=4, device="cpu", bvh="off",
        max_iters=5, min_iters=2, tol=5e-3,
    )
    sp2 = SkyParams(
        samples=8, rays=64, seed=4, device="cpu", bvh="off",
        max_iters=5, min_iters=2, tol=5e-3,
    )
    wf_base = view_factor_outside_workflow(MESHES, matrix_params=mp, sky_params=sp2)
    monkeypatch.setattr(config, "SCHEDULER", "scheduled")
    assert view_factor_to_tregenza_sky(
        MESHES, params=sp, mesh=ray_mesh()
    ) == sky_base
    assert view_factor_outside_workflow(
        MESHES, matrix_params=mp, sky_params=sp2, mesh=ray_mesh()
    ) == wf_base
