"""Scheduled Pallas sweep: one dispatch per convergence round spanning many
emitters, with the fused AABB-gated kernel selecting each block's emitter
masks via scalar prefetch.

Correctness bar: ops.trace.scheduled_trace_pallas must be bitwise-equal to
the XLA scheduled_trace on the same schedule (resident, HBM-streamed, and
union-tile-table variants), and the end-to-end solvers must reproduce the
default drivers exactly when SCHEDULER=scheduled + KERNEL=pallas.
"""
import numpy as np
import jax.numpy as jnp

from raystrack_tpu import (
    MatrixParams,
    SkyParams,
    view_factor_matrix,
    view_factor_matrix_and_sky,
    view_factor_to_tregenza_sky,
)
from raystrack_tpu.config import RAY_BLOCK
from raystrack_tpu.ops.trace import scheduled_trace, scheduled_trace_pallas
from raystrack_tpu.prepared import PreparedSolver
from raystrack_tpu.solver import (
    _build_emitter_surface_mask,
    _cp_rows,
    _matrix_skip,
    _pow2_at_least,
)


def _plate(name, z, h=4.0, flip=False):
    V = np.array([[-h, -h, z], [h, -h, z], [h, h, z], [-h, h, z]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    if flip:
        F = F[:, [0, 2, 1]].copy()
    return (name, V, F)


def _cloud_scene(n_tri, seed=0):
    """Two facing plates sandwiching a dense random-triangle cloud."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform([-4, -4, 0.5], [4, 4, 6], size=(n_tri, 3))
    spans = rng.normal(scale=0.5, size=(n_tri, 2, 3))
    Vc = np.concatenate(
        [centers, centers + spans[:, 0], centers + spans[:, 1]], axis=1
    ).reshape(-1, 3).astype(np.float32)
    Fc = np.arange(n_tri * 3, dtype=np.int32).reshape(-1, 3)
    return [_plate("ground", 0.0), _plate("lid", 7.0, flip=True),
            ("cloud", Vc, Fc)]


def _build_schedule(ps, emitter_ids, *, samples, rays, iters, seed,
                    reciprocity, use_accel=True):
    """Hand-build a multi-emitter block schedule + per-round emitter stacks,
    mirroring solver._drive_scheduled's construction."""
    scene = ps.get_scene_pack(use_accel=use_accel)
    scene_t = (scene.v0, scene.e1, scene.e2, scene.cross_e,
               scene.w_u, scene.w_v, scene.d0, scene.sid)
    tables_flat, geom_stacked, offsets, n_pad = ps.get_flat_tables(
        samples=samples, rays=rays, flip_faces=False, align=RAY_BLOCK
    )
    emitters = ps.get_emitters(samples=samples, rays=rays, flip_faces=False)
    bc, be = ps.get_mesh_bounds()
    n_surf = len(ps.meshes)

    rows, cps = [], []
    surf_b, emit_b, min_b, once_b, plane_b = [], [], [], [], []
    for local_e, e in enumerate(emitter_ids):
        sa = _build_emitter_surface_mask(e, emitters[e], bc, be)
        ext = np.zeros(n_surf + 1, np.int32)
        ext[:-1] = sa
        es, ms = _matrix_skip(e, reciprocity)
        surf_b.append(ext)
        emit_b.append(es)
        min_b.append(ms)
        once_b.append(emitters[e].n_cells * rays)
        pe = emitters[e]
        plane_b.append(np.concatenate([
            pe.plane_origin.astype(np.float32),
            pe.plane_normal.astype(np.float32),
            np.float32([pe.plane_tol, 1.0 if pe.plane_is_planar else 0.0]),
        ]))
        bpi = int(n_pad[e]) // RAY_BLOCK
        for c in range(iters):
            cp_idx = len(cps)
            cps.append(_cp_rows(seed, e, c, 1)[0])
            for b in range(bpi):
                rows.append(
                    [local_e, cp_idx, int(offsets[e]) + b * RAY_BLOCK,
                     b * RAY_BLOCK]
                )

    nb = _pow2_at_least(len(rows))
    schedule = np.zeros((nb, 4), np.int32)
    schedule[: len(rows)] = rows
    schedule[len(rows):] = schedule[0]
    n_cp = _pow2_at_least(len(cps), lo=8)
    cp = np.zeros((n_cp, 7), np.float32)
    cp[: len(cps)] = np.stack(cps)
    n_e = _pow2_at_least(len(emitter_ids), lo=1)
    pad_n = n_e - len(emitter_ids)
    stacks = (
        np.stack(surf_b + [surf_b[0]] * pad_n),
        np.asarray(emit_b + [emit_b[0]] * pad_n, np.int32),
        np.asarray(min_b + [min_b[0]] * pad_n, np.int32),
        np.asarray(once_b + [once_b[0]] * pad_n, np.int32),
        np.stack(plane_b + [plane_b[0]] * pad_n).astype(np.float32),
    )
    return scene, scene_t, tables_flat, geom_stacked, cp, stacks, schedule


def _both(ps, emitter_ids, *, samples=4, rays=64, iters=2, seed=7,
          reciprocity=True, discrete=True, tri_tile=512):
    scene, scene_t, tables_flat, geom_stacked, cp, stacks, schedule = (
        _build_schedule(ps, emitter_ids, samples=samples, rays=rays,
                        iters=iters, seed=seed, reciprocity=reciprocity)
    )
    args = (
        scene_t, tables_flat, geom_stacked, jnp.asarray(cp),
        *(jnp.asarray(s) for s in stacks), jnp.asarray(schedule), scene.accel,
    )
    common = dict(want_matrix=True, want_any=True, discrete=discrete)
    out_x = scheduled_trace(
        *args, ray_block=RAY_BLOCK, tri_tile=scene.tri_tile, **common
    )
    out_p = scheduled_trace_pallas(
        *args, sched_block=RAY_BLOCK, ray_block=256, tri_tile=tri_tile,
        interpret=True, **common
    )
    return out_x, out_p


def _assert_equal(out_x, out_p):
    assert set(out_x) == set(out_p)
    for k in out_x:
        np.testing.assert_array_equal(
            np.asarray(out_x[k]), np.asarray(out_p[k]), err_msg=k
        )
        assert int(np.asarray(out_x[k]).sum()) > 0, f"{k}: degenerate test"


def test_scheduled_pallas_bitwise_resident():
    ps = PreparedSolver(_cloud_scene(700))
    _assert_equal(*_both(ps, [0, 1]))


def test_scheduled_pallas_bitwise_streamed(monkeypatch):
    """Past PALLAS_MAX_TRIS the scheduled sweep streams the pack AND the
    per-emitter mask table from HBM; counts must not change."""
    from raystrack_tpu import config

    monkeypatch.setattr(config, "PALLAS_MAX_TRIS", 256)
    ps = PreparedSolver(_cloud_scene(650, seed=3))
    _assert_equal(*_both(ps, [0, 1], seed=11))


def test_scheduled_pallas_bitwise_union_tiles(monkeypatch):
    """When the per-emitter tile table exceeds the SMEM budget it collapses
    to the union over emitters — conservative, bitwise-identical results."""
    from raystrack_tpu.ops import trace_pallas

    monkeypatch.setattr(trace_pallas, "SCHED_TILES_SMEM_BUDGET", 1)
    ps = PreparedSolver(_cloud_scene(620, seed=5))
    _assert_equal(*_both(ps, [0, 1], seed=13, tri_tile=256))


def _force_scheduled_pallas(monkeypatch):
    from raystrack_tpu import config

    monkeypatch.setattr(config, "SCHEDULER", "scheduled")
    monkeypatch.setattr(config, "KERNEL", "pallas")


def test_matrix_scheduled_pallas_matches_default(monkeypatch):
    meshes = _cloud_scene(560, seed=8)
    params = MatrixParams(samples=2, rays=32, seed=4, device="cpu",
                          bvh="builtin", max_iters=4, min_iters=2, tol=1e-3,
                          reciprocity=True)
    base = view_factor_matrix(meshes, params=params)
    _force_scheduled_pallas(monkeypatch)
    assert view_factor_matrix(meshes, params=params) == base


def test_sky_scheduled_pallas_matches_default(monkeypatch):
    meshes = _cloud_scene(540, seed=9)
    for discrete in (False, True):
        params = SkyParams(samples=2, rays=32, seed=5, device="cpu",
                           bvh="builtin", max_iters=4, min_iters=2, tol=1e-3,
                           discrete=discrete)
        base = view_factor_to_tregenza_sky(meshes, params=params)
        _force_scheduled_pallas(monkeypatch)
        scheduled = view_factor_to_tregenza_sky(meshes, params=params)
        monkeypatch.undo()
        assert scheduled == base


def test_combined_scheduled_pallas_matches_default(monkeypatch):
    meshes = _cloud_scene(520, seed=10)
    mp = MatrixParams(samples=2, rays=32, seed=6, device="cpu",
                      bvh="builtin", max_iters=5, min_iters=2, tol=1e-3,
                      reciprocity=True)
    sp = SkyParams(samples=2, rays=32, seed=6, device="cpu", bvh="builtin",
                   max_iters=4, min_iters=2, tol=1e-3)
    base = view_factor_matrix_and_sky(meshes, matrix_params=mp, sky_params=sp)
    _force_scheduled_pallas(monkeypatch)
    assert view_factor_matrix_and_sky(
        meshes, matrix_params=mp, sky_params=sp
    ) == base


def test_matrix_scheduled_pallas_accel_exact(monkeypatch):
    """Gated scheduled Pallas solve == ungated: pruning may only skip
    provably irrelevant tiles, never change a count."""
    meshes = _cloud_scene(580, seed=12)
    _force_scheduled_pallas(monkeypatch)
    params_on = MatrixParams(samples=2, rays=32, seed=4, device="cpu",
                             bvh="builtin", max_iters=3, min_iters=2, tol=1e-3)
    params_off = MatrixParams(**{**params_on.as_dict(), "bvh": "off"})
    assert view_factor_matrix(meshes, params=params_on) == view_factor_matrix(
        meshes, params=params_off
    )


def test_flat_table_budget_declines_scheduler(monkeypatch):
    """Past SCHED_MAX_FLAT_RAYS the scheduled driver must decline (the flat
    ray tables would not fit) and the per-emitter drivers produce the same
    result."""
    from raystrack_tpu import config

    meshes = _cloud_scene(530, seed=14)
    params = MatrixParams(samples=2, rays=32, seed=4, device="cpu",
                          bvh="builtin", max_iters=3, min_iters=2, tol=1e-3)
    base = view_factor_matrix(meshes, params=params)
    monkeypatch.setattr(config, "SCHEDULER", "scheduled")
    monkeypatch.setattr(config, "SCHED_MAX_FLAT_RAYS", 1)
    assert view_factor_matrix(meshes, params=params) == base


def test_gate_cap_fallback_ungated(monkeypatch):
    """Past GATE_MAX_TILES the Pallas sweep runs ungated; results must not
    change."""
    from raystrack_tpu import config

    meshes = _cloud_scene(560, seed=8)  # same scene as the scheduled test
    params = MatrixParams(samples=2, rays=32, seed=4, device="cpu",
                          bvh="builtin", max_iters=4, min_iters=2, tol=1e-3,
                          reciprocity=True)
    base = view_factor_matrix(meshes, params=params)
    monkeypatch.setattr(config, "KERNEL", "pallas")
    monkeypatch.setattr(config, "GATE_MAX_TILES", 1)
    assert view_factor_matrix(meshes, params=params) == base


def test_scheduled_raygen_dense_equals_gather(monkeypatch):
    """The dense small-F raygen (compare-sum CDF pick + one-hot matmul
    gather at Precision.HIGHEST) must be bitwise-identical to the scalar
    gather path it replaces — forced by flipping RAYGEN_ONEHOT_MAX_FACES
    around the scene's face count on two distinct scene shapes (distinct
    shapes -> distinct jit cache entries, so the flag is honored)."""
    from raystrack_tpu import config

    ps = PreparedSolver(_cloud_scene(710, seed=21))
    monkeypatch.setattr(config, "RAYGEN_ONEHOT_MAX_FACES", 4096)
    dense = _both(ps, [0, 1], seed=5)[1]
    ps2 = PreparedSolver(_cloud_scene(710, seed=21))
    monkeypatch.setattr(config, "RAYGEN_ONEHOT_MAX_FACES", 0)
    import jax
    jax.clear_caches()  # same shapes on purpose: force a re-trace
    gather = _both(ps2, [0, 1], seed=5)[1]
    _assert_equal(dense, gather)


def test_scheduled_two_level_gate_bitwise(monkeypatch):
    """Scheduled kernels under a tiny gate-box budget (grouped boxes +
    phantom loop padding) must match the ungated XLA scheduled trace."""
    from raystrack_tpu import config

    monkeypatch.setattr(config, "GATE_MAX_TILES", 2)
    ps = PreparedSolver(_cloud_scene(730, seed=22))
    _assert_equal(*_both(ps, [0, 1], seed=9, tri_tile=256))


def test_oversized_emitter_falls_through_to_pipelined(monkeypatch):
    """An emitter whose single iteration exceeds the Pallas round budget
    must be excluded from scheduled rounds (it would materialize a round
    several times TARGET_CHUNK_RAYS — a compile-time HBM OOM at city
    scale) and solved by the per-emitter drivers instead, with identical
    results."""
    from raystrack_tpu import config
    from raystrack_tpu.config import RAY_BLOCK

    # big plate: large area -> many grid cells -> rays/iter far above the
    # shrunken budget; small plates fit comfortably. Big goes LAST so its
    # flat-table offset range starts above 0 (schedule padding rows carry
    # offset 0 and must not trip the spy below).
    meshes = [
        _plate("top_a", 4.0, h=1.0, flip=True),
        _plate("top_b", 8.0, h=1.0, flip=True),
        _plate("big", 0.0, h=16.0),
    ]
    params = MatrixParams(samples=2, rays=8, seed=3, device="cpu",
                          bvh="off", max_iters=3, min_iters=2, tol=1e-3,
                          reciprocity=False)
    base = view_factor_matrix(meshes, params=params)
    _force_scheduled_pallas(monkeypatch)
    # budget: 2-block rounds (512 rays) — "big" needs more per iteration
    monkeypatch.setattr(config, "SCHED_MIN_BLOCKS", 2)
    monkeypatch.setattr(config, "TARGET_CHUNK_RAYS", 2 * RAY_BLOCK)
    from raystrack_tpu.prepared import PreparedSolver

    ps = PreparedSolver(meshes)
    emitters = ps.get_emitters(samples=2, rays=8, flip_faces=False)
    assert emitters[2].n_cells * 8 > 2 * RAY_BLOCK  # truly oversized
    assert emitters[0].n_cells * 8 <= 2 * RAY_BLOCK  # others fit

    # spy: no scheduled round may reference the oversized emitter's flat
    # table offsets — it must be excluded upfront, not merely deferred
    _, _, offsets, n_pad = ps.get_flat_tables(
        samples=2, rays=8, flip_faces=False, align=RAY_BLOCK
    )
    lo, hi = int(offsets[2]), int(offsets[2]) + int(n_pad[2])
    assert lo > 0
    from raystrack_tpu.ops import trace as T

    orig = T.scheduled_trace_pallas
    calls = []

    def spy(scene, tables_flat, geom_stacked, cp, surf, emit, mins, once,
            plane, schedule, *a, **k):
        offs = np.asarray(schedule)[:, 2]
        assert not np.any((offs >= lo) & (offs < hi)), (
            "oversized emitter appeared in a scheduled Pallas round"
        )
        calls.append(schedule.shape[0])
        return orig(scene, tables_flat, geom_stacked, cp, surf, emit, mins,
                    once, plane, schedule, *a, **k)

    monkeypatch.setattr(T, "scheduled_trace_pallas", spy)
    import raystrack_tpu.solver as S

    monkeypatch.setattr(S, "scheduled_trace_pallas", spy, raising=False)
    assert view_factor_matrix(meshes, params=params) == base
    assert calls, "scheduled driver did not run for the small emitters"


def test_oversized_emitter_rescoped_under_mesh(monkeypatch):
    """Under a device mesh, emitters dropped from scheduled Pallas rounds
    must have their kernel re-resolved for the pipelined regime exactly like
    the non-mesh path (solver._drive_scheduled used to re-resolve only when
    mesh is None), and the sharded solve must still match the plain one."""
    import jax

    import raystrack_tpu.solver as S
    from raystrack_tpu import config
    from raystrack_tpu.config import RAY_BLOCK
    from raystrack_tpu.parallel.sharding import ray_mesh

    meshes = [
        _plate("top_a", 4.0, h=1.0, flip=True),
        _plate("top_b", 8.0, h=1.0, flip=True),
        _plate("big", 0.0, h=16.0),
    ]
    params = MatrixParams(samples=2, rays=8, seed=3, device="cpu",
                          bvh="off", max_iters=3, min_iters=2, tol=1e-3,
                          reciprocity=False)
    base = view_factor_matrix(meshes, params=params)
    _force_scheduled_pallas(monkeypatch)
    # 2-device mesh: align = 2*RAY_BLOCK, so the small plates pad to exactly
    # the 2-block round budget and the big plate (4 blocks) is over-budget
    monkeypatch.setattr(config, "SCHED_MIN_BLOCKS", 2)
    monkeypatch.setattr(config, "TARGET_CHUNK_RAYS", 2 * RAY_BLOCK)
    mesh = ray_mesh(jax.devices("cpu")[:2])

    calls = []
    orig = S._resolve_kernel

    def spy(device, m, n_tri=0, *, scheduled=False, slim=False):
        calls.append((m is not None, scheduled))
        return orig(device, m, n_tri, scheduled=scheduled, slim=slim)

    monkeypatch.setattr(S, "_resolve_kernel", spy)
    got = view_factor_matrix(meshes, params=params, mesh=mesh)
    assert got == base
    # the dropped-emitter branch re-resolves for the pipelined regime even
    # though a mesh is present (the only scheduled=False call in this solve)
    assert (True, False) in calls, calls


def test_sched_pipeline_matches_sequential_and_overlaps(monkeypatch):
    """SCHED_PIPELINE=1 (default) must (a) produce dicts identical to the
    sequential scheduled driver, and (b) actually dispatch round k+1 before
    fetching round k (two consecutive dispatch events with no fetch between)
    whenever a solve takes several convergence rounds."""
    import raystrack_tpu.solver as S
    from raystrack_tpu import config
    from raystrack_tpu.ops import trace as T

    meshes = _cloud_scene(560, seed=8)
    # stderr tolerance the scene cannot reach quickly -> several projected
    # rounds; max_iters bounds the test's runtime
    params = MatrixParams(samples=2, rays=32, seed=4, device="cpu",
                          bvh="builtin", max_iters=12, min_iters=2,
                          tol=2e-3, tol_mode="stderr", reciprocity=True)
    _force_scheduled_pallas(monkeypatch)

    monkeypatch.setattr(config, "SCHED_PIPELINE", 0)
    seq = view_factor_matrix(meshes, params=params)

    events = []
    orig_dispatch = T.scheduled_trace_pallas
    orig_fetch = T.unpack_outputs

    def spy_dispatch(*a, **k):
        events.append("d")
        return orig_dispatch(*a, **k)

    def spy_fetch(*a, **k):
        events.append("f")
        return orig_fetch(*a, **k)

    monkeypatch.setattr(T, "scheduled_trace_pallas", spy_dispatch)
    monkeypatch.setattr(S, "scheduled_trace_pallas", spy_dispatch,
                        raising=False)
    monkeypatch.setattr(T, "unpack_outputs", spy_fetch)
    monkeypatch.setattr(config, "SCHED_PIPELINE", 1)
    pipe = view_factor_matrix(meshes, params=params)
    assert pipe == seq
    assert "dd" in "".join(events), events  # round k+1 in flight before fetch k


def test_sched_pipeline_sky_and_workflow_match(monkeypatch):
    """Round pipelining must be result-invariant on the sky and shared-ray
    workflow scheduled drivers too (dual monitors + sky bins exercise the
    consume paths the matrix test does not)."""
    from raystrack_tpu import (
        SkyParams,
        view_factor_matrix_and_sky,
        view_factor_to_tregenza_sky,
    )
    from raystrack_tpu import config

    meshes = _cloud_scene(560, seed=8)
    mp = MatrixParams(samples=2, rays=32, seed=4, device="cpu", bvh="builtin",
                      max_iters=10, min_iters=2, tol=2e-3, tol_mode="stderr")
    sp = SkyParams(samples=2, rays=32, seed=4, device="cpu", bvh="builtin",
                   max_iters=10, min_iters=2, tol=2e-3, tol_mode="stderr",
                   discrete=True)
    _force_scheduled_pallas(monkeypatch)

    monkeypatch.setattr(config, "SCHED_PIPELINE", 0)
    sky_seq = view_factor_to_tregenza_sky(meshes, params=sp)
    wf_seq = view_factor_matrix_and_sky(meshes, matrix_params=mp, sky_params=sp)
    monkeypatch.setattr(config, "SCHED_PIPELINE", 1)
    assert view_factor_to_tregenza_sky(meshes, params=sp) == sky_seq
    assert view_factor_matrix_and_sky(
        meshes, matrix_params=mp, sky_params=sp
    ) == wf_seq


def test_sched_fuse_rounds_matches_and_reduces_dispatches(monkeypatch):
    """SCHED_FUSE_ROUNDS > 1 fuses several planned convergence rounds into
    ONE dispatch (each fused round planned from the same hypothetical
    position round pipelining uses). Results must be identical to the
    unfused driver on all three solve paths, and the dispatch count must
    strictly drop on a multi-round solve."""
    import raystrack_tpu.solver as S
    from raystrack_tpu import config
    from raystrack_tpu.ops import trace as T

    meshes = _cloud_scene(560, seed=8)
    mp = MatrixParams(samples=2, rays=32, seed=4, device="cpu", bvh="builtin",
                      max_iters=12, min_iters=2, tol=2e-3, tol_mode="stderr",
                      reciprocity=True)
    sp = SkyParams(samples=2, rays=32, seed=4, device="cpu", bvh="builtin",
                   max_iters=10, min_iters=2, tol=2e-3, tol_mode="stderr",
                   discrete=True)
    _force_scheduled_pallas(monkeypatch)

    n_dispatch = [0]
    orig_dispatch = T.scheduled_trace_pallas

    def spy(*a, **k):
        n_dispatch[0] += 1
        return orig_dispatch(*a, **k)

    monkeypatch.setattr(T, "scheduled_trace_pallas", spy)
    monkeypatch.setattr(S, "scheduled_trace_pallas", spy, raising=False)

    monkeypatch.setattr(config, "SCHED_FUSE_ROUNDS", 1)
    base_m = view_factor_matrix(meshes, params=mp)
    n_unfused = n_dispatch[0]
    sky_base = view_factor_to_tregenza_sky(meshes, params=sp)
    wf_base = view_factor_matrix_and_sky(meshes, matrix_params=mp,
                                         sky_params=sp)

    monkeypatch.setattr(config, "SCHED_FUSE_ROUNDS", 3)
    n_dispatch[0] = 0
    assert view_factor_matrix(meshes, params=mp) == base_m
    n_fused = n_dispatch[0]
    assert n_fused < n_unfused, (n_fused, n_unfused)
    assert view_factor_to_tregenza_sky(meshes, params=sp) == sky_base
    assert view_factor_matrix_and_sky(
        meshes, matrix_params=mp, sky_params=sp) == wf_base
