"""Outside workflow: scene + sky + rest = 1, clamping, shareability."""
import numpy as np

from raystrack_tpu import (
    MatrixParams,
    SkyParams,
    outside_workflow_shareable,
    view_factor_outside_workflow,
)


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
    _square("panel", 1.0, 0.8, normal=-1, center=(0.2, 0.0)),
]


def _mp(**kw):
    base = dict(
        samples=8, rays=128, seed=7, device="cpu", bvh="off",
        max_iters=8, min_iters=3, tol=1e-3,
    )
    base.update(kw)
    return MatrixParams(**base)


def _sp(**kw):
    base = dict(
        samples=8, rays=128, seed=7, device="cpu", bvh="off",
        max_iters=8, min_iters=3, tol=1e-3,
    )
    base.update(kw)
    return SkyParams(**base)


def test_shareable_predicate():
    assert outside_workflow_shareable(_mp(), _sp())
    assert not outside_workflow_shareable(_mp(samples=16), _sp())
    assert not outside_workflow_shareable(_mp(seed=1), _sp())
    assert not outside_workflow_shareable(_mp(flip_faces=True), _sp())
    assert not outside_workflow_shareable(_mp(device="auto"), _sp())
    # convergence fields may differ
    assert outside_workflow_shareable(_mp(tol=1e-2, max_iters=3), _sp())


def test_workflow_sums_to_one_shared_path():
    scene, sky, rest = view_factor_outside_workflow(
        MESHES, matrix_params=_mp(), sky_params=_sp()
    )
    for name, _, _ in MESHES:
        total = (
            sum(scene.get(name, {}).values())
            + sum(sky.get(name, {}).values())
            + rest[name]["Rest"]
        )
        assert abs(total - 1.0) < 1e-9
        assert rest[name]["Rest"] >= 0.0 or abs(rest[name]["Rest"]) < 1e-6
    # upward-facing ground sees mostly sky
    assert sky["ground"]["Sky"] > 0.5


def test_workflow_fallback_path_when_not_shareable():
    scene, sky, rest = view_factor_outside_workflow(
        MESHES, matrix_params=_mp(samples=16), sky_params=_sp(samples=8)
    )
    for name, _, _ in MESHES:
        total = (
            sum(scene.get(name, {}).values())
            + sum(sky.get(name, {}).values())
            + rest[name]["Rest"]
        )
        assert abs(total - 1.0) < 1e-9


def test_workflow_discrete_sky():
    scene, sky, rest = view_factor_outside_workflow(
        MESHES, matrix_params=_mp(), sky_params=_sp(discrete=True)
    )
    assert len(sky["ground"]) == 145
    total = (
        sum(scene.get("ground", {}).values())
        + sum(sky["ground"].values())
        + rest["ground"]["Rest"]
    )
    assert abs(total - 1.0) < 1e-9


def test_workflow_enforced_rows():
    scene, sky, rest = view_factor_outside_workflow(
        MESHES,
        matrix_params=_mp(enforce_reciprocity_rowsum=True, reciprocity=True),
        sky_params=_sp(),
    )
    for name, _, _ in MESHES:
        total = (
            sum(scene.get(name, {}).values())
            + sum(sky.get(name, {}).values())
            + rest[name]["Rest"]
        )
        assert abs(total - 1.0) < 1e-6


def test_combined_independent_convergence(monkeypatch):
    """One side converging early must not stop the other side's iterations."""
    import re
    import raystrack_tpu.solver as solver_mod
    from raystrack_tpu import view_factor_matrix_and_sky

    lines = []
    monkeypatch.setattr(solver_mod, "_log", lines.append)
    # sky gets a loose tolerance (converges at min_iters), matrix runs longer;
    # reciprocity off so every emitter has matrix receivers
    mp = _mp(tol=1e-9, max_iters=10, min_iters=2, reciprocity=False)
    sp = _sp(tol=1.0, max_iters=10, min_iters=2)
    view_factor_matrix_and_sky(MESHES, matrix_params=mp, sky_params=sp)
    stats = {}
    for line in lines:
        m = re.search(r"\[(\w+)\] traced (\d+) iter.*scene=(\d+) iter, sky=(\d+) iter", line)
        if m:
            stats[m.group(1)] = (int(m.group(2)), int(m.group(3)), int(m.group(4)))
    for name, (traced, scene_iters, sky_iters) in stats.items():
        assert sky_iters == 2, (name, stats[name])     # loose tol: stops at min
        assert scene_iters == 10, (name, stats[name])  # tight tol: runs to max
        assert traced == 10


def test_outside_workflow_return_stats():
    """The top-level workflow forwards merged stderr rows from whichever
    solver path ran (shared-ray AND the separate-solver fallback)."""
    from raystrack_tpu import (MatrixParams, SkyParams,
                               view_factor_outside_workflow)

    import numpy as np

    def square(name, z, flip):
        V = np.array([[-0.5, -0.5, z], [0.5, -0.5, z], [0.5, 0.5, z],
                      [-0.5, 0.5, z]], np.float32)
        F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        if flip:
            F = F[:, [0, 2, 1]].copy()
        return name, V, F

    meshes = [square("bottom", 0.0, False), square("top", 0.8, True)]
    mp = MatrixParams(samples=4, rays=64, seed=3, device="cpu", bvh="off",
                      max_iters=4, min_iters=2, tol=1e-3)
    sp = SkyParams(samples=4, rays=64, seed=3, device="cpu", bvh="off",
                   max_iters=4, min_iters=2, tol=1e-3)
    # shared path
    out = view_factor_outside_workflow(
        meshes, matrix_params=mp, sky_params=sp, return_stats=True)
    assert len(out) == 4
    vf, sky, rest, stats = out
    assert set(stats) == {"bottom", "top"}
    assert "Sky" in stats["bottom"]
    # separate-solver fallback (different sampling): stats merge both solvers
    sp2 = SkyParams(**{**sp.as_dict(), "samples": 8})
    vf2, sky2, rest2, stats2 = view_factor_outside_workflow(
        meshes, matrix_params=mp, sky_params=sp2, return_stats=True)
    assert "Sky" in stats2["bottom"]
    # 3-tuple contract unchanged without the flag
    assert len(view_factor_outside_workflow(
        meshes, matrix_params=mp, sky_params=sp)) == 3
