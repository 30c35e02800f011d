"""Resumable matrix solves via per-emitter checkpoints."""
import re

import numpy as np

import raystrack_tpu.solver as solver_mod
from raystrack_tpu import MatrixParams, view_factor_matrix


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

PARAMS = MatrixParams(
    samples=8, rays=64, seed=4, device="cpu", bvh="off",
    max_iters=6, min_iters=3, tol=1e-3, reciprocity=True,
)


def test_checkpoint_resume_identical(tmp_path, monkeypatch):
    ckpt = str(tmp_path / "ckpt")
    plain = view_factor_matrix(MESHES, params=PARAMS)
    first = view_factor_matrix(MESHES, params=PARAMS, checkpoint_dir=ckpt)
    assert first == plain

    lines = []
    monkeypatch.setattr(solver_mod, "_log", lines.append)
    second = view_factor_matrix(MESHES, params=PARAMS, checkpoint_dir=ckpt)
    assert second == plain
    # every emitter restored, nothing re-traced
    assert all("restored from checkpoint" in l or "0 iter" in l for l in lines)


def test_checkpoint_partial_resume(tmp_path, monkeypatch):
    ckpt = tmp_path / "ckpt"
    full = view_factor_matrix(MESHES, params=PARAMS, checkpoint_dir=str(ckpt))
    # simulate a crash that lost the middle emitter's checkpoint
    (ckpt / "emitter_00001.json").unlink()

    lines = []
    monkeypatch.setattr(solver_mod, "_log", lines.append)
    resumed = view_factor_matrix(MESHES, params=PARAMS, checkpoint_dir=str(ckpt))
    assert resumed == full
    restored = [l for l in lines if "] restored from checkpoint" in l]
    solved = [l for l in lines if re.search(r"\d+ iter,", l)]
    assert len(restored) == 2 and len(solved) == 1
    assert "[mid]" in solved[0]
    # the final summary notes how many emitters were restored
    assert any(l.startswith("2/3 emitters restored") for l in lines)


def test_checkpoint_invalidated_by_config_change(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    view_factor_matrix(MESHES, params=PARAMS, checkpoint_dir=ckpt)
    other = MatrixParams(**{**PARAMS.as_dict(), "seed": 99})
    fresh = view_factor_matrix(MESHES, params=other, checkpoint_dir=ckpt)
    plain = view_factor_matrix(MESHES, params=other)
    # stale checkpoints (different fingerprint) are ignored, results correct
    assert fresh == plain


def test_checkpoint_invalidated_by_geometry_change(tmp_path):
    """Same names/topology but moved vertices must not reuse stale results."""
    ckpt = str(tmp_path / "ckpt")
    view_factor_matrix(MESHES, params=PARAMS, checkpoint_dir=ckpt)
    moved = [MESHES[0], MESHES[1],
             _square("top", 3.0, 3.0, normal=-1)]  # top plate moved z=1.2 -> 3
    got = view_factor_matrix(moved, params=PARAMS, checkpoint_dir=ckpt)
    plain = view_factor_matrix(moved, params=PARAMS)
    assert got == plain  # re-solved, not restored


def test_checkpoints_written_before_assembly(tmp_path, monkeypatch):
    """Each emitter's checkpoint lands on disk the moment it converges, so a
    crash after tracing but before result assembly loses nothing."""
    ckpt = tmp_path / "ckpt"
    # reciprocity off so every emitter traces (no Phase-1 skip logging) and
    # _progress_line is reached only in the Phase-3 assembly loop
    params = MatrixParams(**{**PARAMS.as_dict(), "reciprocity": False})

    boom = RuntimeError("simulated crash before assembly")

    def crash(*a, **kw):
        raise boom

    monkeypatch.setattr(solver_mod, "_progress_line", crash)
    try:
        view_factor_matrix(MESHES, params=params, checkpoint_dir=str(ckpt))
    except RuntimeError as e:
        assert e is boom
    files = sorted(f.name for f in ckpt.glob("emitter_*.json"))
    assert files == ["emitter_00000.json", "emitter_00001.json", "emitter_00002.json"]

    monkeypatch.undo()
    resumed = view_factor_matrix(MESHES, params=params, checkpoint_dir=str(ckpt))
    assert resumed == view_factor_matrix(MESHES, params=params)


def test_sky_checkpoint_resume(tmp_path, monkeypatch):
    from raystrack_tpu import SkyParams, view_factor_to_tregenza_sky

    sp = SkyParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                   max_iters=5, min_iters=2, tol=1e-3)
    ckpt = str(tmp_path / "sky_ckpt")
    plain = view_factor_to_tregenza_sky(MESHES, params=sp)
    first = view_factor_to_tregenza_sky(MESHES, params=sp, checkpoint_dir=ckpt)
    assert first == plain

    lines = []
    monkeypatch.setattr(solver_mod, "_log", lines.append)
    second = view_factor_to_tregenza_sky(MESHES, params=sp, checkpoint_dir=ckpt)
    assert second == plain
    assert all("restored from checkpoint" in l for l in lines)


def test_workflow_checkpoint_resume(tmp_path, monkeypatch):
    """The shared-ray workflow resumes per emitter: matrix row, back-fill and
    sky row all restore, and the final result matches an uninterrupted run."""
    from raystrack_tpu import (
        SkyParams, view_factor_matrix_and_sky, view_factor_outside_workflow,
    )

    mp = MatrixParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                      max_iters=6, min_iters=2, tol=1e-3, reciprocity=True)
    sp = SkyParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                   max_iters=6, min_iters=2, tol=1e-3)
    ckpt = tmp_path / "wf_ckpt"
    plain = view_factor_matrix_and_sky(MESHES, matrix_params=mp, sky_params=sp)
    first = view_factor_matrix_and_sky(
        MESHES, matrix_params=mp, sky_params=sp, checkpoint_dir=str(ckpt)
    )
    assert first == plain

    # simulate a crash that lost the middle emitter's checkpoint
    (ckpt / "emitter_00001.json").unlink()
    lines = []
    monkeypatch.setattr(solver_mod, "_log", lines.append)
    resumed = view_factor_matrix_and_sky(
        MESHES, matrix_params=mp, sky_params=sp, checkpoint_dir=str(ckpt)
    )
    assert resumed == plain
    restored = [l for l in lines if "] restored from checkpoint" in l]
    traced = [l for l in lines if "] traced" in l]
    assert len(restored) == 2 and len(traced) == 1 and "[mid]" in traced[0]
    assert any(l.startswith("2/3 emitters restored") for l in lines)

    # the top-level workflow accepts checkpoint_dir on the shared path
    base3 = view_factor_outside_workflow(MESHES, matrix_params=mp, sky_params=sp)
    got3 = view_factor_outside_workflow(
        MESHES, matrix_params=mp, sky_params=sp, checkpoint_dir=str(ckpt)
    )
    assert got3 == base3


def test_workflow_checkpoint_invalidated_by_sky_change(tmp_path):
    """Changing only the sky convergence setup must invalidate workflow
    checkpoints (fingerprint covers both parameter sets)."""
    from raystrack_tpu import SkyParams, view_factor_matrix_and_sky

    mp = MatrixParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                      max_iters=6, min_iters=2, tol=1e-3)
    sp = SkyParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                   max_iters=6, min_iters=2, tol=1e-3)
    ckpt = str(tmp_path / "wf_ckpt")
    view_factor_matrix_and_sky(MESHES, matrix_params=mp, sky_params=sp,
                               checkpoint_dir=ckpt)
    sp2 = SkyParams(**{**sp.as_dict(), "max_iters": 3})
    got = view_factor_matrix_and_sky(MESHES, matrix_params=mp, sky_params=sp2,
                                     checkpoint_dir=ckpt)
    plain = view_factor_matrix_and_sky(MESHES, matrix_params=mp, sky_params=sp2)
    assert got == plain


def test_workflow_fallback_checkpoint_dirs(tmp_path):
    """Non-shareable workflow params checkpoint into <dir>/matrix, <dir>/sky."""
    from raystrack_tpu import SkyParams
    from raystrack_tpu.api import view_factor_outside_workflow

    mp = MatrixParams(samples=16, rays=64, seed=4, device="cpu", bvh="off",
                      max_iters=4, min_iters=2, tol=1e-3)
    sp = SkyParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                   max_iters=4, min_iters=2, tol=1e-3)
    ckpt = tmp_path / "wf2"
    base = view_factor_outside_workflow(MESHES, matrix_params=mp, sky_params=sp)
    got = view_factor_outside_workflow(
        MESHES, matrix_params=mp, sky_params=sp, checkpoint_dir=str(ckpt)
    )
    assert got == base
    assert sorted(p.name for p in ckpt.iterdir()) == ["matrix", "sky"]
    resumed = view_factor_outside_workflow(
        MESHES, matrix_params=mp, sky_params=sp, checkpoint_dir=str(ckpt)
    )
    assert resumed == base


def test_mid_emitter_progress_resume(tmp_path, monkeypatch):
    """A solve killed while emitters are still converging resumes from the
    per-emitter progress snapshots (exact monitor state + absolute-indexed
    RNG stream) and finishes bit-identical to an uninterrupted solve."""
    from raystrack_tpu import config

    ckpt = str(tmp_path / "ckpt")
    plain = view_factor_matrix(MESHES, params=PARAMS)

    monkeypatch.setattr(config, "CHECKPOINT_PROGRESS_S", 0.0)
    real_done = solver_mod._entry_done
    boom = RuntimeError("killed mid-solve")

    def crash_on_first_completion(entry):
        raise boom

    monkeypatch.setattr(solver_mod, "_entry_done", crash_on_first_completion)
    try:
        view_factor_matrix(MESHES, params=PARAMS, checkpoint_dir=ckpt)
    except RuntimeError as e:
        assert e is boom
    monkeypatch.setattr(solver_mod, "_entry_done", real_done)
    progress = sorted(p.name for p in (tmp_path / "ckpt").glob("*.progress.json"))
    assert progress, "no mid-emitter snapshots were written"

    lines = []
    monkeypatch.setattr(solver_mod, "_log", lines.append)
    resumed = view_factor_matrix(MESHES, params=PARAMS, checkpoint_dir=ckpt)
    assert resumed == plain
    assert any("resuming from iteration" in l for l in lines)
    # finished emitters clear their snapshots
    assert not list((tmp_path / "ckpt").glob("*.progress.json"))


def test_mid_emitter_progress_cleared_on_completion(tmp_path, monkeypatch):
    from raystrack_tpu import config

    monkeypatch.setattr(config, "CHECKPOINT_PROGRESS_S", 0.0)
    ckpt = tmp_path / "ckpt"
    out = view_factor_matrix(MESHES, params=PARAMS, checkpoint_dir=str(ckpt))
    assert out == view_factor_matrix(MESHES, params=PARAMS)
    assert not list(ckpt.glob("*.progress.json"))
    assert len(list(ckpt.glob("emitter_*.json"))) == 3


def test_mid_emitter_progress_resume_workflow(tmp_path, monkeypatch):
    """The shared-ray workflow resumes mid-emitter with BOTH monitors'
    state (matrix and sky iteration counts may differ at the kill point)."""
    from raystrack_tpu import SkyParams, config, view_factor_matrix_and_sky

    mp = MatrixParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                      max_iters=8, min_iters=2, tol=1e-3, reciprocity=True)
    sp = SkyParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                   max_iters=4, min_iters=2, tol=1e-3)
    plain = view_factor_matrix_and_sky(MESHES, matrix_params=mp, sky_params=sp)

    ckpt = str(tmp_path / "wf_ckpt")
    monkeypatch.setattr(config, "CHECKPOINT_PROGRESS_S", 0.0)
    real_done = solver_mod._entry_done
    boom = RuntimeError("killed mid-solve")
    monkeypatch.setattr(
        solver_mod, "_entry_done",
        lambda entry: (_ for _ in ()).throw(boom),
    )
    try:
        view_factor_matrix_and_sky(
            MESHES, matrix_params=mp, sky_params=sp, checkpoint_dir=ckpt
        )
    except RuntimeError as e:
        assert e is boom
    monkeypatch.setattr(solver_mod, "_entry_done", real_done)
    assert list((tmp_path / "wf_ckpt").glob("*.progress.json"))

    lines = []
    monkeypatch.setattr(solver_mod, "_log", lines.append)
    resumed = view_factor_matrix_and_sky(
        MESHES, matrix_params=mp, sky_params=sp, checkpoint_dir=ckpt
    )
    assert resumed == plain
    assert any("resuming from iteration" in l for l in lines)


def test_mid_emitter_progress_invalidated_by_config_change(tmp_path, monkeypatch):
    """Progress snapshots carry the solve fingerprint: a changed seed must
    not resume from another configuration's mid-solve state."""
    from raystrack_tpu import config

    ckpt = str(tmp_path / "ckpt")
    monkeypatch.setattr(config, "CHECKPOINT_PROGRESS_S", 0.0)
    boom = RuntimeError("killed")
    monkeypatch.setattr(
        solver_mod, "_entry_done", lambda e: (_ for _ in ()).throw(boom)
    )
    try:
        view_factor_matrix(MESHES, params=PARAMS, checkpoint_dir=ckpt)
    except RuntimeError:
        pass
    monkeypatch.undo()
    assert list((tmp_path / "ckpt").glob("*.progress.json"))

    other = MatrixParams(**{**PARAMS.as_dict(), "seed": 99})
    lines = []
    monkeypatch.setattr(solver_mod, "_log", lines.append)
    got = view_factor_matrix(MESHES, params=other, checkpoint_dir=ckpt)
    assert got == view_factor_matrix(MESHES, params=other)
    assert not any("resuming from iteration" in l for l in lines)


def test_workflow_checkpoint_sky_schema_and_stats(tmp_path, monkeypatch):
    """Workflow checkpoints store the sky row under its own ``sky`` key (the
    ``stats`` slot carries real stderr rows), old-schema checkpoints that
    parked the sky row inside ``stats`` still restore, and
    ``return_stats=True`` reports one merged stderr row per emitter."""
    import json

    from raystrack_tpu import SkyParams, view_factor_matrix_and_sky

    mp = MatrixParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                      max_iters=6, min_iters=2, tol=1e-3, reciprocity=True)
    sp = SkyParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                   max_iters=6, min_iters=2, tol=1e-3)
    ckpt = tmp_path / "wf_ckpt"
    vf, sky, stats = view_factor_matrix_and_sky(
        MESHES, matrix_params=mp, sky_params=sp, checkpoint_dir=str(ckpt),
        return_stats=True,
    )

    # new schema: sky is a top-level key; stats holds floats for every row
    # key AND the sky key, plus a legacy "sky" duplicate so PRE-round-4
    # readers (which restore stats["sky"]) still resume these files
    payload = json.loads((ckpt / "emitter_00000.json").read_text())
    assert payload["sky"] == sky["ground"]
    assert payload["stats"]["sky"] == sky["ground"]
    assert set(payload["stats"]) == set(vf["ground"]) | {"Sky", "sky"}
    assert all(isinstance(v, float) for k, v in payload["stats"].items()
               if k != "sky")
    for name, _, _ in MESHES:
        # one merged row per emitter: stderr for every receiver key the
        # emitter TRACED (back-fill entries landed by other emitters carry
        # no stderr) plus the sky key
        traced = set(vf[name]) & set(stats[name])
        assert set(stats[name]) == traced | {"Sky"}
        assert stats[name]["Sky"] >= 0.0

    # a resumed solve restores rows, sky AND stats from disk
    lines = []
    monkeypatch.setattr(solver_mod, "_log", lines.append)
    vf2, sky2, stats2 = view_factor_matrix_and_sky(
        MESHES, matrix_params=mp, sky_params=sp, checkpoint_dir=str(ckpt),
        return_stats=True,
    )
    assert (vf2, sky2, stats2) == (vf, sky, stats)
    assert all("restored from checkpoint" in l for l in lines)

    # old-schema migration: sky row parked in the stats slot, no sky key
    for p in sorted(ckpt.glob("emitter_*.json")):
        data = json.loads(p.read_text())
        old = {k: v for k, v in data.items() if k not in ("sky", "stats")}
        old["stats"] = {"sky": data["sky"]}
        p.write_text(json.dumps(old))
    vf3, sky3, stats3 = view_factor_matrix_and_sky(
        MESHES, matrix_params=mp, sky_params=sp, checkpoint_dir=str(ckpt),
        return_stats=True,
    )
    assert (vf3, sky3) == (vf, sky)
    assert all(stats3[name] == {} for name, _, _ in MESHES)  # old ckpts: no stats
