"""Multi-host scale-out: distribute whole emitters across workers.

Emitters are embarrassingly parallel: each worker solves the full scene
matrix restricted to its emitter subset (rays still sharded over its local
ICI mesh via ``mesh=``), and the per-worker row dicts merge losslessly with
``merge_vf_matrix``. This is the DCN-level layer of the parallelism stack:
ICI shards rays inside a slice, DCN distributes emitters across slices.

Reciprocity note: the half-matrix skip couples emitter i to receivers j > i,
so distributed solves must run with ``reciprocity=False`` per worker (the
helper enforces this) and apply reciprocity/row-sum enforcement after the
merge.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..params import MatrixParams
from ..prepared import PreparedSolver

Mesh = Tuple[str, np.ndarray, np.ndarray]
VFDict = Dict[str, Dict[str, float]]


def partition_emitters(n_emitters: int, n_parts: int, part: int) -> List[int]:
    """Deterministic strided partition of emitter indices.

    Striding (rather than contiguous blocks) balances cost when emitter
    sizes are sorted or clustered.
    """
    if not 0 <= part < n_parts:
        raise ValueError(f"part must be in [0, {n_parts}) (got {part})")
    return list(range(part, n_emitters, n_parts))


def view_factor_matrix_partition(
    meshes: List[Mesh],
    params: MatrixParams,
    *,
    n_parts: int,
    part: int,
    prepared: Optional[PreparedSolver] = None,
    mesh=None,
    half_matrix: bool = False,
) -> VFDict:
    """Solve only this worker's emitter subset; merge results across workers.

    Returns a row dict containing only the emitters in partition ``part``.
    Combine worker outputs with :func:`raystrack_tpu.merge_vf_matrix` and,
    if desired, apply ``enforce_reciprocity_only`` /
    ``enforce_reciprocity_and_rowsum`` on the merged dict.

    ``half_matrix=True`` keeps the reciprocity work-skip (emitter i traces
    only receivers j > i) but defers the transpose back-fill to the caller:
    after merging ALL partitions, apply
    :func:`backfill_reciprocity` to reproduce the single-process
    ``reciprocity=True`` result exactly (the skip couples rows across
    emitters, so per-worker back-fill would be incomplete).
    """
    local = partition_emitters(len(meshes), n_parts, part)
    worker_params = MatrixParams(**params.as_dict())
    # Half-matrix back-fill and post-enforcement couple rows across
    # emitters; both must happen after the merge, not per worker.
    worker_params.reciprocity = False
    worker_params.enforce_reciprocity_rowsum = False

    solver = prepared if prepared is not None else PreparedSolver(meshes)
    result: VFDict = {}
    for idx in local:
        result.update(
            _solve_single_emitter(
                meshes, idx, worker_params, solver, mesh, half_matrix=half_matrix
            )
        )
    return result


def mesh_area(V: np.ndarray, F: np.ndarray) -> float:
    """Total triangle area of one mesh (matches prepare_emitters' CDF area)."""
    a = np.asarray(V[F[:, 0]], dtype=np.float32)
    e1 = np.asarray(V[F[:, 1]], dtype=np.float32) - a
    e2 = np.asarray(V[F[:, 2]], dtype=np.float32) - a
    return float((0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)).sum())


def backfill_reciprocity(merged: VFDict, meshes: List[Mesh]) -> VFDict:
    """Fill F(j->i) = F(i->j) * A_i / A_j for the untraced lower half.

    The post-merge counterpart of the single-process solver's in-loop
    back-fill (solver.view_factor_matrix assembly): apply to the merged
    output of ``half_matrix=True`` partitions. In-place; returns ``merged``.
    """
    areas = [mesh_area(V, F) for _, V, F in meshes]
    for i, (name_i, _, _) in enumerate(meshes):
        row = merged.get(name_i, {})
        for j in range(i + 1, len(meshes)):
            name_j = meshes[j][0]
            f = row.get(f"{name_j}_front", 0.0)
            if f > 0.0 and areas[j] > 0.0:
                merged.setdefault(name_j, {})[f"{name_i}_front"] = (
                    f * (areas[i] / areas[j])
                )
    return merged


def view_factor_sky_partition(
    meshes: List[Mesh],
    params,
    *,
    n_parts: int,
    part: int,
    prepared: Optional[PreparedSolver] = None,
    mesh=None,
) -> VFDict:
    """Solve only this worker's emitters' sky rows (merged or 145-patch).

    Sky rows are fully independent per emitter, so merged partitions equal
    the single-process :func:`raystrack_tpu.view_factor_to_tregenza_sky`
    exactly. Combine worker outputs with ``merge_vf_matrix``.
    """
    local = partition_emitters(len(meshes), n_parts, part)
    solver = prepared if prepared is not None else PreparedSolver(meshes)
    result: VFDict = {}
    for idx in local:
        result.update(_solve_single_sky(meshes, idx, params, solver, mesh))
    return result


def view_factor_workflow_partition(
    meshes: List[Mesh],
    matrix_params,
    sky_params,
    *,
    n_parts: int,
    part: int,
    prepared: Optional[PreparedSolver] = None,
    mesh=None,
    half_matrix: bool = False,
) -> Tuple[VFDict, VFDict]:
    """Shared-ray (matrix + sky) solve of this worker's emitter subset.

    Returns ``(matrix_rows, sky_rows)``. As with the matrix partition,
    reciprocity back-fill must run after merging all partitions
    (``half_matrix=True`` + :func:`backfill_reciprocity`).
    """
    from ..solver import outside_workflow_shareable

    if not outside_workflow_shareable(matrix_params, sky_params):
        raise ValueError(
            "matrix_params and sky_params are not compatible for shared tracing"
        )
    local = partition_emitters(len(meshes), n_parts, part)
    worker_params = MatrixParams(**matrix_params.as_dict())
    worker_params.reciprocity = False
    worker_params.enforce_reciprocity_rowsum = False

    solver = prepared if prepared is not None else PreparedSolver(meshes)
    vf_rows: VFDict = {}
    sky_rows: VFDict = {}
    for idx in local:
        row, sky_row = _solve_single_combined(
            meshes, idx, worker_params, sky_params, solver, mesh,
            half_matrix=half_matrix,
        )
        vf_rows.update(row)
        sky_rows.update(sky_row)
    return vf_rows, sky_rows


def _solve_single_emitter(
    meshes: List[Mesh],
    idx_emit: int,
    params: MatrixParams,
    prepared: PreparedSolver,
    mesh,
    *,
    half_matrix: bool = False,
) -> VFDict:
    """One emitter's row against the full scene."""
    from ..solver import (
        _EmitterRun,
        _build_emitter_surface_mask,
        _drive_monitors,
        _matrix_active_receivers,
        _matrix_skip,
        _placements,
        _ray_align,
        _resolve_device,
        _resolve_kernel,
        _select_bvh,
    )
    from ..convergence import MatrixMonitor

    p = params.as_dict()
    device = _resolve_device(p["device"])
    use_bvh = _select_bvh(p["bvh"], prepared.total_faces)
    pack_dev, ray_dev = _placements(mesh, device)
    kernel, interpret = _resolve_kernel(device, mesh, prepared.total_faces)
    scene_pack = prepared.get_scene_pack(use_accel=use_bvh, device=pack_dev)
    align = _ray_align(mesh)
    emitters = prepared.get_emitters(
        samples=p["samples"], rays=p["rays"], flip_faces=p["flip_faces"]
    )
    centers, extents = prepared.get_mesh_bounds()

    n_surf = len(meshes)
    name_e = meshes[idx_emit][0]
    emitter = emitters[idx_emit]
    surf_active = _build_emitter_surface_mask(idx_emit, emitter, centers, extents)
    receivers, recv_idx = _matrix_active_receivers(
        idx_emit, n_surf, half_matrix, surf_active
    )
    if not receivers:
        return {name_e: {}}

    emit_sid, min_sid = _matrix_skip(idx_emit, half_matrix)
    em_pack = prepared.get_emitter_pack(
        idx_emit, samples=p["samples"], rays=p["rays"],
        flip_faces=p["flip_faces"], align=align,
        device=pack_dev, ray_device=ray_dev,
    )
    run = _EmitterRun(
        scene_pack, em_pack, surf_active, emit_sid, min_sid,
        p["seed"], idx_emit, pack_dev, mesh=mesh,
        kernel=kernel, interpret=interpret,
    )
    monitor = MatrixMonitor(
        n_surf, recv_idx,
        n_rays_once=em_pack.n_rays_once,
        tol=p["tol"], tol_mode=p["tol_mode"],
        min_iters=p["min_iters"], interval=p["convergence_interval"],
        max_iters=p["max_iters"],
    )
    _drive_monitors(run, monitor, None, discrete=False)

    row: Dict[str, float] = {}
    total = float(monitor.total_rays)
    for j in receivers:
        name_r = meshes[j][0]
        f = monitor.hits_f[j] / total
        b = monitor.hits_b[j] / total
        if f > 0.0:
            row[f"{name_r}_front"] = f
        if b > 0.0:
            row[f"{name_r}_back"] = b
    return {name_e: row}


def _emitter_context(meshes, idx_emit, p, prepared, mesh, *, flip_faces):
    """Shared per-emitter setup for the single-emitter partition solvers."""
    from ..solver import (
        _EmitterRun,
        _build_emitter_surface_mask,
        _placements,
        _ray_align,
        _resolve_device,
        _resolve_kernel,
        _select_bvh,
    )

    device = _resolve_device(p["device"])
    use_bvh = _select_bvh(p["bvh"], prepared.total_faces)
    pack_dev, ray_dev = _placements(mesh, device)
    kernel, interpret = _resolve_kernel(device, mesh, prepared.total_faces)
    scene_pack = prepared.get_scene_pack(use_accel=use_bvh, device=pack_dev)
    align = _ray_align(mesh)
    emitters = prepared.get_emitters(
        samples=p["samples"], rays=p["rays"], flip_faces=flip_faces
    )
    centers, extents = prepared.get_mesh_bounds()
    emitter = emitters[idx_emit]
    surf_active = _build_emitter_surface_mask(idx_emit, emitter, centers, extents)
    em_pack = prepared.get_emitter_pack(
        idx_emit, samples=p["samples"], rays=p["rays"], flip_faces=flip_faces,
        align=align, device=pack_dev, ray_device=ray_dev,
    )

    def make_run(emit_sid: int, min_sid: int) -> "_EmitterRun":
        return _EmitterRun(
            scene_pack, em_pack, surf_active, emit_sid, min_sid,
            p["seed"], idx_emit, pack_dev, mesh=mesh,
            kernel=kernel, interpret=interpret,
        )

    return device, surf_active, em_pack, make_run


def _sky_row_from_monitor(monitor, discrete: bool) -> Dict[str, float]:
    total = float(max(1, monitor.total_rays))
    if discrete:
        frac = monitor.counts_total.astype(np.float64) / total
        return {f"Sky_Patch_{i + 1}": float(frac[i]) for i in range(145)}
    return {"Sky": float(monitor.upward_total / total)}


def _solve_single_sky(meshes, idx_emit, params, prepared, mesh) -> VFDict:
    """One emitter's sky row; matches the full sky solver per emitter."""
    from ..convergence import SkyMonitor
    from ..solver import _drive_monitors

    p = params.as_dict()
    discrete = bool(p["discrete"])
    name_e = meshes[idx_emit][0]
    sky_keys = [f"Sky_Patch_{i}" for i in range(1, 146)] if discrete else ["Sky"]
    if len(meshes) <= 1:
        # parity with the full solver: single-mesh scenes report zero rows
        return {name_e: {k: 0.0 for k in sky_keys}}

    device, surf_active, em_pack, make_run = _emitter_context(
        meshes, idx_emit, p, prepared, mesh, flip_faces=False
    )
    run = make_run(idx_emit, 0)
    monitor = SkyMonitor(
        discrete=discrete,
        n_rays_once=em_pack.n_rays_once,
        tol=p["tol"], tol_mode=p["tol_mode"],
        min_iters=p["min_iters"],
        interval=1 if device.platform == "cpu" else p["convergence_interval"],
        max_iters=p["max_iters"],
    )
    _drive_monitors(run, None, monitor, discrete=discrete)
    row = {k: 0.0 for k in sky_keys}
    row.update(_sky_row_from_monitor(monitor, discrete))
    return {name_e: row}


def _solve_single_combined(
    meshes, idx_emit, matrix_params, sky_params, prepared, mesh,
    *, half_matrix: bool,
) -> Tuple[VFDict, VFDict]:
    """One emitter through the shared-ray state machine (matrix + sky)."""
    from ..convergence import MatrixMonitor, SkyMonitor
    from ..solver import _drive_monitors, _matrix_active_receivers, _matrix_skip

    mp = matrix_params.as_dict()
    sp = sky_params.as_dict()
    discrete = bool(sp["discrete"])
    name_e = meshes[idx_emit][0]
    n_surf = len(meshes)

    device, surf_active, em_pack, make_run = _emitter_context(
        meshes, idx_emit, mp, prepared, mesh, flip_faces=False
    )
    receivers, recv_idx = _matrix_active_receivers(
        idx_emit, n_surf, half_matrix, surf_active
    )
    emit_sid, min_sid = _matrix_skip(idx_emit, half_matrix)
    run = make_run(emit_sid, min_sid)
    interval = lambda d: 1 if device.platform == "cpu" else d
    matrix_mon = (
        MatrixMonitor(
            n_surf, recv_idx,
            n_rays_once=em_pack.n_rays_once,
            tol=mp["tol"], tol_mode=mp["tol_mode"],
            min_iters=mp["min_iters"],
            interval=interval(mp["convergence_interval"]),
            max_iters=mp["max_iters"],
        )
        if receivers
        else None
    )
    sky_mon = SkyMonitor(
        discrete=discrete,
        n_rays_once=em_pack.n_rays_once,
        tol=sp["tol"], tol_mode=sp["tol_mode"],
        min_iters=sp["min_iters"],
        interval=interval(sp["convergence_interval"]),
        max_iters=sp["max_iters"],
    )
    _drive_monitors(run, matrix_mon, sky_mon, discrete=discrete)

    row: Dict[str, float] = {}
    if matrix_mon is not None and matrix_mon.total_rays > 0:
        total = float(matrix_mon.total_rays)
        for j in receivers:
            name_r = meshes[j][0]
            f = matrix_mon.hits_f[j] / total
            b = matrix_mon.hits_b[j] / total
            if f > 0.0:
                row[f"{name_r}_front"] = f
            if b > 0.0:
                row[f"{name_r}_back"] = b
    sky_keys = [f"Sky_Patch_{i}" for i in range(1, 146)] if discrete else ["Sky"]
    sky_row = {k: 0.0 for k in sky_keys}
    if sky_mon.total_rays > 0:
        sky_row.update(_sky_row_from_monitor(sky_mon, discrete))
    return {name_e: row}, {name_e: sky_row}


__all__ = [
    "partition_emitters",
    "view_factor_matrix_partition",
    "view_factor_sky_partition",
    "view_factor_workflow_partition",
    "backfill_reciprocity",
    "mesh_area",
]
