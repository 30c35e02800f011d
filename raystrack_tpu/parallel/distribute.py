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


__all__ = [
    "partition_emitters",
    "view_factor_matrix_partition",
    "backfill_reciprocity",
    "mesh_area",
]
