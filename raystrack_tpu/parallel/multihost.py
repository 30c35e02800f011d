"""Multi-process (multi-host / multi-slice) execution over DCN.

The reference is strictly single-process (SURVEY §5: no comm backend; its
widest scope is one CUDA device with streams). The TPU-native scale-out
model has two layers:

- **ICI (inside a slice):** rays sharded over the local device mesh
  (``parallel.sharding``), integer hit counts psummed — bitwise-exact.
- **DCN (across hosts/slices):** whole emitters are embarrassingly
  parallel. Each process solves a deterministic emitter partition
  (``parallel.distribute``), and the per-process row dicts are exchanged
  and merged so every process ends with the identical full matrix.

This module provides the process-level wiring: ``initialize()`` brings up
the JAX distributed runtime (the only rendezvous a TPU fleet needs — the
equivalent of the NCCL/MPI init the reference never had), and
``view_factor_matrix_multihost()`` runs partition → all-gather → merge →
(optional) post-merge reciprocity enforcement.

Runbook: docs/MULTIHOST.md. Smoke-tested with two local CPU processes in
``tests/test_multihost.py``.
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..params import MatrixParams
from ..prepared import PreparedSolver
from .distribute import (
    view_factor_matrix_partition,
    view_factor_sky_partition,
    view_factor_workflow_partition,
)

Mesh = Tuple[str, np.ndarray, np.ndarray]
VFDict = Dict[str, Dict[str, float]]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> Tuple[int, int]:
    """Bring up the JAX distributed runtime; returns (process_id, count).

    Arguments default to JAX's environment autodetection (TPU pods fill
    them in automatically; on plain hosts set ``JAX_COORDINATOR_ADDRESS``
    etc. or pass them explicitly). Safe to call when already initialized or
    when running single-process with no coordinator configured.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as err:
        # already initialized -> keep going; anything else is a real error
        if "already" not in str(err).lower():
            raise
    return jax.process_index(), jax.process_count()


def _exchange_rows(local: VFDict) -> List[VFDict]:
    """All-gather per-process row dicts through the device fabric.

    Dicts ride as length-prefixed JSON bytes in a padded uint8 array; a
    first all-gather agrees on the buffer size. Every process receives every
    partition, so the merge is replicated and deterministic.
    """
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return [local]

    payload = np.frombuffer(
        json.dumps(local, sort_keys=True).encode("utf-8"), dtype=np.uint8
    )
    sizes = np.asarray(multihost_utils.process_allgather(np.int64(payload.size)))
    buf = np.zeros(int(sizes.max()), dtype=np.uint8)
    buf[: payload.size] = payload
    stacked = np.asarray(multihost_utils.process_allgather(buf))
    return [
        json.loads(bytes(stacked[p, : int(sizes[p])]).decode("utf-8"))
        for p in range(stacked.shape[0])
    ]


def view_factor_matrix_multihost(
    meshes: List[Mesh],
    params: MatrixParams,
    *,
    prepared: Optional[PreparedSolver] = None,
    mesh=None,
) -> VFDict:
    """Full-scene solve distributed over all JAX processes.

    Each process traces its strided emitter partition (rays sharded over its
    local ``mesh`` if given), partitions are all-gathered over DCN and
    merged identically everywhere. With ``params.reciprocity`` the
    half-matrix work-skip stays on per worker and the transpose back-fill
    runs after the merge, so the result is IDENTICAL to the single-process
    ``view_factor_matrix`` for any process count. Row-sum enforcement (when
    requested) likewise runs on the merged matrix.
    """
    import jax

    from ..io import merge_vf_matrix
    from ..utils.helpers import enforce_reciprocity_and_rowsum
    from .distribute import backfill_reciprocity, mesh_area

    part, n_parts = jax.process_index(), jax.process_count()
    local = view_factor_matrix_partition(
        meshes, params, n_parts=n_parts, part=part, prepared=prepared,
        mesh=mesh, half_matrix=bool(params.reciprocity),
    )
    merged = merge_vf_matrix(_exchange_rows(local))
    for name, _, _ in meshes:
        merged.setdefault(name, {})

    if params.reciprocity:
        backfill_reciprocity(merged, meshes)
    if params.enforce_reciprocity_rowsum:
        areas = [mesh_area(V, F) for _, V, F in meshes]
        enforce_reciprocity_and_rowsum(merged, meshes, areas)
    return merged


def view_factor_sky_multihost(
    meshes: List[Mesh],
    params,
    *,
    prepared: Optional[PreparedSolver] = None,
    mesh=None,
) -> VFDict:
    """Sky view factors distributed over all JAX processes.

    Sky rows are independent per emitter, so the merged result is IDENTICAL
    to the single-process :func:`raystrack_tpu.view_factor_to_tregenza_sky`
    for any process count.
    """
    import jax

    from ..io import merge_vf_matrix

    part, n_parts = jax.process_index(), jax.process_count()
    local = view_factor_sky_partition(
        meshes, params, n_parts=n_parts, part=part, prepared=prepared, mesh=mesh
    )
    merged = merge_vf_matrix(_exchange_rows(local))
    sky_keys = (
        [f"Sky_Patch_{i}" for i in range(1, 146)]
        if getattr(params, "discrete", False)
        else ["Sky"]
    )
    for name, _, _ in meshes:
        merged.setdefault(name, {k: 0.0 for k in sky_keys})
    return merged


def view_factor_workflow_multihost(
    meshes: List[Mesh],
    matrix_params,
    sky_params,
    *,
    prepared: Optional[PreparedSolver] = None,
    mesh=None,
) -> Tuple[VFDict, VFDict]:
    """Shared-ray (matrix + sky) solve distributed over all JAX processes.

    Mirrors :func:`view_factor_matrix_multihost`: per-worker partitions with
    the half-matrix skip kept on, transpose back-fill after the merge —
    identical to the single-process ``view_factor_matrix_and_sky`` for any
    process count.
    """
    import jax

    from ..io import merge_vf_matrix
    from .distribute import backfill_reciprocity

    part, n_parts = jax.process_index(), jax.process_count()
    local_vf, local_sky = view_factor_workflow_partition(
        meshes, matrix_params, sky_params, n_parts=n_parts, part=part,
        prepared=prepared, mesh=mesh,
        half_matrix=bool(matrix_params.reciprocity),
    )
    gathered = _exchange_rows({"vf": local_vf, "sky": local_sky})
    vf_merged = merge_vf_matrix([g["vf"] for g in gathered])
    sky_merged = merge_vf_matrix([g["sky"] for g in gathered])
    sky_keys = (
        [f"Sky_Patch_{i}" for i in range(1, 146)]
        if getattr(sky_params, "discrete", False)
        else ["Sky"]
    )
    for name, _, _ in meshes:
        vf_merged.setdefault(name, {})
        sky_merged.setdefault(name, {k: 0.0 for k in sky_keys})
    if matrix_params.reciprocity:
        backfill_reciprocity(vf_merged, meshes)
    return vf_merged, sky_merged


__all__ = [
    "initialize",
    "view_factor_matrix_multihost",
    "view_factor_sky_multihost",
    "view_factor_workflow_multihost",
]
