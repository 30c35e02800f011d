"""Multi-process (DCN-level) execution: two real processes over
jax.distributed must reproduce the single-process solve exactly.

This is the smoke for the SURVEY §5 "distributed communication backend"
equivalent: jax.distributed.initialize + emitter partitioning + all-gather
merge (parallel/multihost.py). Runbook: docs/MULTIHOST.md.
"""
import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from raystrack_tpu import MatrixParams, view_factor_matrix
from raystrack_tpu.parallel import (
    backfill_reciprocity,
    mesh_area,
    partition_emitters,
    view_factor_matrix_partition,
)

from tests._multihost_worker import scene

MESHES = scene()
PARAMS = MatrixParams(
    samples=8, rays=64, seed=4, device="cpu", bvh="off",
    max_iters=6, min_iters=3, tol=1e-3, reciprocity=True,
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_half_matrix_partition_backfill_matches_single_process():
    """Partitioned half-matrix solves + post-merge back-fill == the plain
    reciprocity solve, bitwise (same RNG stream per emitter)."""
    from raystrack_tpu import merge_vf_matrix

    single = view_factor_matrix(MESHES, params=PARAMS)
    parts = [
        view_factor_matrix_partition(
            MESHES, PARAMS, n_parts=2, part=p, half_matrix=True
        )
        for p in range(2)
    ]
    merged = merge_vf_matrix(parts)
    for name, _, _ in MESHES:
        merged.setdefault(name, {})
    backfill_reciprocity(merged, MESHES)
    assert merged == single


def test_mesh_area_matches_emitter_area():
    from raystrack_tpu.prepared import prepare_emitters

    emitters = prepare_emitters(MESHES, samples=8, rays=64, flip_faces=False)
    for (name, V, F), em in zip(MESHES, emitters):
        assert mesh_area(V, F) == pytest.approx(em.total_area, rel=1e-6)


def test_partition_emitters_strided():
    assert partition_emitters(7, 3, 0) == [0, 3, 6]
    assert partition_emitters(7, 3, 2) == [2, 5]
    with pytest.raises(ValueError):
        partition_emitters(7, 3, 3)


def test_two_process_distributed_solve(tmp_path):
    """Launch two real OS processes with jax.distributed over localhost;
    both must produce the identical merged matrix, equal to single-process."""
    worker = Path(__file__).parent / "_multihost_worker.py"
    coordinator = f"127.0.0.1:{_free_port()}"
    outs = [tmp_path / f"proc{p}.json" for p in range(2)]

    # Warm the shared persistent compilation cache BEFORE launching: the two
    # workers' partitions compile different shape sets, and asymmetric cold
    # compiles can outlast the distributed-shutdown barrier.
    from raystrack_tpu import SkyParams, view_factor_to_tregenza_sky

    single = view_factor_matrix(MESHES, params=PARAMS)
    sky_single = view_factor_to_tregenza_sky(
        MESHES,
        params=SkyParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                         max_iters=3, min_iters=2, tol=1e-3),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, "2", str(p), str(outs[p])],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for p in range(2)
    ]
    logs = [p.communicate(timeout=480)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    results = [json.loads(o.read_text()) for o in outs]
    assert results[0] == results[1]
    # JSON round-trip preserves float64 repr exactly
    assert results[0]["matrix"] == json.loads(json.dumps(single))
    assert results[0]["sky"] == json.loads(json.dumps(sky_single))
