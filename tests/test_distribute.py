"""Emitter-partition distribution: merged workers equal one full solve."""
import numpy as np

from raystrack_tpu import MatrixParams, merge_vf_matrix, view_factor_matrix
from raystrack_tpu.parallel.distribute import (
    partition_emitters,
    view_factor_matrix_partition,
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
    _square("mid", 1.5, 0.6, normal=-1, center=(0.4, 0.1)),
    _square("top", 3.0, 1.2, normal=-1),
]

PARAMS = MatrixParams(
    samples=8, rays=64, seed=4, device="cpu", bvh="off",
    max_iters=6, min_iters=3, tol=1e-3, reciprocity=False,
)


def test_partition_indices():
    assert partition_emitters(11, 3, 0) == [0, 3, 6, 9]
    assert partition_emitters(11, 3, 1) == [1, 4, 7, 10]
    assert partition_emitters(11, 3, 2) == [2, 5, 8]
    # every emitter appears exactly once across parts
    seen = sorted(sum((partition_emitters(11, 3, p) for p in range(3)), []))
    assert seen == list(range(11))


def test_merged_partitions_equal_full_solve():
    full = view_factor_matrix(MESHES, params=PARAMS)
    parts = [
        view_factor_matrix_partition(MESHES, PARAMS, n_parts=2, part=p)
        for p in range(2)
    ]
    merged = merge_vf_matrix(parts)
    # full solve initializes empty rows for every mesh; workers only emit
    # their own rows — align before comparing
    for name, row in merged.items():
        assert full[name] == row
    assert set(merged) == {n for n, _, _ in MESHES if full[n]} | set(merged)
    # all emitters covered
    assert set(merged.keys()) == {n for n, _, _ in MESHES}


def test_sky_partitions_equal_full_solve():
    from raystrack_tpu import SkyParams, view_factor_to_tregenza_sky
    from raystrack_tpu.parallel.distribute import view_factor_sky_partition

    for discrete in (False, True):
        sp = SkyParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                       max_iters=5, min_iters=2, tol=1e-3, discrete=discrete)
        full = view_factor_to_tregenza_sky(MESHES, params=sp)
        parts = [
            view_factor_sky_partition(MESHES, sp, n_parts=2, part=p)
            for p in range(2)
        ]
        merged = merge_vf_matrix(parts)
        assert merged == full


def test_workflow_partitions_equal_full_solve():
    """Merged shared-ray partitions (half-matrix kept on, post-merge
    back-fill) reproduce the single-process workflow exactly."""
    from raystrack_tpu import SkyParams, view_factor_matrix_and_sky
    from raystrack_tpu.parallel.distribute import (
        backfill_reciprocity,
        view_factor_workflow_partition,
    )

    mp = MatrixParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                      max_iters=6, min_iters=2, tol=1e-3, reciprocity=True)
    sp = SkyParams(samples=8, rays=64, seed=4, device="cpu", bvh="off",
                   max_iters=5, min_iters=2, tol=1e-3)
    vf_full, sky_full = view_factor_matrix_and_sky(
        MESHES, matrix_params=mp, sky_params=sp
    )
    vf_parts, sky_parts = [], []
    for p in range(2):
        vf_p, sky_p = view_factor_workflow_partition(
            MESHES, mp, sp, n_parts=2, part=p, half_matrix=True
        )
        vf_parts.append(vf_p)
        sky_parts.append(sky_p)
    vf_merged = merge_vf_matrix(vf_parts)
    for name, _, _ in MESHES:
        vf_merged.setdefault(name, {})
    backfill_reciprocity(vf_merged, MESHES)
    assert vf_merged == vf_full
    assert merge_vf_matrix(sky_parts) == sky_full


def test_workflow_partition_rejects_incompatible_params():
    import pytest

    from raystrack_tpu import SkyParams
    from raystrack_tpu.parallel.distribute import view_factor_workflow_partition

    mp = MatrixParams(samples=8, rays=64, seed=4, device="cpu")
    sp = SkyParams(samples=4, rays=64, seed=4, device="cpu")  # differs
    with pytest.raises(ValueError, match="not compatible"):
        view_factor_workflow_partition(MESHES, mp, sp, n_parts=2, part=0)
