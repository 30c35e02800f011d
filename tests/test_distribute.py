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
