"""Standalone worker for the two-process multi-host smoke test.

Launched by tests/test_multihost.py as
``python _multihost_worker.py <coordinator> <num_processes> <process_id> <out>``.
Initializes the JAX distributed runtime on the CPU backend, runs the
distributed full-scene solve, and writes the merged matrix to ``out`` so the
parent can assert every process produced the identical result.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/raystrack_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402


def scene():
    def square(name, size, z, normal=1, center=(0.0, 0.0)):
        cx, cy = center
        h = size / 2.0
        V = np.array(
            [[cx - h, cy - h, z], [cx + h, cy - h, z],
             [cx + h, cy + h, z], [cx - h, cy + h, z]], np.float32,
        )
        F = (np.array([[0, 1, 2], [0, 2, 3]], np.int32) if normal >= 0
             else np.array([[0, 2, 1], [0, 3, 2]], np.int32))
        return name, V, F

    return [
        square("ground", 2.0, 0.0, normal=+1),
        square("mid", 1.5, 0.6, normal=-1, center=(0.4, 0.1)),
        square("top", 3.0, 1.2, normal=-1),
    ]


def main() -> int:
    coordinator, num_processes, process_id, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    from raystrack_tpu import MatrixParams, SkyParams
    from raystrack_tpu.parallel import (
        initialize,
        view_factor_matrix_multihost,
        view_factor_sky_multihost,
    )

    pid, count = initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert (pid, count) == (process_id, num_processes), (pid, count)

    params = MatrixParams(
        samples=8, rays=64, seed=4, device="cpu", bvh="off",
        max_iters=6, min_iters=3, tol=1e-3, reciprocity=True,
    )
    merged = view_factor_matrix_multihost(scene(), params)
    sky_params = SkyParams(
        samples=8, rays=64, seed=4, device="cpu", bvh="off",
        max_iters=3, min_iters=2, tol=1e-3,
    )
    sky = view_factor_sky_multihost(scene(), sky_params)
    Path(out).write_text(
        json.dumps({"matrix": merged, "sky": sky}, sort_keys=True),
        encoding="utf-8",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
