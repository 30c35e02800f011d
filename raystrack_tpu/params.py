"""Solver parameter dataclasses.

API-compatible with the reference implementation's ``MatrixParams`` /
``SkyParams`` (reference: src/raystrack/params.py:7-129). The CUDA-specific
fields (``cuda_async``, ``gpu_raygen``) are accepted for drop-in compatibility
but are vestigial on TPU: XLA dispatch is asynchronous by construction and
rays are always generated on device inside the fused solve step.
"""
from __future__ import annotations

from dataclasses import asdict, dataclass
from typing import Any, Dict


@dataclass
class MatrixParams:
    """Configuration for scene-to-scene view-factor solves.

    Parameters
    ----------
    samples : int
        Quasi-Monte Carlo sample density; the emission grid per emitter is
        ``g = max(4, ceil(sqrt(area * samples)))`` per side.
    rays : int
        Rays per grid cell.
    seed : int
        Base RNG seed. Each emitter/iteration derives its own sub-seed
        (``seed + emitter_index + iteration``).
    bvh : {"auto", "off", "builtin"}
        Acceleration-structure toggle. On TPU the intersection kernel is a
        tiled all-pairs sweep that is compute-optimal below ~1e5 triangles;
        ``builtin`` additionally enables host-side triangle-tile AABB culling
        for large scenes. ``auto`` enables it at >= 512 faces.
    device : {"auto", "tpu", "gpu", "cpu"}
        Execution backend. ``auto`` picks the default JAX backend (TPU when
        present). ``tpu``/``gpu`` require an accelerator. ``cpu`` forces the
        JAX CPU backend.
    cuda_async : bool
        Vestigial (kept for API compatibility); XLA dispatch is always async.
    gpu_raygen : bool
        Vestigial; rays are always generated on device.
    max_iters : int
        Maximum number of Monte-Carlo iterations.
    tol : float
        Convergence tolerance. Interpretation depends on ``tol_mode``.
    tol_mode : {"delta", "stderr"}
        - "delta": stop when successive cumulative estimates change by < tol.
        - "stderr": stop when per-iteration replicate standard error is <= tol.
    min_iters : int
        Minimum number of Monte-Carlo iterations before a convergence check.
    convergence_interval : int
        Check convergence every N iterations. Larger values reduce host
        round-trips (the solve runs in device-side iteration chunks).
    reciprocity : bool
        Also compute inverse view factors via reciprocity.
    enforce_reciprocity_rowsum : bool
        After computation, enforce reciprocity and make each row sum to 1
        using symmetric diagonal scaling.
    flip_faces : bool
        If True, flip emitter triangle winding during emission sampling.
    """

    samples: int = 16
    rays: int = 128
    seed: int = 1
    bvh: str = "auto"
    device: str = "auto"
    cuda_async: bool = True
    gpu_raygen: bool = True
    max_iters: int = 100
    tol: float = 1e-4
    tol_mode: str = "stderr"
    min_iters: int = 5
    convergence_interval: int = 1
    reciprocity: bool = True
    enforce_reciprocity_rowsum: bool = False
    flip_faces: bool = False

    def as_dict(self) -> Dict[str, Any]:
        return asdict(self)

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "MatrixParams":
        return cls(**data)


@dataclass
class SkyParams:
    """Configuration for sky view-factor solves.

    Shares the sampling/convergence fields with :class:`MatrixParams`; see
    there for details.

    Parameters
    ----------
    discrete : bool
        If True, return 145 Tregenza directional patches. If False, return a
        single merged "Sky" entry (fraction of rays that miss all geometry
        with an upward direction).
    """

    samples: int = 16
    rays: int = 128
    seed: int = 1
    bvh: str = "auto"
    device: str = "auto"
    cuda_async: bool = True
    gpu_raygen: bool = True
    max_iters: int = 100
    tol: float = 1e-4
    tol_mode: str = "stderr"
    min_iters: int = 5
    convergence_interval: int = 1
    discrete: bool = False

    def as_dict(self) -> Dict[str, Any]:
        return asdict(self)

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "SkyParams":
        return cls(**data)


__all__ = ["MatrixParams", "SkyParams"]
