"""Shared harness for the validation suite.

Runs the solver with the pinned validation configuration (stderr tolerance
1e-4, min 40 / max 500 iterations — matching the reference suite's settings,
reference: validation/common_validation.py:142-158), captures per-emitter
iteration counts from the injectable progress log, and writes flat pass/fail
result files into ``validation/results/``.
"""
from __future__ import annotations

import json
import math
import re
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterable, List, Tuple

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
RESULTS_ROOT = Path(__file__).resolve().parent / "results"

if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

Mesh = Tuple[str, np.ndarray, np.ndarray]


@dataclass(frozen=True)
class SolverRun:
    vf: Dict[str, Dict[str, float]]
    iterations: Dict[str, int]
    converged_before_max: bool
    max_iters: int
    min_iters: int
    tol: float
    tol_mode: str


# ---------------------------------------------------------------------------
# Geometry fixtures
# ---------------------------------------------------------------------------


def rectangle_xy(
    name: str,
    width: float,
    depth: float,
    z: float,
    *,
    normal: int = 1,
    center: Tuple[float, float] = (0.0, 0.0),
) -> Mesh:
    """Axis-aligned rectangle in a z=const plane; normal +Z or -Z."""
    cx, cy = center
    x0, x1 = cx - width / 2.0, cx + width / 2.0
    y0, y1 = cy - depth / 2.0, cy + depth / 2.0
    V = np.asarray(
        [[x0, y0, z], [x1, y0, z], [x1, y1, z], [x0, y1, z]], dtype=np.float32
    )
    F = np.asarray([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    if normal < 0:
        F = F[:, [0, 2, 1]].copy()
    return name, V, F


def rectangle_yz(
    name: str,
    length_y: float,
    height_z: float,
    x: float,
    *,
    normal: int = 1,
    y_center: float = 0.0,
    z_min: float = 0.0,
) -> Mesh:
    """Axis-aligned rectangle in an x=const plane; normal +X or -X."""
    y0, y1 = y_center - length_y / 2.0, y_center + length_y / 2.0
    z0, z1 = z_min, z_min + height_z
    V = np.asarray(
        [[x, y0, z0], [x, y1, z0], [x, y1, z1], [x, y0, z1]], dtype=np.float32
    )
    F = np.asarray([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    if normal < 0:
        F = F[:, [0, 2, 1]].copy()
    return name, V, F


def disk_xy(
    name: str, radius: float, z: float, *, segments: int = 128, normal: int = 1
) -> Mesh:
    """Triangle-fan disc in a z=const plane."""
    if segments < 8:
        raise ValueError("segments must be >= 8")
    angles = 2.0 * math.pi * np.arange(segments) / segments
    rim = np.stack(
        [radius * np.cos(angles), radius * np.sin(angles), np.full(segments, z)],
        axis=1,
    )
    V = np.concatenate([[[0.0, 0.0, z]], rim]).astype(np.float32)
    a = np.arange(1, segments + 1, dtype=np.int32)
    b = np.concatenate([np.arange(2, segments + 1), [1]]).astype(np.int32)
    zeros = np.zeros(segments, dtype=np.int32)
    F = np.stack([zeros, a, b] if normal >= 0 else [zeros, b, a], axis=1)
    return name, V.astype(np.float32), F.astype(np.int32)


# ---------------------------------------------------------------------------
# Solver runner with log capture
# ---------------------------------------------------------------------------


def run_solver(
    meshes: List[Mesh],
    *,
    samples: int,
    rays: int,
    max_iters: int,
    seed: int = 11,
    tol: float = 1.0e-4,
    min_iters: int = 40,
    device: str = "auto",
) -> SolverRun:
    import raystrack_tpu.solver as solver_mod
    from raystrack_tpu import MatrixParams, view_factor_matrix

    log_messages: List[str] = []
    old_log = solver_mod._log
    solver_mod._log = log_messages.append
    params = MatrixParams(
        samples=samples,
        rays=rays,
        seed=seed,
        bvh="builtin",
        device=device,
        max_iters=max_iters,
        min_iters=min_iters,
        tol=tol,
        tol_mode="stderr",
        convergence_interval=1,
        reciprocity=False,
        enforce_reciprocity_rowsum=False,
        flip_faces=False,
    )
    try:
        vf = view_factor_matrix(meshes, params=params)
    finally:
        solver_mod._log = old_log

    pattern = re.compile(r"\[\s*(?P<name>[^\]]+?)\s*\]\s+(?P<iters>\d+)\s+iter")
    iterations = {
        m.group("name"): int(m.group("iters"))
        for m in map(pattern.search, log_messages)
        if m
    }
    active = [v for v in iterations.values() if v > 0]
    return SolverRun(
        vf=vf,
        iterations=iterations,
        converged_before_max=bool(active) and all(v < max_iters for v in active),
        max_iters=max_iters,
        min_iters=min_iters,
        tol=tol,
        tol_mode="stderr",
    )


# ---------------------------------------------------------------------------
# Result helpers
# ---------------------------------------------------------------------------


def row_front_to(row: Dict[str, float], receiver: str) -> float:
    return float(row.get(f"{receiver}_front", row.get(receiver, 0.0)))


def totals_by_base(row: Dict[str, float]) -> Dict[str, float]:
    out: Dict[str, float] = {}
    for key, value in row.items():
        base = key[:-6] if key.endswith("_front") else (
            key[:-5] if key.endswith("_back") else key
        )
        out[base] = out.get(base, 0.0) + float(value)
    return out


def base_matrix(vf: Dict[str, Dict[str, float]]) -> Dict[str, Dict[str, float]]:
    return {sender: totals_by_base(row) for sender, row in vf.items()}


def max_abs_pair_diff(
    left: Dict[str, Dict[str, float]],
    right: Dict[str, Dict[str, float]],
    *,
    names: Iterable[str],
) -> Tuple[float, Tuple[str, str], float, float]:
    worst = (-1.0, ("", ""), 0.0, 0.0)
    name_list = list(names)
    for sender in name_list:
        for receiver in name_list:
            lv = float(left.get(sender, {}).get(receiver, 0.0))
            rv = float(right.get(sender, {}).get(receiver, 0.0))
            diff = abs(lv - rv)
            if diff > worst[0]:
                worst = (diff, (sender, receiver), lv, rv)
    return worst


def write_case_result(
    case_name: str,
    *,
    description: str,
    formula: str,
    analytical: float,
    solver_value: float,
    tolerance: float,
    settings: Dict[str, object],
    run: SolverRun | None = None,
) -> Path:
    RESULTS_ROOT.mkdir(parents=True, exist_ok=True)
    diff = abs(solver_value - analytical)
    lines = [
        f"case: {case_name}",
        f"description: {description}",
        f"formula: {formula}",
        "",
        f"analytical:    {analytical:.10f}",
        f"raystrack_tpu: {solver_value:.10f}",
        f"abs_diff:      {diff:.10f}",
        f"tolerance:     {tolerance:.10f}",
        f"passed:        {diff <= tolerance}",
        "",
        "settings:",
    ]
    lines += [f"  {k}: {v}" for k, v in settings.items()]
    if run is not None:
        lines += [
            "",
            "convergence:",
            f"  tol_mode: {run.tol_mode}",
            f"  tol: {run.tol:.10f}",
            f"  min_iters: {run.min_iters}",
            f"  max_iters: {run.max_iters}",
            f"  converged_before_max: {run.converged_before_max}",
            "  iterations:",
        ]
        lines += [f"    {name}: {iters}" for name, iters in run.iterations.items()]
    path = RESULTS_ROOT / f"{case_name}.txt"
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return path


def write_json(path: Path, data: object) -> Path:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(data, indent=2, sort_keys=True), encoding="utf-8")
    return path
