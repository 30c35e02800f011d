"""Shared harness for the validation suite.

The methodology mirrors the reference suite (pinned stderr tolerance 1e-4,
min 40 / max 500 iterations, iteration counts scraped from the injectable
progress log — reference: validation/common_validation.py), while the code
is organized around three small pieces:

- quad/fan mesh builders expressed through one corner-list helper,
- a solver runner that swaps the log hook and parses ``[name] K iter``,
- a line-assembling result writer (flat text committed under ``results/``).
"""
from __future__ import annotations

import dataclasses
import json, math, re, sys  # noqa: E401
import pathlib
from typing import Dict, Iterable, List, Tuple

import numpy as np

_HERE = pathlib.Path(__file__).resolve()
REPO_ROOT = _HERE.parents[1]
RESULTS_ROOT = _HERE.parent / "results"

if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

Mesh = Tuple[str, np.ndarray, np.ndarray]

# Pinned validation configuration (identical to the reference suite's).
PINNED = dict(seed=11, tol=1.0e-4, tol_mode="stderr", min_iters=40)


@dataclasses.dataclass(frozen=True)
class SolverRun:
    vf: Dict[str, Dict[str, float]]      # solver output row per emitter
    iterations: Dict[str, int]           # per-emitter iteration counts (log)
    converged_before_max: bool           # every traced emitter stopped early
    max_iters: int                       # run configuration, echoed into
    min_iters: int                       # the committed result files
    tol: float
    tol_mode: str


# ---------------------------------------------------------------------------
# Geometry fixtures
# ---------------------------------------------------------------------------


def _two_triangle_quad(name: str, corners, flip: bool) -> Mesh:
    """Mesh from four CCW corners split along the 0-2 diagonal."""
    V = np.asarray(corners, dtype=np.float32)
    F = np.asarray([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    if flip:
        F = F[:, [0, 2, 1]].copy()
    return name, V, F


def rectangle_xy(name: str, width: float, depth: float, z: float, *,
                 normal: int = 1,
                 center: Tuple[float, float] = (0.0, 0.0)) -> Mesh:
    """Axis-aligned rectangle in a z=const plane; normal +Z or -Z."""
    cx, cy = center
    hx, hy = width / 2.0, depth / 2.0
    corners = [
        (cx - hx, cy - hy, z),
        (cx + hx, cy - hy, z),
        (cx + hx, cy + hy, z),
        (cx - hx, cy + hy, z),
    ]
    return _two_triangle_quad(name, corners, normal < 0)


def rectangle_yz(name: str, length_y: float, height_z: float, x: float, *,
                 normal: int = 1, y_center: float = 0.0,
                 z_min: float = 0.0) -> Mesh:
    """Axis-aligned rectangle in an x=const plane; normal +X or -X."""
    hy = length_y / 2.0
    corners = [
        (x, y_center - hy, z_min),
        (x, y_center + hy, z_min),
        (x, y_center + hy, z_min + height_z),
        (x, y_center - hy, z_min + height_z),
    ]
    return _two_triangle_quad(name, corners, normal < 0)


def disk_xy(name: str, radius: float, z: float, *, segments: int = 128,
            normal: int = 1) -> Mesh:
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

_ITER_LINE = re.compile(r"\[\s*(?P<name>[^\]]+?)\s*\]\s+(?P<iters>\d+)\s+iter")


def _scrape_iterations(messages: Iterable[str]) -> Dict[str, int]:
    found: Dict[str, int] = {}
    for line in messages:
        hit = _ITER_LINE.search(line)
        if hit:
            found[hit.group("name")] = int(hit.group("iters"))
    return found


def run_solver(meshes: List[Mesh], *, samples: int, rays: int,
               max_iters: int, seed: int = PINNED["seed"],
               tol: float = PINNED["tol"],
               min_iters: int = PINNED["min_iters"],
               device: str = "auto") -> SolverRun:
    import raystrack_tpu.solver as solver_mod
    from raystrack_tpu import MatrixParams, view_factor_matrix

    config = dict(PINNED, samples=samples, rays=rays, seed=seed, tol=tol,
                  min_iters=min_iters, max_iters=max_iters, device=device)
    # fixed execution setup: deterministic accel path, per-iteration checks,
    # raw (unenforced) rows so analytic comparisons see the MC estimate
    config.update(bvh="builtin", convergence_interval=1, reciprocity=False,
                  enforce_reciprocity_rowsum=False, flip_faces=False)

    captured: List[str] = []
    previous_log = solver_mod._log
    solver_mod._log = captured.append
    try:
        vf = view_factor_matrix(meshes, params=MatrixParams(**config))
    finally:
        solver_mod._log = previous_log

    iterations = _scrape_iterations(captured)
    traced = [count for count in iterations.values() if count > 0]
    return SolverRun(vf=vf, iterations=iterations,
                     converged_before_max=bool(traced) and max(traced) < max_iters,
                     max_iters=max_iters, min_iters=min_iters, tol=tol,
                     tol_mode=config["tol_mode"])


# ---------------------------------------------------------------------------
# Result helpers
# ---------------------------------------------------------------------------


_DIR_SUFFIX = re.compile(r"(_front|_back)$")


def row_front_to(row: Dict[str, float], receiver: str) -> float:
    """Front-direction view factor to ``receiver`` (bare key as fallback)."""
    value = row.get(receiver + "_front")
    return float(row.get(receiver, 0.0) if value is None else value)


def totals_by_base(row: Dict[str, float]) -> Dict[str, float]:
    """Fold _front/_back keys of one row into per-base-name totals."""
    totals: Dict[str, float] = {}
    for key, value in row.items():
        base = _DIR_SUFFIX.sub("", key)
        totals[base] = totals.get(base, 0.0) + float(value)
    return totals


def base_matrix(vf: Dict[str, Dict[str, float]]) -> Dict[str, Dict[str, float]]:
    return {sender: totals_by_base(row) for sender, row in vf.items()}


def face_areas(V: np.ndarray, F: np.ndarray) -> np.ndarray:
    """Per-triangle areas of one mesh."""
    e1 = V[F[:, 1]].astype(np.float64) - V[F[:, 0]].astype(np.float64)
    e2 = V[F[:, 2]].astype(np.float64) - V[F[:, 0]].astype(np.float64)
    return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)


def aggregate_per_face_rows(raw: Dict[str, Dict[str, float]],
                            meshes: List[Mesh]) -> Dict[str, Dict[str, float]]:
    """Area-weighted fold of per-FACE view-factor rows into per-MESH rows.

    External tools (NIST View3D) report one row per triangle, keyed
    ``{mesh}_{k}`` with 1-based face index k in mesh order. A mesh's view
    factor to any receiver is the area-weighted mean of its faces' rows,
    F(mesh->R) = sum_k (A_k / A_mesh) * F(face_k->R); receiver faces simply
    sum into their base mesh (reference: validation/common_validation.py:
    281-312, aggregate_view3d_faces).
    """
    out: Dict[str, Dict[str, float]] = {}
    for name, V, F in meshes:
        areas = face_areas(V, F)
        total = float(areas.sum())
        w = (areas / total if total > 0.0
             else np.full(len(areas), 1.0 / max(1, len(areas))))
        row: Dict[str, float] = {}
        for k, wk in enumerate(w, start=1):
            for rface, value in raw.get(f"{name}_{k}", {}).items():
                rbase = rface.rsplit("_", 1)[0]
                row[rbase] = row.get(rbase, 0.0) + float(wk) * float(value)
        out[name] = row
    return out


def _dense(matrix: Dict[str, Dict[str, float]], names: List[str]) -> np.ndarray:
    return np.array(
        [[float(matrix.get(s, {}).get(r, 0.0)) for r in names] for s in names]
    )


def max_abs_pair_diff(left: Dict[str, Dict[str, float]],
                      right: Dict[str, Dict[str, float]], *,
                      names: Iterable[str],
                      ) -> Tuple[float, Tuple[str, str], float, float]:
    """Worst |left - right| over the full sender x receiver grid.

    Returns ``(diff, (sender, receiver), left_value, right_value)``.
    """
    name_list = list(names)
    dl, dr = _dense(left, name_list), _dense(right, name_list)
    flat = np.abs(dl - dr).argmax()
    i, j = divmod(int(flat), len(name_list))
    return (
        float(abs(dl[i, j] - dr[i, j])),
        (name_list[i], name_list[j]),
        float(dl[i, j]),
        float(dr[i, j]),
    )


def write_case_result(case_name: str, *, description: str, formula: str,
                      analytical: float, solver_value: float,
                      tolerance: float, settings: Dict[str, object],
                      run: SolverRun | None = None) -> pathlib.Path:
    """Write the flat pass/fail text record for one validation case.

    The layout (value block, settings block, convergence block with
    per-emitter iteration counts) is the committed results format — keep it
    byte-stable across refactors so results stay bitwise reproducible.
    """
    diff = abs(solver_value - analytical)

    def block(title: str, pairs, indent: str) -> List[str]:
        return [title] + [f"{indent}{label}: {value}" for label, value in pairs]

    head = [
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
    ]
    body = block("settings:", settings.items(), "  ")
    if run is not None:
        body += [""] + block(
            "convergence:",
            [
                ("tol_mode", run.tol_mode),
                ("tol", f"{run.tol:.10f}"),
                ("min_iters", run.min_iters),
                ("max_iters", run.max_iters),
                ("converged_before_max", run.converged_before_max),
            ],
            "  ",
        )
        body += block("  iterations:", run.iterations.items(), "    ")

    RESULTS_ROOT.mkdir(parents=True, exist_ok=True)
    path = RESULTS_ROOT / f"{case_name}.txt"
    path.write_text("\n".join(head + body) + "\n", encoding="utf-8")
    return path


def write_json(path: pathlib.Path, data: object) -> pathlib.Path:
    """Write pretty sorted JSON, creating parent directories."""
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = json.dumps(data, indent=2, sort_keys=True)
    path.write_text(payload, encoding="utf-8")
    return path
