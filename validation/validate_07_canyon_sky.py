#!/usr/bin/env python3
"""Case 07: canyon road sky view factor vs the analytic complement.

The road's emission hemisphere sees only the facade panels and sky, so its
merged sky view factor is exactly ``1 - sum(F(road -> panels))`` with the
panel view factors from the analytic canyon ground truth. Also checks that
the 145 Tregenza patches of the discrete solve sum to the merged value
(both solves share the deterministic sample stream).

This case extends the reference suite, which never validates the sky
solver against a closed form (reference tests only cross-check matrix
outputs; sky is exercised by examples alone).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from analytic import canyon_ground_truth
from common import RESULTS_ROOT
from examples.ex00_street_canyon_geometry import build_street_canyon


def main() -> None:
    from raystrack_tpu import SkyParams, view_factor_to_tregenza_sky

    RESULTS_ROOT.mkdir(parents=True, exist_ok=True)
    meshes = build_street_canyon()
    truth = canyon_ground_truth()
    sky_analytic = 1.0 - sum(truth["road"].values())

    base = dict(
        samples=8, rays=512, seed=17, bvh="builtin", device="auto",
        tol=1e-4, tol_mode="stderr", min_iters=40, max_iters=500,
    )
    merged = view_factor_to_tregenza_sky(meshes, params=SkyParams(**base))
    discrete = view_factor_to_tregenza_sky(
        meshes, params=SkyParams(**base, discrete=True)
    )

    got = merged["road"]["Sky"]
    got_patches = sum(discrete["road"].values())
    diff = abs(got - sky_analytic)
    patch_diff = abs(got_patches - got)
    tolerance = 1.0e-4
    passed = diff <= tolerance and patch_diff <= tolerance

    lines = [
        "case: 07_canyon_sky",
        "description: Road merged sky VF vs 1 - sum(analytic F(road->panels));",
        "  discrete Tregenza patches must sum to the merged value.",
        "",
        f"analytical_sky: {sky_analytic:.10f}",
        f"merged_sky:     {got:.10f}",
        f"abs_diff:       {diff:.10f}",
        f"patch_sum:      {got_patches:.10f}",
        f"patch_vs_merged:{patch_diff:.10f}",
        f"tolerance:      {tolerance:.10f}",
        f"passed:         {passed}",
        "",
        "settings:",
    ] + [f"  {k}: {v}" for k, v in base.items()]
    path = RESULTS_ROOT / "07_canyon_sky.txt"
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(path)


if __name__ == "__main__":
    main()
