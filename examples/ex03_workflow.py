#!/usr/bin/env python3
"""ex03: the outside workflow — scene + sky + rest = 1 per emitter."""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from examples.ex00_street_canyon_geometry import build_street_canyon
from raystrack_tpu import (
    MatrixParams,
    SkyParams,
    save_vf_matrix_json,
    view_factor_outside_workflow,
)


def main(*, out_dir: str | None = None, **overrides):
    """Run the outside workflow on the canyon and save scene/sky outputs.

    ``overrides`` feed the shared sampling config (CI runs this end-to-end
    with tiny sampling); ``out_dir`` redirects the output JSONs.
    """
    meshes = build_street_canyon()
    shared = dict(samples=16, rays=256, seed=3, bvh="auto", device="auto",
                  min_iters=10, max_iters=150, tol=1e-4, tol_mode="stderr")
    shared.update(overrides)
    matrix_params = MatrixParams(**shared, reciprocity=True)
    sky_params = SkyParams(**shared, discrete=False)

    vf_scene, sky_vf, rest_vf = view_factor_outside_workflow(
        meshes, matrix_params=matrix_params, sky_params=sky_params
    )

    print(f"{'Emitter':16s}  {'scene':>8s}  {'sky':>8s}  {'rest':>8s}  {'total':>8s}")
    for name, _, _ in meshes:
        scene_sum = sum(vf_scene.get(name, {}).values())
        sky_sum = sum(sky_vf.get(name, {}).values())
        rest = rest_vf[name]["Rest"]
        print(f"{name:16s}  {scene_sum:8.4f}  {sky_sum:8.4f}  {rest:8.4f}"
              f"  {scene_sum + sky_sum + rest:8.4f}")

    here = Path(out_dir or Path(__file__).resolve().parent)
    print("Saved:", save_vf_matrix_json(vf_scene, str(here / "vf_scene_workflow.json")))
    print("Saved:", save_vf_matrix_json(sky_vf, str(here / "sky_vf_workflow.json")))
    return vf_scene, sky_vf, rest_vf


if __name__ == "__main__":
    main()
