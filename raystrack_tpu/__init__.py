"""raystrack_tpu — a TPU-native quasi-Monte-Carlo view-factor engine.

Computes radiative view factors F(i->j) between named triangle meshes
``(name, V, F)`` plus sky view factors (merged or 145 Tregenza patches),
with the entire QMC solve — stratified Halton ray generation, Möller-
Trumbore intersection, per-surface hit reduction — running as fused
jitted/XLA (and Pallas) device programs, sharded across TPU chips via a
device mesh with ICI psum reductions.

Public surface matches the reference engine (philip-ba/raystrack,
src/raystrack/__init__.py:1-30) so existing callers can switch imports.
"""
from .params import MatrixParams, SkyParams
from .solver import (
    view_factor_matrix,
    view_factor,
    view_factor_to_tregenza_sky,
    view_factor_matrix_and_sky,
    outside_workflow_shareable,
    clear_prepared_cache,
)
from .api import view_factor_outside_workflow
from .prepared import PreparedSolver
from .io import (
    VFMatrixStreamWriter,
    save_vf_matrix_json,
    load_vf_matrix_json,
    save_meshes_json,
    load_meshes_json,
    merge_vf_matrix,
)
from .obj import load_meshes_obj, save_meshes_obj
from .ply import load_meshes_ply, save_mesh_ply

__version__ = "0.1.0"

__all__ = [
    "view_factor_matrix",
    "view_factor",
    "view_factor_to_tregenza_sky",
    "view_factor_matrix_and_sky",
    "view_factor_outside_workflow",
    "outside_workflow_shareable",
    "MatrixParams",
    "SkyParams",
    "PreparedSolver",
    "clear_prepared_cache",
    "save_vf_matrix_json",
    "VFMatrixStreamWriter",
    "load_vf_matrix_json",
    "save_meshes_json",
    "load_meshes_json",
    "load_meshes_obj",
    "save_meshes_obj",
    "load_meshes_ply",
    "save_mesh_ply",
    "merge_vf_matrix",
]
