"""The bench city generator's vectorized box assembly is bitwise-stable.

bench._city was vectorized in round 5 (the per-box Python loop blocked
scene generation past ~1e7 triangles); the committed bench calibration
(bench_expected.json hit checksums) and every committed city-curve number
depend on the scene being EXACTLY the one the loop built. This pins the
vectorized assembly against an inline transcription of the original loop
(reference counterpart: the scenes are this repo's own benchmark family;
the reference ships no throughput benches — see SURVEY.md section 6).
"""
import importlib.util
from pathlib import Path

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parent.parent / "bench.py")
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _city_loop(n_tri: int, extent: float = 100.0, seed: int = 0):
    """The original per-box loop, transcribed verbatim."""
    V = np.array([[-extent, -extent, 0], [extent, -extent, 0],
                  [extent, extent, 0], [-extent, extent, 0]], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n_boxes = max(1, (n_tri - 2) // 12)
    rng = np.random.default_rng(seed)
    cx = rng.uniform(-extent, extent, (n_boxes, 2))
    w = rng.uniform(1.0, 4.0, (n_boxes, 2))
    h = rng.uniform(2.0, 25.0, n_boxes)
    box_f = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
                      [0, 4, 5], [0, 5, 1], [1, 5, 6], [1, 6, 2],
                      [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0]], np.int32)
    verts, faces = [], []
    for i in range(n_boxes):
        x0, y0 = cx[i] - w[i]
        x1, y1 = cx[i] + w[i]
        vs = np.array([[x0, y0, 0.05], [x1, y0, 0.05], [x1, y1, 0.05],
                       [x0, y1, 0.05], [x0, y0, h[i]], [x1, y0, h[i]],
                       [x1, y1, h[i]], [x0, y1, h[i]]], np.float32)
        verts.append(vs)
        faces.append(box_f + 8 * i)
    return [("ground", V, F),
            ("city", np.concatenate(verts), np.concatenate(faces))]


def test_city_vectorized_matches_loop_bitwise():
    for n_tri, seed in ((14, 0), (1202, 0), (50_000, 3)):
        got = bench._city(n_tri, seed=seed)
        want = _city_loop(n_tri, seed=seed)
        assert [m[0] for m in got] == [m[0] for m in want]
        for (_, gv, gf), (_, wv, wf) in zip(got, want):
            assert gv.dtype == wv.dtype and gf.dtype == wf.dtype
            assert gv.shape == wv.shape and gf.shape == wf.shape
            assert np.array_equal(gv, wv)
            assert np.array_equal(gf, wf)
