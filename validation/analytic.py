"""Closed-form and quadrature ground truths for the validation suite.

Sources: the classical radiation view-factor catalog (equal parallel plates,
coaxial discs, differential patch to disc, perpendicular plates with a
common edge) plus two generic tools that cover every unobstructed pair in
the street-canyon scene:

- ``parallel_rectangles``: contour-integral closed form for two parallel
  rectangles with arbitrary in-plane extents (16-term corner superposition),
- ``gauss_legendre_pair``: direct 4-D Gauss-Legendre quadrature of the
  view-factor double integral for smooth (non-touching) pairs,
- ``perpendicular_common_edge`` + difference algebra for touching pairs.

Everything is float64 NumPy; no solver code is exercised here.
"""
from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# Catalog closed forms
# ---------------------------------------------------------------------------


def equal_parallel_squares(W: float, H: float) -> float:
    """Two identical coaxial parallel squares, side W, distance H."""
    w = W / H
    x = math.sqrt(1.0 + w * w)
    y = x * math.atan(w / x) - math.atan(w)
    return (math.log(x**4 / (1.0 + 2.0 * w * w)) + 4.0 * w * y) / (math.pi * w * w)


def equal_parallel_rectangles(W1: float, W2: float, H: float) -> float:
    """Two identical coaxial parallel W1 x W2 rectangles, distance H."""
    x = W1 / H
    y = W2 / H
    x1 = math.sqrt(1.0 + x * x)
    y1 = math.sqrt(1.0 + y * y)
    term_log = math.log((x1 * x1 * y1 * y1) / (x1 * x1 + y1 * y1 - 1.0))
    term_x = 2.0 * x * (y1 * math.atan(x / y1) - math.atan(x))
    term_y = 2.0 * y * (x1 * math.atan(y / x1) - math.atan(y))
    return (term_log + term_x + term_y) / (math.pi * x * y)


def equal_coaxial_discs(R: float, H: float) -> float:
    """Two identical coaxial parallel discs of radius R, distance H."""
    r = R / H
    return 1.0 + (1.0 - math.sqrt(1.0 + 4.0 * r * r)) / (2.0 * r * r)


def patch_to_disc(R: float, H: float) -> float:
    """Differential patch to a parallel concentric disc of radius R."""
    h = H / R
    return 1.0 / (1.0 + h * h)


def square_to_adjacent_rectangle(H: float, W: float) -> float:
    """Horizontal square (side W) to a perpendicular rectangle of height H
    sharing the full edge."""
    h = H / W
    h1 = math.sqrt(1.0 + h * h)
    h2 = h1**4 / (h * h * (2.0 + h * h))
    return 0.25 + (
        h * math.atan(1.0 / h) - h1 * math.atan(1.0 / h1) - 0.25 * math.log(h2)
    ) / math.pi


def perpendicular_common_edge(w: float, h: float, l: float) -> float:
    """F from rectangle 1 (w x l) to rectangle 2 (h x l), perpendicular with
    the full common edge of length l (standard catalog formula)."""
    W = w / l
    H = h / l
    W2, H2 = W * W, H * H
    S = math.sqrt(H2 + W2)
    a = (1.0 + W2) * (1.0 + H2) / (1.0 + W2 + H2)
    b = W2 * (1.0 + W2 + H2) / ((1.0 + W2) * (W2 + H2))
    c = H2 * (1.0 + H2 + W2) / ((1.0 + H2) * (H2 + W2))
    return (
        W * math.atan(1.0 / W)
        + H * math.atan(1.0 / H)
        - S * math.atan(1.0 / S)
        + 0.25 * math.log(a * (b**W2) * (c**H2))
    ) / (math.pi * W)


# ---------------------------------------------------------------------------
# Generic parallel rectangles (contour closed form)
# ---------------------------------------------------------------------------


def _parallel_corner_term(u: float, v: float, z: float) -> float:
    p = math.sqrt(u * u + z * z)
    q = math.sqrt(v * v + z * z)
    return (
        v * p * math.atan(v / p)
        + u * q * math.atan(u / q)
        - 0.5 * z * z * math.log(u * u + v * v + z * z)
    )


def parallel_rectangles(
    x_range: tuple, y_range: tuple, xi_range: tuple, eta_range: tuple, z: float
) -> float:
    """F from rectangle [x1,x2]x[y1,y2] to parallel rectangle
    [xi1,xi2]x[eta1,eta2] at distance z (arbitrary offsets).

    16-term corner superposition of the contour-integrated kernel.
    """
    x1, x2 = x_range
    y1, y2 = y_range
    total = 0.0
    for i, x in enumerate((x1, x2)):
        for j, y in enumerate((y1, y2)):
            for k, xi in enumerate(xi_range):
                for l, eta in enumerate(eta_range):
                    sign = (-1) ** (i + j + k + l)
                    total += sign * _parallel_corner_term(x - xi, y - eta, z)
    area1 = (x2 - x1) * (y2 - y1)
    return total / (2.0 * math.pi * area1)


# ---------------------------------------------------------------------------
# Quadrature for smooth (non-touching) pairs
# ---------------------------------------------------------------------------


def gauss_legendre_pair(corners1, corners2, n: int = 40) -> float:
    """F(1->2) by 4-D Gauss-Legendre quadrature over two planar rectangles.

    ``corners*`` = (origin, edge_u, edge_v) as 3-vectors; the normal is
    edge_u x edge_v (unit). Only valid for fully visible pairs; accuracy
    degrades if the rectangles touch (use closed forms there).
    """
    o1, u1, v1 = (np.asarray(c, dtype=np.float64) for c in corners1)
    o2, u2, v2 = (np.asarray(c, dtype=np.float64) for c in corners2)
    nodes, weights = np.polynomial.legendre.leggauss(n)
    t = 0.5 * (nodes + 1.0)
    w = 0.5 * weights

    n1 = np.cross(u1, v1)
    a1 = np.linalg.norm(n1)
    n1 = n1 / a1
    n2 = np.cross(u2, v2)
    a2 = np.linalg.norm(n2)
    n2 = n2 / a2

    # sample points: (n*n, 3) per rectangle
    ta, tb = np.meshgrid(t, t, indexing="ij")
    wa = np.outer(w, w).ravel()
    p1 = o1 + ta.ravel()[:, None] * u1 + tb.ravel()[:, None] * v1
    p2 = o2 + ta.ravel()[:, None] * u2 + tb.ravel()[:, None] * v2

    diff = p2[None, :, :] - p1[:, None, :]  # (m, m, 3)
    r2 = np.einsum("ijk,ijk->ij", diff, diff)
    cos1 = np.einsum("ijk,k->ij", diff, n1)
    cos2 = -np.einsum("ijk,k->ij", diff, n2)
    kern = np.clip(cos1, 0.0, None) * np.clip(cos2, 0.0, None) / (np.pi * r2 * r2)
    integral = np.einsum("i,j,ij->", wa, wa, kern) * a1 * a2
    return float(integral / 1.0)  # integral already includes dA1 dA2; F = I/A1 * A1...


def gauss_legendre_F(corners1, corners2, n: int = 40) -> float:
    """F(1->2) (per unit of area 1)."""
    o1, u1, v1 = (np.asarray(c, dtype=np.float64) for c in corners1)
    a1 = float(np.linalg.norm(np.cross(u1, v1)))
    return gauss_legendre_pair(corners1, corners2, n) / a1


# ---------------------------------------------------------------------------
# Street-canyon ground truth (all pairs unobstructed)
# ---------------------------------------------------------------------------


def canyon_ground_truth(
    story_h: float = 4.0,
    stories: int = 5,
    facade_width: float = 10.0,
    gap: float = 8.0,
) -> dict:
    """Analytic F(i->j) for the 11-surface street canyon.

    - wall panel <-> opposite wall panel: generic parallel-rectangles form,
    - road -> wall story k: cumulative perpendicular common-edge formula
      F(road -> stories 0..k) differenced per story,
    - wall story k -> road: reciprocity,
    - same-facade pairs and self terms: 0 (coplanar).
    """
    names = []
    for s in range(stories):
        names += [f"east_side_{s}", f"west_side_{s}"]
    names.append("road")

    half_w = facade_width / 2.0
    area_panel = facade_width * story_h
    area_road = facade_width * gap

    F = {a: {b: 0.0 for b in names} for a in names}

    # facade panel (story i) -> opposite facade panel (story j): parallel
    # 10 x 4 rectangles at distance `gap`, z offset (j - i) * story_h
    for i in range(stories):
        for j in range(stories):
            f = parallel_rectangles(
                (-half_w, half_w),
                (i * story_h, (i + 1) * story_h),
                (-half_w, half_w),
                (j * story_h, (j + 1) * story_h),
                gap,
            )
            F[f"east_side_{i}"][f"west_side_{j}"] = f
            F[f"west_side_{i}"][f"east_side_{j}"] = f

    # road -> wall stories: common edge of length facade_width; road width
    # `gap`, wall heights cumulative
    cumulative = [
        perpendicular_common_edge(gap, (k + 1) * story_h, facade_width)
        for k in range(stories)
    ]
    per_story = [cumulative[0]] + [
        cumulative[k] - cumulative[k - 1] for k in range(1, stories)
    ]
    for k in range(stories):
        for side in ("east_side", "west_side"):
            F["road"][f"{side}_{k}"] = per_story[k]
            F[f"{side}_{k}"]["road"] = per_story[k] * area_road / area_panel
    return F


__all__ = [
    "equal_parallel_squares",
    "equal_parallel_rectangles",
    "equal_coaxial_discs",
    "patch_to_disc",
    "square_to_adjacent_rectangle",
    "perpendicular_common_edge",
    "parallel_rectangles",
    "gauss_legendre_F",
    "canyon_ground_truth",
]
