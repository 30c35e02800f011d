"""Low-discrepancy Halton tables for QMC emission sampling.

Value parity with the reference's per-element njit loops (reference:
src/raystrack/utils/halton.py:9-58): the radical inverse is accumulated in
float64 and stored as float32, the stratified grid uses bases (2, 3) with
``u=(h2(c+1)+c//g)/g``, ``v=(h3(c+1)+c%g)/g``, and the five per-ray dimensions
use bases (5, 2, 3, 7, 11) starting at index 1.

Here the tables are built with vectorized NumPy (digit-parallel radical
inverse) instead of scalar JIT loops — they are precomputed host constants
that the device solve step consumes.
"""
from __future__ import annotations

import os
from functools import lru_cache
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def radical_inverse(indices: np.ndarray, base: int) -> np.ndarray:
    """Vectorized van der Corput radical inverse in the given base (float64)."""
    idx = np.asarray(indices, dtype=np.int64)
    result = np.zeros(idx.shape, dtype=np.float64)
    scale = 1.0
    remaining = idx.copy()
    while np.any(remaining):
        scale /= base
        result += scale * (remaining % base)
        remaining //= base
    return result


def _table_cache_dir() -> Optional[Path]:
    """Optional on-disk cache for large tables (RAYSTRACK_TPU_TABLE_CACHE).

    Very large emitters need tens of millions of Halton entries per
    dimension; the digit-parallel build still costs minutes of single-core
    host time per process. Pointing this env var at a directory memoizes
    the tables across processes.
    """
    raw = os.environ.get("RAYSTRACK_TPU_TABLE_CACHE")
    if not raw:
        return None
    path = Path(raw)
    path.mkdir(parents=True, exist_ok=True)
    return path


# tables below this length build in well under a second; don't touch disk
_DISK_CACHE_MIN_LENGTH = 4_000_000


def _halton_dim(length: int, base: int) -> np.ndarray:
    """First ``length`` Halton values in ``base`` (indices 1..length), f32."""
    cache_dir = _table_cache_dir() if length >= _DISK_CACHE_MIN_LENGTH else None
    if cache_dir is not None:
        path = cache_dir / f"halton_b{base}_n{length}.npy"
        if path.exists():
            try:
                arr = np.load(path)
                if arr.shape == (length,) and arr.dtype == np.float32:
                    return arr
            except Exception:
                pass
    arr = radical_inverse(np.arange(1, length + 1, dtype=np.int64), base).astype(
        np.float32
    )
    if cache_dir is not None:
        # per-process tmp name: concurrent builders of the same table must
        # not interleave writes into one tmp file before the atomic publish
        tmp = path.with_suffix(f".{os.getpid()}.tmp.npy")
        np.save(tmp, arr)
        tmp.replace(path)
    return arr


@lru_cache(maxsize=128)
def cached_halton(samples: int) -> Tuple[np.ndarray, np.ndarray]:
    """Stratified g*g Halton jitter grid: per-cell (u, v) in [0, 1)."""
    g = int(samples)
    cells = np.arange(g * g, dtype=np.int64)
    row = (cells // g).astype(np.float64)
    col = (cells % g).astype(np.float64)
    u = ((radical_inverse(cells + 1, 2) + row) / g).astype(np.float32)
    v = ((radical_inverse(cells + 1, 3) + col) / g).astype(np.float32)
    return u, v


@lru_cache(maxsize=128)
def cached_halton_dims(
    length: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Five cached per-ray Halton dimensions: bases (5, 2, 3, 7, 11).

    Order: triangle pick, barycentric u, barycentric v, hemisphere r1, r2.
    """
    n = int(length)
    return (
        _halton_dim(n, 5),
        _halton_dim(n, 2),
        _halton_dim(n, 3),
        _halton_dim(n, 7),
        _halton_dim(n, 11),
    )


__all__ = ["radical_inverse", "cached_halton", "cached_halton_dims"]
