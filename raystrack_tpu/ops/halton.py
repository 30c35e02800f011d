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


def _digit_count(max_index: int, base: int) -> int:
    """Digits needed to represent every index up to ``max_index`` in ``base``."""
    k, bound = 1, base
    while bound <= max_index:
        k += 1
        bound *= base
    return k


def radical_inverse(indices: np.ndarray, base: int) -> np.ndarray:
    """Vectorized van der Corput radical inverse in the given base (float64).

    Computed exactly: the radical inverse of an integer with K base-b digits
    is the rational ``reverse_digits(n) / b**K``. For indices < 2**31 both
    numerator and denominator stay below 2**53, so the single f64 division
    yields the CORRECTLY ROUNDED radical inverse — at least as accurate as
    the reference's sequential f64 accumulation (reference:
    src/raystrack/utils/halton.py:9-20), and bit-reproducible across the
    host and device builders (they share the same integer reversal).
    """
    idx = np.asarray(indices, dtype=np.int64)
    if idx.size == 0:
        return np.zeros(idx.shape, dtype=np.float64)
    max_index = int(idx.max())
    if max_index >= 1 << 31:
        raise ValueError("radical_inverse supports indices < 2**31")
    k = _digit_count(max_index, base)
    rev = np.zeros(idx.shape, dtype=np.int64)
    remaining = idx.copy()
    for _ in range(k):
        rev = rev * base + remaining % base
        remaining //= base
    # base**k in exact integer arithmetic first: < 2**53, so the float is
    # exact and the division rounds once
    return rev / float(base**k)


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

# tables at least this long build their digit reversal on the accelerator
# (huge emitters need tens of millions of entries per dimension; the host
# build is single-core). 0/1 via RAYSTRACK_TPU_DEVICE_HALTON forces off/on.
_DEVICE_MIN_LENGTH = 2_000_000


def _device_halton_enabled(length: int) -> bool:
    raw = os.environ.get("RAYSTRACK_TPU_DEVICE_HALTON", "auto").lower()
    if raw in ("0", "off", "false"):
        return False
    if raw in ("1", "on", "true"):
        return True
    return length >= _DEVICE_MIN_LENGTH


# Bucketed device chunk sizes: the largest bounds transient HBM (a few
# hundred MB peak instead of several GB for 100M-entry tables); the smaller
# buckets keep the D2H fetch proportional to the table (a 2.1M-entry table
# pays a 32 MB transfer, not the full 134 MB chunk — the build is
# transfer-bound on tunneled hosts). At most 4 compiled shapes, each cheap.
_DEVICE_CHUNKS = (1 << 21, 1 << 22, 1 << 23, 1 << 24)


@lru_cache(maxsize=len(_DEVICE_CHUNKS))
def _reverse_digits_jit(chunk: int):
    """One jitted digit-reversal program per chunk bucket, for every
    (base, k, length).

    ``base`` and the digit count ``k`` are traced scalars, and the digit
    loop is a ``fori_loop`` with a runtime trip count — so the FIRST table
    build compiles the program once and every other base/length reuses it.
    (The previous per-base closure baked ``base``/``k`` in and unrolled the
    int64 loop: five separate 16-67 s cold compiles, ~160 s of a cold ex02.)
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def reverse_digits(start, base, k):
        n = start + jnp.arange(chunk, dtype=jnp.int64)

        def body(_, carry):
            rev, rem = carry
            return rev * base + rem % base, rem // base

        rev, _ = jax.lax.fori_loop(0, k, body, (jnp.zeros_like(n), n))
        return rev

    return reverse_digits


def _radical_inverse_device(length: int, base: int) -> Optional[np.ndarray]:
    """Digit-reversed integers for indices 1..length, computed on device.

    The reversal is pure int64 arithmetic (exact on TPU via 32-bit pairs,
    enabled with the local x64 context); the final exact f64 division runs
    on host, so device and host tables are BITWISE identical. Running the
    ``fori_loop`` exactly ``k`` times (multiplying ``rev`` by ``base`` once
    the remainder hits zero) matches the host builder's fixed-k loop
    (``radical_inverse`` above) step for step. Returns None when no
    accelerator is available (callers fall back to the host build).
    """
    try:
        import jax
        import jax.numpy as jnp

        if jax.default_backend() == "cpu":
            return None

        k = _digit_count(length, base)
        with jax.enable_x64():
            host = np.empty(length, dtype=np.int64)
            s = 0
            while s < length:
                remaining = length - s
                chunk = next(
                    (c for c in _DEVICE_CHUNKS if c >= remaining),
                    _DEVICE_CHUNKS[-1],
                )
                block = np.asarray(
                    _reverse_digits_jit(chunk)(
                        jnp.int64(s + 1), jnp.int64(base), jnp.int64(k)
                    )
                )
                take = min(chunk, remaining)
                host[s : s + take] = block[:take]
                s += take
        return host / float(base**k)
    except Exception:
        return None  # any device/backend issue -> host build


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
    values = (
        _radical_inverse_device(length, base)
        if _device_halton_enabled(length)
        else None
    )
    if values is None:
        values = radical_inverse(np.arange(1, length + 1, dtype=np.int64), base)
    arr = values.astype(np.float32)
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
