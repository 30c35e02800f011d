"""Low-discrepancy Halton tables for QMC emission sampling.

Value parity with the reference's per-element njit loops (reference:
src/raystrack/utils/halton.py:9-58): the radical inverse is accumulated in
float64 and stored as float32, the stratified grid uses bases (2, 3) with
``u=(h2(c+1)+c//g)/g``, ``v=(h3(c+1)+c%g)/g``, and the five per-ray dimensions
use bases (5, 2, 3, 7, 11) starting at index 1.

Here the tables are built with vectorized NumPy (digit-parallel radical
inverse) instead of scalar JIT loops — precomputed constants the device
solve step consumes. Tables big enough for the accelerator builder
(``_DEVICE_MIN_LENGTH``) are computed AND kept on device end to end:
reversal, exact f64 division, and f32 cast all run in one jitted chunk
program, bitwise-equal to the host build, with no host round-trip.
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
# hundred MB peak instead of several GB for 100M-entry tables). At most 4
# compiled shapes, each cheap.
_DEVICE_CHUNKS = (1 << 21, 1 << 22, 1 << 23, 1 << 24)


@lru_cache(maxsize=len(_DEVICE_CHUNKS))
def _halton_chunk_jit(chunk: int):
    """One jitted Halton-chunk program per chunk bucket, for every
    (base, k, length).

    ``base``, the digit count ``k`` and the denominator are traced scalars,
    and the digit loop is a ``fori_loop`` with a runtime trip count — so the
    FIRST table build compiles the program once and every other base/length
    reuses it. (An earlier per-base closure baked ``base``/``k`` in and
    unrolled the int64 loop: five separate 16-67 s cold compiles, ~160 s of
    a cold ex02.)

    The whole value pipeline runs on device: int64 digit reversal (exact on
    TPU via 32-bit pairs), the exact f64 division (numerator and denominator
    are integers < 2**53, so the conversion is exact and the division rounds
    once), and the f32 cast. Nothing round-trips to host — for an 89M-ray
    emitter the old int64 D2H fetch alone was ~3.6 GB over a tunneled link.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def halton_chunk(start, base, k, denom):
        n = start + jnp.arange(chunk, dtype=jnp.int64)

        def body(_, carry):
            rev, rem = carry
            return rev * base + rem % base, rem // base

        rev, _ = jax.lax.fori_loop(0, k, body, (jnp.zeros_like(n), n))
        return (rev.astype(jnp.float64) / denom).astype(jnp.float32)

    return halton_chunk


def _halton_dim_device(length: int, base: int):
    """First ``length`` Halton f32 values in ``base``, computed AND kept on
    device (a ``jax.Array`` on the default device; no D2H transfer).

    Running the ``fori_loop`` exactly ``k`` times (multiplying ``rev`` by
    ``base`` once the remainder hits zero) matches the host builder's
    fixed-k loop (``radical_inverse`` above) step for step, and the
    f64-divide-then-f32-cast reproduces the host build's double rounding —
    device and host tables are BITWISE identical (asserted on real TPU by
    tpu_smoke.py and on the CPU backend by tests/test_halton.py). Returns
    None when no accelerator is available (callers fall back to the host
    build).
    """
    try:
        import jax
        import jax.numpy as jnp

        if jax.default_backend() == "cpu":
            return None

        k = _digit_count(length, base)
        denom = float(base**k)  # < 2**53: exactly representable
        with jax.enable_x64():
            blocks = []
            s = 0
            while s < length:
                remaining = length - s
                chunk = next(
                    (c for c in _DEVICE_CHUNKS if c >= remaining),
                    _DEVICE_CHUNKS[-1],
                )
                block = _halton_chunk_jit(chunk)(
                    jnp.int64(s + 1),
                    jnp.int64(base),
                    jnp.int64(k),
                    jnp.float64(denom),
                )
                take = min(chunk, remaining)
                blocks.append(block if take == chunk else block[:take])
                s += take
            out = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks)
        return jax.block_until_ready(out)
    except Exception:
        return None  # any device/backend issue -> host build


def _halton_dim(length: int, base: int):
    """First ``length`` Halton values in ``base`` (indices 1..length), f32.

    Returns a host ``np.ndarray``, EXCEPT when the table is big enough for
    the accelerator builder and the on-disk cache is off: then the table is
    returned as a device-resident ``jax.Array`` and never touches the host
    (consumers feed it straight into device packs — see
    ``prepared.pack_emitter``). Host and device tables are bitwise equal.
    """
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
    if _device_halton_enabled(length):
        dev = _halton_dim_device(length, base)
        if dev is not None:
            if cache_dir is None:
                return dev  # stays on device; no D2H
            arr = np.asarray(dev)  # opt-in disk cache pays one f32 fetch
        else:
            arr = None
    else:
        arr = None
    if arr is None:
        arr = radical_inverse(
            np.arange(1, length + 1, dtype=np.int64), base
        ).astype(np.float32)
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


def _build_dims(n: int):
    return (
        _halton_dim(n, 5),
        _halton_dim(n, 2),
        _halton_dim(n, 3),
        _halton_dim(n, 7),
        _halton_dim(n, 11),
    )


# Big tables can be device-resident (jax.Array): an lru entry then PINS
# ~5 * length * 4 bytes of HBM (1.3 GB at the 67M scheduler budget), so the
# big-length cache keeps only the 2 most recent lengths — a rebuild is
# seconds on device, and a scene's same-size emitters share one entry.
_cached_dims_small = lru_cache(maxsize=128)(_build_dims)
_cached_dims_big = lru_cache(maxsize=2)(_build_dims)


def cached_halton_dims(
    length: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Five cached per-ray Halton dimensions: bases (5, 2, 3, 7, 11).

    Order: triangle pick, barycentric u, barycentric v, hemisphere r1, r2.
    """
    n = int(length)
    if n >= _DEVICE_MIN_LENGTH:
        return _cached_dims_big(n)
    return _cached_dims_small(n)


def _dims_cache_clear() -> None:
    _cached_dims_small.cache_clear()
    _cached_dims_big.cache_clear()


# tests and HBM-conscious callers clear both partitions through the same
# attribute the old single lru_cache exposed
cached_halton_dims.cache_clear = _dims_cache_clear


__all__ = ["radical_inverse", "cached_halton", "cached_halton_dims"]
