"""Tregenza classifier against a scalar oracle."""
import math

import numpy as np
import jax.numpy as jnp

from raystrack_tpu.ops.tregenza import (
    RING_HI_SIN,
    RING_N,
    RING_START,
    tregenza_patch_id,
)


def _oracle(dx, dy, dz):
    if dz <= 0.0:
        return -1
    ridx = 7
    for j in range(8):
        if dz < RING_HI_SIN[j] or j == 7:
            ridx = j
            break
    n_az = int(RING_N[ridx])
    base = int(RING_START[ridx])
    if n_az == 1:
        return base
    az = math.degrees(math.atan2(dy, dx))
    if az < 0.0:
        az += 360.0
    width = 360.0 / n_az
    off = (180.0 / n_az) if (ridx & 1) == 1 else 0.0
    t = az - off
    if t < 0.0:
        t += 360.0
    elif t >= 360.0:
        t -= 360.0
    return base + min(int(t // width), n_az - 1)


def test_ring_structure():
    assert int(RING_N.sum()) == 145
    np.testing.assert_array_equal(RING_START, np.concatenate([[0], np.cumsum(RING_N)[:-1]]))


def test_classifier_matches_oracle_random():
    rng = np.random.default_rng(3)
    d = rng.normal(size=(5000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)
    got = np.asarray(tregenza_patch_id(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])))
    want = np.array([_oracle(*row) for row in d])
    np.testing.assert_array_equal(got, want)


def test_zenith_and_horizon():
    assert int(tregenza_patch_id(jnp.float32(0), jnp.float32(0), jnp.float32(1.0))) == 144
    assert int(tregenza_patch_id(jnp.float32(1), jnp.float32(0), jnp.float32(0.0))) == -1
    assert int(tregenza_patch_id(jnp.float32(0), jnp.float32(0), jnp.float32(-1.0))) == -1
    # just above horizon, azimuth 0 -> first ring, first patch
    assert int(tregenza_patch_id(jnp.float32(1), jnp.float32(0), jnp.float32(1e-4))) == 0


def test_all_patches_reachable():
    rng = np.random.default_rng(7)
    d = rng.normal(size=(200_000, 3))
    d[:, 2] = np.abs(d[:, 2])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)
    pid = np.asarray(tregenza_patch_id(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])))
    assert set(np.unique(pid)) == set(range(145))
