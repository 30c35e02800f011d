"""Branchless Tregenza 145-patch sky classifier (JAX).

Semantics parity with the reference classifier (reference:
src/raystrack/utils/cpu_trace.py:735-777): 8 altitude rings with
(30, 30, 24, 24, 18, 12, 6, 1) azimuth patches; ring selected by the sine of
the patch's upper altitude bound; odd rings offset by half a patch width;
downward directions map to -1.

The reference walks the ring table with early-exit branches; here the ring
index is the count of thresholds at or below dz and the azimuth bin is pure
arithmetic, so the classifier vectorizes across the whole ray batch.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# sin of the upper altitude edge of each ring (6, 18, ..., 84 deg, zenith cap)
RING_HI_SIN = np.array(
    [
        0.20791169081775934,
        0.40673664307580015,
        0.5877852522924731,
        0.7431448254773942,
        0.8660254037844386,
        0.9510565162951535,
        0.9945218953682733,
        1.0,
    ],
    dtype=np.float32,
)
RING_N = np.array([30, 30, 24, 24, 18, 12, 6, 1], dtype=np.int32)
RING_START = np.array([0, 30, 60, 84, 108, 126, 138, 144], dtype=np.int32)
TREGENZA_BINS = 145


def tregenza_patch_id(dx, dy, dz):
    """Map unit direction components to a patch id in [0, 144], or -1 if dz<=0.

    Accepts arrays of any (matching) shape.
    """
    hi = jnp.asarray(RING_HI_SIN[:7])
    # ring = first j with dz < hi[j]; equals the count of hi[j] <= dz (<=6),
    # and 7 when dz >= all seven thresholds.
    ridx = jnp.sum(
        dz[..., None] >= hi, axis=-1, dtype=jnp.int32
    )
    n_az = jnp.asarray(RING_N)[ridx]
    base = jnp.asarray(RING_START)[ridx]

    az = jnp.degrees(jnp.arctan2(dy, dx))
    az = jnp.where(az < 0.0, az + 360.0, az)
    width = 360.0 / n_az.astype(jnp.float32)
    odd = (ridx & 1) == 1
    off = jnp.where(odd, 180.0 / n_az.astype(jnp.float32), 0.0)
    t = az - off
    t = jnp.where(t < 0.0, t + 360.0, t)
    t = jnp.where(t >= 360.0, t - 360.0, t)
    aidx = jnp.minimum((t / width).astype(jnp.int32), n_az - 1)

    pid = jnp.where(n_az == 1, base, base + aidx)
    return jnp.where(dz > 0.0, pid, -1)


__all__ = ["tregenza_patch_id", "TREGENZA_BINS", "RING_HI_SIN", "RING_N", "RING_START"]
