"""Halton table values against a scalar radical-inverse oracle."""
import numpy as np

from raystrack_tpu.ops.halton import cached_halton, cached_halton_dims, radical_inverse


def _scalar_halton(i: int, base: int) -> float:
    f, r = 1.0, 0.0
    while i:
        f /= base
        r += f * (i % base)
        i //= base
    return r


def _exact_halton(i: int, base: int) -> float:
    """Correctly rounded radical inverse via exact rational arithmetic."""
    from fractions import Fraction

    rev, k = 0, 0
    while i:
        rev = rev * base + i % base
        i //= base
        k += 1
    return float(Fraction(rev, base**k)) if k else 0.0


def test_radical_inverse_is_correctly_rounded():
    idx = np.arange(1, 2000, dtype=np.int64)
    for base in (2, 3, 5, 7, 11):
        vec = radical_inverse(idx, base)
        ref = np.array([_exact_halton(int(i), base) for i in idx])
        np.testing.assert_array_equal(vec, ref)


def test_radical_inverse_f32_matches_sequential_accumulation():
    """The f32 tables the solver consumes are identical to the reference's
    sequential f64 accumulation method (the exact method only moves the
    last f64 ulp, never an f32 bit)."""
    idx = np.arange(1, 200_001, dtype=np.int64)
    for base in (2, 3, 5, 7, 11):
        seq = np.array([_scalar_halton(int(i), base) for i in idx[:2000]])
        np.testing.assert_array_equal(
            radical_inverse(idx[:2000], base).astype(np.float32),
            seq.astype(np.float32),
        )


def test_device_builder_bitwise_equals_host(monkeypatch):
    """The accelerator table builder (int64 digit reversal, exact f64
    division, f32 cast — all on device, no host round-trip) produces
    bitwise-identical f32 tables."""
    import raystrack_tpu.ops.halton as halton_mod

    monkeypatch.setenv("RAYSTRACK_TPU_DEVICE_HALTON", "1")
    # the CPU backend guard would skip the device path; bypass it so the
    # jitted build actually runs (on the test's CPU devices)
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for base in (2, 3, 5, 7, 11):
        dev = halton_mod._halton_dim_device(50_000, base)
        assert dev is not None
        assert isinstance(dev, jax.Array)
        host = radical_inverse(
            np.arange(1, 50_001, dtype=np.int64), base
        ).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(dev), host)


def test_device_builder_chunk_stitching(monkeypatch):
    """Bucketed chunk selection and multi-chunk stitching are exact: a
    table spanning several device chunks (including a ragged tail shorter
    than the smallest bucket) equals the host build bitwise."""
    import raystrack_tpu.ops.halton as halton_mod

    monkeypatch.setenv("RAYSTRACK_TPU_DEVICE_HALTON", "1")
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # shrink the buckets so a small table exercises every code path:
    # bucket promotion (tail of 3_000 -> the 4_096 bucket), full largest
    # chunks, and the final partial take
    monkeypatch.setattr(halton_mod, "_DEVICE_CHUNKS", (1 << 12, 1 << 13, 1 << 14))
    for base, length in ((2, 40_000), (3, (1 << 14) * 2 + 3_000), (7, 1 << 12)):
        dev = halton_mod._halton_dim_device(length, base)
        assert dev is not None
        assert dev.shape == (length,)
        host = radical_inverse(
            np.arange(1, length + 1, dtype=np.int64), base
        ).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(dev), host)


def test_device_tables_stay_on_device_and_pack(monkeypatch):
    """_halton_dim returns a device-resident jax.Array above the device
    threshold (disk cache off), and pack_emitter consumes it on device:
    padded tables and on-device cell repeats match the host-path pack
    bitwise."""
    import jax

    import raystrack_tpu.ops.halton as halton_mod
    from raystrack_tpu import prepared as prep_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(halton_mod, "_DEVICE_MIN_LENGTH", 1_000)
    monkeypatch.delenv("RAYSTRACK_TPU_TABLE_CACHE", raising=False)

    V = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=np.float32
    )
    F = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    rays = 64

    halton_mod.cached_halton_dims.cache_clear()
    try:
        (em_dev,) = prep_mod.prepare_emitters(
            [("plate", V, F)], samples=64, rays=rays, flip_faces=False
        )
        assert isinstance(em_dev.halton_tri, jax.Array)
        pack_dev = prep_mod.pack_emitter(em_dev, rays)

        # host-path pack of the same emitter for comparison
        monkeypatch.setenv("RAYSTRACK_TPU_DEVICE_HALTON", "0")
        halton_mod.cached_halton_dims.cache_clear()
        (em_host,) = prep_mod.prepare_emitters(
            [("plate", V, F)], samples=64, rays=rays, flip_faces=False
        )
        assert isinstance(em_host.halton_tri, np.ndarray)
        pack_host = prep_mod.pack_emitter(em_host, rays)

        for field in ("u_cell", "v_cell", "h_tri", "h_u", "h_v", "h_r1", "h_r2"):
            np.testing.assert_array_equal(
                np.asarray(getattr(pack_dev, field)),
                np.asarray(getattr(pack_host, field)),
            )
        assert pack_dev.n_rays_pad == pack_host.n_rays_pad
    finally:
        halton_mod.cached_halton_dims.cache_clear()


def test_device_tables_flat_concat_matches_host(monkeypatch):
    """PreparedSolver.get_flat_tables with device-resident halton tables
    (mixed scene: one emitter above the device threshold, one below)
    concatenates on device and matches the host-path flat tables bitwise."""
    import jax

    import raystrack_tpu.ops.halton as halton_mod
    from raystrack_tpu import prepared as prep_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(halton_mod, "_DEVICE_MIN_LENGTH", 1_000)
    monkeypatch.delenv("RAYSTRACK_TPU_TABLE_CACHE", raising=False)

    V = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=np.float32
    )
    F = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    # the small plate's area-scaled grid stays under the device threshold
    # while the big one crosses it -> genuinely mixed scene
    V2 = V * np.float32(0.125) + np.float32([0, 0, 1])
    meshes = [("big", V, F), ("small", V2, F)]

    halton_mod.cached_halton_dims.cache_clear()
    try:
        ps_dev = prep_mod.PreparedSolver(meshes)
        flat_dev, geom_dev, off_dev, pad_dev = ps_dev.get_flat_tables(
            samples=64, rays=32, flip_faces=False
        )
        big = ps_dev.get_emitter(0, samples=64, rays=32, flip_faces=False)
        small = ps_dev.get_emitter(1, samples=64, rays=32, flip_faces=False)
        assert isinstance(big.halton_tri, jax.Array)
        assert isinstance(small.halton_tri, np.ndarray)

        monkeypatch.setenv("RAYSTRACK_TPU_DEVICE_HALTON", "0")
        halton_mod.cached_halton_dims.cache_clear()
        ps_host = prep_mod.PreparedSolver(meshes)
        flat_host, geom_host, off_host, pad_host = ps_host.get_flat_tables(
            samples=64, rays=32, flip_faces=False
        )

        np.testing.assert_array_equal(off_dev, off_host)
        np.testing.assert_array_equal(pad_dev, pad_host)
        for a, b in zip(flat_dev, flat_host):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(geom_dev, geom_host):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        halton_mod.cached_halton_dims.cache_clear()


def test_dims_cache_partition(monkeypatch):
    """Lengths at/above the device threshold route to the 2-entry big-table
    cache (device tables must not pin unbounded HBM); cache_clear clears
    both partitions."""
    import raystrack_tpu.ops.halton as halton_mod

    monkeypatch.setattr(halton_mod, "_DEVICE_MIN_LENGTH", 1_000)
    cached_halton_dims.cache_clear()
    try:
        cached_halton_dims(100)  # small partition
        for n in (1_000, 2_000, 3_000):  # big partition: evicts down to 2
            cached_halton_dims(n)
        small = halton_mod._cached_dims_small.cache_info()
        big = halton_mod._cached_dims_big.cache_info()
        assert small.currsize == 1
        assert big.currsize == 2 and big.maxsize == 2
        cached_halton_dims.cache_clear()
        assert halton_mod._cached_dims_small.cache_info().currsize == 0
        assert halton_mod._cached_dims_big.cache_info().currsize == 0
    finally:
        cached_halton_dims.cache_clear()


def test_grid_layout_and_range():
    g = 5
    u, v = cached_halton(g)
    assert u.shape == (g * g,) and v.shape == (g * g,)
    assert u.dtype == np.float32 and v.dtype == np.float32
    # cell c sits in stratum (c // g) along u and (c % g) along v
    for c in (0, 7, 24):
        assert (c // g) / g <= u[c] < (c // g + 1) / g
        assert (c % g) / g <= v[c] < (c % g + 1) / g
    ref_u = np.float32((_scalar_halton(8, 2) + 7 // g) / g)
    assert u[7] == ref_u


def test_dims_bases_and_start_index():
    dims = cached_halton_dims(64)
    assert len(dims) == 5
    for arr, base in zip(dims, (5, 2, 3, 7, 11)):
        assert arr.shape == (64,)
        assert arr[0] == np.float32(1.0 / base)  # index starts at 1
        assert np.all((arr >= 0) & (arr < 1))


def test_caching_identity():
    assert cached_halton(6) is cached_halton(6)
    assert cached_halton_dims(128) is cached_halton_dims(128)


def test_disk_table_cache(tmp_path, monkeypatch):
    """RAYSTRACK_TPU_TABLE_CACHE memoizes big tables across processes."""
    import raystrack_tpu.ops.halton as halton_mod

    monkeypatch.setenv("RAYSTRACK_TPU_TABLE_CACHE", str(tmp_path))
    monkeypatch.setattr(halton_mod, "_DISK_CACHE_MIN_LENGTH", 100)
    a = halton_mod._halton_dim(500, 7)
    files = list(tmp_path.glob("halton_b7_n500.npy"))
    assert len(files) == 1
    b = halton_mod._halton_dim(500, 7)  # served from disk
    np.testing.assert_array_equal(a, b)
    # corrupted cache entries fall back to a rebuild
    files[0].write_bytes(b"garbage")
    c = halton_mod._halton_dim(500, 7)
    np.testing.assert_array_equal(a, c)
