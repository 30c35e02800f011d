"""Convergence monitors and chunk planner semantics."""
import numpy as np
import pytest

from raystrack_tpu.convergence import (
    MatrixMonitor,
    SkyMonitor,
    convergence_checkpoint,
    plan_chunk,
)


def test_checkpoint_rules():
    # below min_iters: never
    assert not convergence_checkpoint(3, min_iters=5, interval=1, max_iters=100)
    # at/after min_iters with interval 1: always
    assert convergence_checkpoint(5, min_iters=5, interval=1, max_iters=100)
    assert convergence_checkpoint(6, min_iters=5, interval=1, max_iters=100)
    # interval 4: only on the grid anchored at min_iters
    assert convergence_checkpoint(5, min_iters=5, interval=4, max_iters=100)
    assert not convergence_checkpoint(6, min_iters=5, interval=4, max_iters=100)
    assert convergence_checkpoint(9, min_iters=5, interval=4, max_iters=100)
    # max_iters always checkpoints
    assert convergence_checkpoint(100, min_iters=5, interval=7, max_iters=100)
    # variance-based checks need 2+ iterations
    assert not convergence_checkpoint(
        1, min_iters=1, interval=1, max_iters=100, needs_variance=True
    )


def test_plan_chunk_power_of_four_and_caps():
    # heading to min_iters=40 from 0: largest power of 4 <= 40
    assert plan_chunk(0, min_iters=40, interval=1, max_iters=500, rays_per_iter=1000) == 16
    # 8 remaining to min_iters + 25% speculation of 32 done -> 16
    assert plan_chunk(32, min_iters=40, interval=1, max_iters=500, rays_per_iter=1000) == 16
    # past min_iters with interval 1: speculation grows chunks
    c = plan_chunk(40, min_iters=40, interval=1, max_iters=500, rays_per_iter=1000)
    assert c == 4  # need 1 + 25% of 40 = 11 -> power-of-4 floor 4
    # never exceeds remaining iterations
    assert plan_chunk(499, min_iters=5, interval=1, max_iters=500, rays_per_iter=1) == 1
    assert plan_chunk(500, min_iters=5, interval=1, max_iters=500, rays_per_iter=1) == 0
    # ray budget caps the chunk
    assert plan_chunk(0, min_iters=64, interval=1, max_iters=500,
                      rays_per_iter=10_000_000) == 1


def test_plan_chunk_exact_mode_reaches_checkpoints_in_one_round():
    # pow4=False (scheduled driver): the exact bounded size, so min_iters=5
    # is one 5-iteration round, not 4-then-1
    assert plan_chunk(0, min_iters=5, interval=1, max_iters=500,
                      rays_per_iter=1000, pow4=False) == 5
    # heading straight to a stderr projection plus speculation margin
    assert plan_chunk(40, min_iters=5, interval=1, max_iters=500,
                      rays_per_iter=1000, projected_total=80,
                      pow4=False) == 50  # need 40 + 25% of 40
    # caps still apply: remaining, ray budget
    assert plan_chunk(499, min_iters=5, interval=1, max_iters=500,
                      rays_per_iter=1, pow4=False) == 1
    assert plan_chunk(500, min_iters=5, interval=1, max_iters=500,
                      rays_per_iter=1, pow4=False) == 0
    assert plan_chunk(0, min_iters=64, interval=1, max_iters=500,
                      rays_per_iter=10_000_000, pow4=False) == 1


def _mk_matrix(tol_mode="stderr", tol=1e-3, min_iters=2, max_iters=50):
    return MatrixMonitor(
        2, np.array([1]), n_rays_once=1000, tol=tol, tol_mode=tol_mode,
        min_iters=min_iters, interval=1, max_iters=max_iters,
    )


def test_matrix_monitor_stderr_convergence():
    mon = _mk_matrix()
    # identical iterations -> zero variance -> converges at min_iters
    counts = np.array([0, 200], dtype=np.int64)
    mon.consume_iteration(counts, np.zeros(2, np.int64))
    assert not mon.done
    mon.consume_iteration(counts, np.zeros(2, np.int64))
    assert mon.done
    assert mon.iters_done == 2
    assert mon.hits_f[1] == 400 and mon.total_rays == 2000


def test_matrix_monitor_ignores_after_done():
    mon = _mk_matrix()
    c = np.array([0, 200], dtype=np.int64)
    for _ in range(5):
        mon.consume_iteration(c, np.zeros(2, np.int64))
    assert mon.iters_done == 2  # stopped exactly at convergence


def test_matrix_monitor_max_iters():
    mon = _mk_matrix(tol=1e-12, max_iters=4)
    rng = np.random.default_rng(0)
    for _ in range(10):
        mon.consume_iteration(
            rng.integers(0, 300, 2).astype(np.int64),
            rng.integers(0, 300, 2).astype(np.int64),
        )
    assert mon.iters_done == 4 and mon.done


def test_matrix_monitor_delta_mode():
    mon = _mk_matrix(tol_mode="delta", tol=1e-2, min_iters=1)
    c = np.array([100, 100], dtype=np.int64)
    mon.consume_iteration(c, c)  # sets prev
    assert not mon.done
    mon.consume_iteration(c, c)  # cumulative unchanged -> delta 0 < tol
    assert mon.done


def test_matrix_monitor_welford_matches_numpy():
    mon = _mk_matrix(tol=1e-12, max_iters=100)
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 500, size=(20, 2)).astype(np.int64)
    for row in rows:
        mon.consume_iteration(row, np.zeros(2, np.int64))
    fracs = rows / 1000.0
    np.testing.assert_allclose(mon.wf.mean, fracs.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(
        mon.wf.stderr(), fracs.std(axis=0, ddof=1) / np.sqrt(20), rtol=1e-10
    )


def test_sky_monitor_merged_and_discrete():
    merged = SkyMonitor(
        discrete=False, n_rays_once=1000, tol=1e-3, tol_mode="stderr",
        min_iters=2, interval=1, max_iters=50,
    )
    merged.consume_iteration(500)
    merged.consume_iteration(500)
    assert merged.done and merged.upward_total == 1000

    disc = SkyMonitor(
        discrete=True, n_rays_once=1000, tol=1e-3, tol_mode="stderr",
        min_iters=2, interval=1, max_iters=50,
    )
    bins = np.zeros(145, np.int64)
    bins[7] = 400
    disc.consume_iteration(bins)
    disc.consume_iteration(bins)
    assert disc.done and disc.counts_total[7] == 800


def test_invalid_tol_mode():
    with pytest.raises(ValueError):
        _mk_matrix(tol_mode="bogus")
    with pytest.raises(ValueError):
        SkyMonitor(discrete=False, n_rays_once=10, tol=1e-3, tol_mode="x",
                   min_iters=1, interval=1, max_iters=5)


def test_sched_series_buckets():
    """_sched_series enumerates exactly the {2^k, 3*2^(k-1)} sizes
    _sched_size can produce between two bounds."""
    from raystrack_tpu.solver import _sched_series, _sched_size

    got = _sched_series(128, 6144)
    assert got == [128, 192, 256, 384, 512, 768, 1024, 1536, 2048, 3072,
                   4096, 6144]
    # every value is a fixed point of _sched_size, and nothing is missing
    assert all(_sched_size(v) == v for v in got)
    assert _sched_series(128, 127) == []
    assert _sched_series(2048, 2048) == [2048]


def test_background_compile_lowers_each_variant():
    """_background_compile lowers+compiles every requested shape variant
    (plumbing test with a recording stub; real use is accelerator-only)."""
    import threading
    import time

    import jax
    import numpy as np

    from raystrack_tpu.solver import _background_compile

    calls = []
    done = threading.Event()

    class Stub:
        def lower(self, *a, **k):
            calls.append((tuple(x.shape for x in a if hasattr(x, "shape")), k))
            if len(calls) == 2:
                done.set()

            class C:
                def compile(self):
                    return None

            return C()

    args = (np.zeros((4, 7), np.float32), np.zeros((8, 4), np.int32))
    variants = [
        {0: jax.ShapeDtypeStruct((16, 7), np.float32)},
        {1: jax.ShapeDtypeStruct((32, 4), np.int32)},
    ]
    _background_compile(Stub(), args, {"flag": True}, variants)
    assert done.wait(timeout=30), "background compiles did not run"
    time.sleep(0.05)
    shapes = sorted(c[0] for c in calls)
    assert shapes == [((4, 7), (32, 4)), ((16, 7), (8, 4))]
    assert all(c[1] == {"flag": True} for c in calls)
