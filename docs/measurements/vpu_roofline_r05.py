#!/usr/bin/env python3
"""Empirical VPU peak + headline roofline accounting (round 5).

The README used to claim "~87% of the VPU roofline" against an ASSUMED
spec peak (the per-lane ALU issue width of v5e is not publicly pinned).
This script replaces the assumption with a measurement: the fastest
pure-FMA rate ANY kernel achieved in a 15-config campaign (chains x depth
x block-rows sweep; straight-line register chains, fori_loop chains and
VMEM-streamed variants — see roofline_r05.md for the campaign table).
Best: 16 independent chains over (32, 128) f32 blocks, fully unrolled.

The headline roofline fraction is then

    fraction = (measured pairs/s x arithmetic flops per pair)
               / measured peak flops/s

with flops counted from the kernel source under the strict convention
(FMA = 2 flops, neg/sub/add/mul/div = 1, compares/selects/min = 0 —
the sweep issues ~14 of those per pair too, which this convention does
not credit; see roofline_r05.md).

Run on the real TPU: python docs/measurements/vpu_roofline_r05.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 32, 128  # 4 vregs per value: enough ILP per instruction
CHAINS = 16            # independent accumulators to cover FMA latency
DEPTH = 1024           # straight-line FMAs per chain (no loop carries)
GRID = 2048


def _fma_kernel(x_ref, o_ref):
    x = x_ref[...]
    a = [x + jnp.float32(i) for i in range(CHAINS)]
    c = jnp.float32(0.999999881)
    d = jnp.float32(0.25)
    for _ in range(DEPTH):
        for i in range(CHAINS):
            a[i] = a[i] * c + d
    s = a[0]
    for i in range(1, CHAINS):
        s = s + a[i]
    o_ref[...] = s


def measure_peak() -> dict:
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (ROWS, LANES), np.float32))
    fn = jax.jit(pl.pallas_call(
        _fma_kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    ))
    np.asarray(fn(x))  # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(x))
        best = min(best, time.perf_counter() - t0)
    fmas = GRID * CHAINS * DEPTH * ROWS * LANES
    return {
        "fma_ops": fmas,
        "best_s": round(best, 4),
        "vpu_fma_per_sec": fmas / best,
        "vpu_flops_per_sec": 2 * fmas / best,  # 1 FMA = 2 flops
        "config": {"rows": ROWS, "chains": CHAINS, "depth": DEPTH,
                   "grid": GRID},
        "device": str(jax.devices()[0]),
    }


# Arithmetic flops per ray-triangle pair in trace_pallas._tile_step,
# headline configuration (want_matrix=True, want_any=False, masks baked):
#   det 6, t_num 6, u_num 11, v_num 12, abs_det/un/vn 3, t_hit(div) 1,
#   margin folds 3  -> 42. The per-pair compare/select/min ops (~14) are
# excluded by the flop convention. Table: roofline_r05.md.
FLOPS_PER_PAIR = 42


def main() -> None:
    peak = measure_peak()
    print(json.dumps(peak, indent=2))
    headline_pairs_per_sec = None
    bench_path = Path(__file__).resolve().parents[2] / "BENCH_r04.json"
    try:
        headline_pairs_per_sec = json.loads(
            bench_path.read_text())["parsed"]["value"]
    except Exception:
        pass
    if headline_pairs_per_sec:
        sustained = headline_pairs_per_sec * FLOPS_PER_PAIR
        frac = sustained / peak["vpu_flops_per_sec"]
        print(json.dumps({
            "headline_pairs_per_sec": headline_pairs_per_sec,
            "flops_per_pair": FLOPS_PER_PAIR,
            "sustained_flops_per_sec": sustained,
            "roofline_fraction_vs_measured_peak": round(frac, 4),
        }, indent=2))


if __name__ == "__main__":
    main()
