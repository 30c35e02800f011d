"""Run one validation case with the persistent compile cache enabled."""
import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# the solvers' default persistent cache (~/.cache/raystrack_tpu/jax), shared
# with bench.py and tpu_smoke.py so each run warms the others
from raystrack_tpu.solver import _ensure_compile_cache  # noqa: E402

_ensure_compile_cache()

mod = importlib.import_module(sys.argv[1])
mod.main()
