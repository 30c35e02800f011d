"""Run one validation case with the persistent compile cache enabled."""
import importlib
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/raystrack_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

mod = importlib.import_module(sys.argv[1])
mod.main()
