"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Mirrors how multi-chip sharding is validated without a TPU pod: an 8-device
host-platform mesh exercises the same shard_map/psum program the TPU path
runs. Must run before the first ``import jax`` anywhere in the test session.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The env vars alone are not honored when an accelerator plugin is
# registered; the config API always works.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the solve-step shapes recur across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/raystrack_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
