"""Multi-device sharding over JAX device meshes."""
