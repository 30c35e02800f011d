"""Host-side utilities: helpers, geometry, logging."""
