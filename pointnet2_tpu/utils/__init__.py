"""Host-side utilities: point-cloud IO/conversion, scene ray-casting,
profiling."""
