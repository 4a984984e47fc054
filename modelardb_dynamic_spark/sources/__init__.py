"""Sources & sinks: the parquet-backed warehouse catalog, the deterministic
transcript generator, and regular-series derivation."""
