"""Pipeline plans: per-partition lineage checkpoints and the tier pipeline."""
