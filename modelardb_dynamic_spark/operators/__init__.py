"""Spark operators: compression, reconstruction, rollup, retention, and the
training-data operator family (dedup / similarity / text analysis)."""
