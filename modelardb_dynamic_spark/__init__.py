"""modelardb_dynamic_spark — a PySpark-native model-based time-series engine.

A from-scratch rebuild of the capabilities of ModelarDB (ModelarDB-Dynamic
fork): model-based compression (PMC-Mean / Swing filter / Gorilla XOR /
uncompressed fallback), a segment table + virtual data-point view, continuous
aggregates (rollup with gap-fill), a raw->1m->1h->1d retention/downsample
pipeline with per-partition checkpoints, plus the large-scale training-data
operators (dedup, similarity search, text analysis) a 100 TB pipeline needs.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, with vectorized pandas/Arrow UDFs only for the model kernels that
Spark cannot express (never per-row Python).
"""

__version__ = "0.1.0"

from modelardb_dynamic_spark.config import EngineConfig  # noqa: F401
