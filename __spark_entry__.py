"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship pipeline (events -> per-minute series ->
model-compressed segments -> gap-filled hourly rollup) at sf0.001.
queries()/oracle_sql() expose every implemented operator; see
modelardb_dynamic_spark/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from modelardb_dynamic_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_rollup_1h_gapfill(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return Q.build_oracles()
