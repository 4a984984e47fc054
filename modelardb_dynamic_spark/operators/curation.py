"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup: benchmark decontamination and deterministic stratified
sampling. No reference counterpart (the reference is a time-series
engine); these extend the LLM-pipeline operator family the same way
operators/dedup.py and operators/textstats.py do, with every computation
closed-form-replayable in the DuckDB oracle.

100 TB design notes are on each operator; the common theme is that both
are map-side only over the corpus: decontamination broadcasts the small
benchmark gram set (eval suites are MBs even when the corpus is 100 TB)
and sampling is a pure deterministic filter — neither shuffles corpus
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modelardb_dynamic_spark.operators.dedup import _shingles, spark_h60


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag every corpus document sharing at
    least one word n-gram with an evaluation set (the GPT-3/C4-style
    n-gram overlap rule; n=13 is the published default).

    Returns (id, n_contaminated, contaminated) for ALL corpus docs —
    n_contaminated counts DISTINCT overlapping grams, so downstream can
    threshold harder than "any overlap".

    Scale shape: the benchmark's distinct gram set is tiny relative to
    any training corpus, so it is broadcast and the corpus side is a
    map-side semi-join-and-count — corpus rows never shuffle; the only
    exchange is the per-doc count aggregation on the (rare) hit rows.
    Grams compare by the shared 60-bit md5 hash (dedup.spark_h60), which
    the DuckDB oracle recomputes bit-identically."""
    bench_grams = (
        benchmark.select(F.explode(_shingles(text_col, n)).alias("g"))
        .select(spark_h60(F.col("g")).alias("gh"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(text_col, n)).alias("g"),
    ).select("id", spark_h60(F.col("g")).alias("gh"))
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gh")
        .groupBy("id")
        .agg(F.countDistinct("gh").alias("n_contaminated"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
            (F.coalesce(F.col("n_contaminated"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    h60(id) % 1_000_000 < round(fraction * 1e6) for its stratum.

    Unlike rand()-based df.sample this is a pure function of the row id:
    re-runs, retried tasks, and different partitionings all select the
    SAME rows (sampling 100 TB with rand() is not reproducible across
    stage retries), and the selection is exactly replayable in SQL, so
    the oracle value-gates it. Map-side only — no shuffle, no state; the
    fraction map rides into the plan as a literal CASE."""
    frac_col = F.lit(float(default_fraction))
    for k, v in sorted(fractions.items()):
        frac_col = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(
            frac_col
        )
    threshold = F.round(frac_col * 1_000_000).cast("long")
    bucket = F.pmod(spark_h60(F.col(id_col).cast("string")), F.lit(1_000_000))
    return docs.filter(bucket < threshold)


def pack_documents(
    docs: DataFrame,
    window_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic contiguous sequence packing for pretraining batch
    construction: documents are laid end-to-end in id order and cut into
    fixed token windows. Each doc reports the bin its first token lands
    in, its offset inside that bin, and how many bins it spans (a doc
    straddling a boundary is split downstream at exactly these offsets).

    Tokens = whitespace-separated words here (swap in a BPE count column
    upstream without changing the packing). Deterministic and exactly
    SQL-replayable: bin_id = floor(start_offset / window) where
    start_offset is the exclusive prefix sum of token counts in id order.

    Scale shape: one global sort-by-id (a range-partitioned exchange —
    unavoidable for a globally contiguous layout; at 100 TB shard first
    by a corpus partition key and pack within shards) and one window
    prefix sum — no other shuffle, no Python."""
    from pyspark.sql import Window

    n_tok = F.size(F.split(F.col(text_col), r"\s+")).cast("long")
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(F.sum(n_tok).over(w), F.lit(0))
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        start.alias("start_offset"),
        (start / window_tokens).cast("long").alias("bin_id"),
        F.pmod(start, F.lit(window_tokens)).alias("offset_in_bin"),
        (
            (start + n_tok - 1) / window_tokens
        ).cast("long").alias("end_bin_id"),
    )
