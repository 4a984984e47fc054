"""Deterministic synthetic transcript table (the engine's primary input).

Schema per BASELINE.json input_hint:
    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Generation is pure Spark SQL expressions seeded by xxhash64(conv, turn) —
no driver-side loops, no RNG state — so the same (n_convs, scale) always
produces byte-identical tables at any parallelism, and generation scales to
bench sizes (10^7 turns) without driver memory.

Injected structure (FIXTURES.md §1-2):
- Zipf-ish skew: turns(c) ∝ (c+1)^-0.7, so low conv ids are hot
  (exercises salting / skew handling).
- inter-turn deltas switch regime per 32-turn block (15s / 30s / 60s) with
  ~2% gap turns (delta = k*SI, k in 2..9) — mirrors the reference's gap
  flush semantics (core/SegmentGenerator.java:165-185).
- text = deterministic words from a small vocab; word count per turn has
  constant runs (PMC-friendly), linear ramps for conv id % 7 == 3
  (Swing-friendly), and hash noise otherwise (Gorilla-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EPOCH0_MS = 1_700_000_000_000  # 2023-11-14T22:13:20Z, fixed origin
SI_MS = 60_000

_VOCAB = (
    "the spark segment model stream rollup window batch merge scan "
    "filter join bucket gap swing mean delta bits codec tier"
).split()


def _u(col_expr, salt: int):
    """Deterministic uniform [0, 1) from arbitrary columns."""
    return (F.pmod(F.xxhash64(col_expr, F.lit(salt)), F.lit(1_000_000)) / 1_000_000.0)


def generate_transcripts(
    spark: SparkSession,
    n_convs: int,
    turns_base: int = 64,
    si_ms: int = SI_MS,
    parallelism: int | None = None,
) -> DataFrame:
    """Build the transcript DataFrame. Total turns ~= n_convs * turns_base
    with Zipf-ish skew (hot conv 0 gets ~20x the median)."""
    parallelism = parallelism or spark.sparkContext.defaultParallelism
    convs = (
        spark.range(0, n_convs, 1, parallelism)
        .withColumnRenamed("id", "c")
        .withColumn("conv_id", F.format_string("conv%08d", F.col("c")))
        # Zipf-ish turn counts, clamped to [4, 20*turns_base]
        .withColumn(
            "n_turns",
            F.greatest(
                F.lit(4),
                F.least(
                    F.lit(20 * turns_base),
                    (turns_base * 3.0 / F.pow(F.col("c") + 1, F.lit(0.7))).cast("int"),
                ),
            ),
        )
    )
    # hash-distribute conversations BEFORE the explode: the Zipf head is
    # range-concentrated (convs 0..k hold most turns), so contiguous
    # range partitions skew brutally at large turns_base (measured: one
    # task carrying ~1/3 of a 618M-turn synthesis). Row VALUES are pure
    # (c, turn_idx) hash functions, so layout does not affect content.
    convs = convs.repartition(parallelism, "c")
    turns = convs.select(
        "c",
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = F.xxhash64("c", "turn_idx")
    block = (F.col("turn_idx") / 32).cast("long")  # regime block
    # inter-turn delta: regime base 15s/30s/60s per block, ~2% gaps of 2-9 SI
    regime = F.pmod(F.xxhash64("c", block, F.lit(1)), F.lit(3))
    base_delta = F.element_at(
        F.array(F.lit(si_ms // 4), F.lit(si_ms // 2), F.lit(si_ms)),
        (regime + 1).cast("int"),
    )
    gap_mult = F.when(
        _u(h, 2) < 0.02, (F.pmod(F.xxhash64("c", "turn_idx", F.lit(3)), F.lit(8)) + 2)
    ).otherwise(F.lit(0))
    delta = base_delta + gap_mult * si_ms
    # word count: ramp convs (c%7==3) grow linearly; others constant per
    # block with +-30% hash noise
    base_words = (F.pmod(F.xxhash64("c", block, F.lit(4)), F.lit(40)) + 5).cast("int")
    words = (
        F.when(F.pmod(F.col("c"), F.lit(7)) == 3, (5 + F.col("turn_idx") / 2).cast("int"))
        .otherwise((base_words * (0.7 + 0.6 * _u(h, 5))).cast("int"))
    )
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    word_at = F.element_at(
        vocab, (F.pmod(F.xxhash64("c", "turn_idx", F.lit(6)), F.lit(len(_VOCAB))) + 1).cast("int")
    )
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"))
    tools = F.array(F.lit("bash"), F.lit("search"), F.lit("edit"))
    out = (
        turns.withColumn("delta_ms", delta)
        .withColumn(
            "off_ms",
            F.sum("delta_ms").over(
                Window.partitionBy("c")
                .orderBy("turn_idx")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            - F.col("delta_ms"),
        )
        .withColumn(
            "ts",
            F.timestamp_millis(
                F.lit(EPOCH0_MS) + F.pmod(F.col("c"), F.lit(997)) * (37 * si_ms) + F.col("off_ms")
            ),
        )
        .withColumn("role", F.element_at(roles, (F.pmod(F.col("turn_idx"), F.lit(3)) + 1).cast("int")))
        .withColumn(
            "tool",
            F.when(
                F.col("role") == "tool",
                F.element_at(tools, (F.pmod(h, F.lit(3)) + 1).cast("int")),
            ).otherwise(F.lit(None).cast("string")),
        )
        .withColumn(
            "text",
            # words+1 copies of word_at joined by spaces; string repeat is
            # ~60x cheaper than materializing a per-row array and joining
            F.concat(
                F.format_string("t%d ", F.col("turn_idx")),
                F.repeat(F.concat(word_at, F.lit(" ")), words),
                word_at,
            ),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            "role",
            "text",
            "tool",
            "ts",
        )
    )
    return out
