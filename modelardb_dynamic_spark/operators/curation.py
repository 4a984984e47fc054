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

from pyspark.sql import DataFrame, Window
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


# -- BPE vocabulary induction ---------------------------------------------------

# Java/RE2/Python share this explicit ASCII whitespace class (Python's \s
# would also match unicode spaces the JVM split does not).
_WS = r"[ \t\n\x0b\f\r]+"


def _bpe_apply_merge(sym: list[str], left: str, right: str) -> list[str]:
    """One greedy left-to-right merge pass over a symbol sequence — the
    classic BPE application rule ("aaa" + (a,a) -> [aa, a]). Shared by the
    Spark operator (inside the Arrow batch) and the pure-Python oracle twin
    so the rule has ONE home."""
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def bpe_vocabulary(
    docs: DataFrame,
    n_merges: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE vocabulary induction (Sennrich et al., ACL 2016):
    learn the first n_merges byte-pair merges of the corpus, returned as
    (merge_rank, lhs, rhs, merged, pair_count).

    Industrial shape: the ONLY corpus-scale pass is the word count (one
    map-side-combinable shuffle). The merge loop then runs over the
    DISTINCT-word table — sublinear in corpus size by Heaps' law, and the
    part every published BPE trainer iterates on. Each iteration:
      1. adjacent symbol pairs exploded per distinct word, weighted by
         word count — map-side-combinable groupBy;
      2. the argmax pair via orderBy(...).limit(1) (TakeOrdered, no full
         sort) with a total tie order (count DESC, lhs ASC, rhs ASC) so
         induction is deterministic across partitionings and reruns;
      3. the merge applied to the symbol arrays in one Arrow-batched pass
         over distinct words (mapInPandas), localCheckpoint truncating the
         M-iteration lineage.
    The driver holds exactly one merge row per iteration, never data.

    Pair counting includes overlapping occurrences ("aaa" has two (a,a)
    pairs), matching the reference implementation; the oracle replays the
    identical algorithm in pure Python over the same parquet.
    """
    import pandas as pd

    spark = docs.sparkSession
    words = F.split(F.trim(F.col(text_col)), _WS)
    wc = (
        docs.select(F.explode(words).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # split(w, '') yields chars; drop any engine-version trailing ''
        .select(
            F.filter(F.split("w", ""), lambda c: c != "").alias("sym"),
            "cnt",
        )
    )
    cur = wc.localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            cur.where(F.size("sym") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("sym") - 2),
                        lambda i: F.struct(
                            F.col("sym")[i].alias("lhs"),
                            F.col("sym")[i + 1].alias("rhs"),
                        ),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("cnt").alias("pair_count"))
        )
        top = pairs.orderBy(
            F.desc("pair_count"), F.asc("lhs"), F.asc("rhs")
        ).limit(1).collect()
        if not top:
            break
        lhs, rhs, pc = top[0]["lhs"], top[0]["rhs"], int(top[0]["pair_count"])
        merges.append((rank, lhs, rhs, lhs + rhs, pc))

        def _apply(batches, _l=lhs, _r=rhs):
            for pdf in batches:
                pdf["sym"] = [
                    _bpe_apply_merge(list(s), _l, _r) for s in pdf["sym"]
                ]
                yield pdf

        cur = cur.mapInPandas(_apply, schema=cur.schema).localCheckpoint(
            eager=True
        )

    return spark.createDataFrame(
        pd.DataFrame(
            merges,
            columns=["merge_rank", "lhs", "rhs", "merged", "pair_count"],
        ).astype({"merge_rank": "int64", "pair_count": "int64"})
        if merges
        else pd.DataFrame(
            columns=["merge_rank", "lhs", "rhs", "merged", "pair_count"]
        ),
        schema="merge_rank long, lhs string, rhs string, merged string, "
        "pair_count long",
    )


def bpe_reference(texts: list[str], n_merges: int = 12):
    """Pure-Python BPE twin of bpe_vocabulary — the oracle's independent
    replay (collections.Counter over the same whitespace split, identical
    overlap counting, tie order, and _bpe_apply_merge rule)."""
    import re
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in re.split(_WS, t.strip()):
            if w:
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, sym in vocab.items():
            c = wc[w]
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        (lhs, rhs), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lhs, rhs, lhs + rhs, int(cnt)))
        vocab = {
            w: _bpe_apply_merge(sym, lhs, rhs) for w, sym in vocab.items()
        }
    return merges


# Symbol-boundary separator for the closed-form BPE encoder. A word's
# symbol sequence is serialized as SEP s1 SEP SEP s2 SEP SEP ... sN SEP
# (single SEP at the ends, double between symbols) so that one greedy
# left-to-right merge pass == one literal string replace of
# SEP+lhs+SEP+SEP+rhs+SEP with SEP+lhs+rhs+SEP: every symbol start is
# preceded by a SEP the pattern consumes, which (a) blocks false matches
# across symbol boundaries ("ba","aa" never matches merge (a,aa)) and
# (b) lets adjacent merges share the boundary pair ("a a a a" -> "aa aa",
# exactly _bpe_apply_merge's non-overlapping scan; property-fuzzed in
# tests). \x1f (ASCII unit separator) cannot appear inside a word: words
# come from a whitespace split of text, and any text that did contain it
# would corrupt the framing — bpe_encode filters such words out loudly.
_BPE_SEP = "\x1f"


def bpe_merge_replace_steps(merges: list[tuple]) -> list[tuple[str, str]]:
    """The learned merge table as (search, replace) literal pairs over the
    _BPE_SEP framing, in rank order — the ONE home of the closed form,
    shared by the Spark encoder and the DuckDB oracle so both engines run
    the identical replace chain. merges rows are (rank, lhs, rhs, ...)
    from bpe_vocabulary / bpe_reference, or plain (lhs, rhs) pairs."""
    s = _BPE_SEP
    out = []
    for m in merges:
        lhs, rhs = (m[1], m[2]) if len(m) >= 3 else (m[0], m[1])
        out.append((s + lhs + s + s + rhs + s, s + lhs + rhs + s))
    return out


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge table to the corpus and report per-doc
    token accounting: (id, n_words, n_chars, n_bpe_tokens,
    chars_per_token). Docs with no words (empty/whitespace text) are
    dropped — there is nothing to encode.

    Two scale decisions:
    1. The merge loop is CLOSED-FORM JVM SQL, not Python: the symbol
       sequence rides as a _BPE_SEP-framed string and each merge is one
       literal F.replace (see bpe_merge_replace_steps) — whole-stage
       codegen end to end, zero Python in the encode, and the identical
       chain replays in the DuckDB oracle.
    2. The distinct-word cache: encoding is a pure function of the word,
       so the replace chain runs once per DISTINCT word (sublinear in
       corpus size by Heaps' law) and corpus rows are charged through a
       broadcast join of the (word -> n_tokens) map — the corpus itself
       is touched by one explode and one map-side-combinable groupBy.

    merges: rows from bpe_vocabulary (merge_rank, lhs, rhs, ...) or plain
    (lhs, rhs) tuples, applied in the given order.
    """
    s = _BPE_SEP
    words = F.filter(
        F.split(F.trim(F.col(text_col)), _WS),
        lambda w: (w != "") & ~w.contains(s),
    )
    doc_words = (
        docs.select(
            F.col(id_col).alias("id"),
            F.length(F.col(text_col)).cast("long").alias("n_chars"),
            words.alias("ws"),
        )
        .where(F.size("ws") > 0)
        .select(
            "id",
            "n_chars",
            F.size("ws").cast("long").alias("n_words"),
            F.explode("ws").alias("w"),
        )
    )
    seq = F.concat(
        F.lit(s),
        F.array_join(
            F.filter(F.split("w", ""), lambda c: c != ""), s + s
        ),
        F.lit(s),
    )
    for search, repl in bpe_merge_replace_steps(merges):
        seq = F.replace(seq, F.lit(search), F.lit(repl))
    encoded = doc_words.select("w").distinct().select(
        "w", F.size(F.split(seq, s + s, -1)).cast("long").alias("w_toks")
    )
    return (
        doc_words.join(F.broadcast(encoded), "w")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.first("n_words").alias("n_words"),
            F.first("n_chars").alias("n_chars"),
            F.sum("w_toks").alias("n_bpe_tokens"),
        )
        .withColumn(
            "chars_per_token",
            F.col("n_chars").cast("double")
            / F.col("n_bpe_tokens").cast("double"),
        )
    )


def leakage_safe_splits(
    docs: DataFrame,
    pairs: DataFrame,
    val_pct: int = 10,
    test_pct: int = 10,
    id_col: str = "doc_id",
    a_col: str = "ida",
    b_col: str = "idb",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: near-duplicate documents
    MUST land in the same split (a test doc whose near-copy sits in
    train is contamination, the failure mode decontaminate() guards
    against for external benchmarks — this is the same guard applied to
    the corpus's own eval splits). Pairwise LSH output is closed
    transitively (dedup.connected_components), every document is keyed
    by its CLUSTER id (its own id if unpaired), and the split is chosen
    by the shared 60-bit md5 hash of the cluster id modulo 100:

        bucket < test_pct            -> test
        bucket < test_pct + val_pct  -> val
        else                         -> train

    Deterministic across reruns, retries, partitionings, and corpus
    GROWTH (a new doc joining an existing cluster inherits that
    cluster's split; unrelated docs never move) — the property random
    splits lack. Zero cross-split near-dup pairs BY CONSTRUCTION (both
    endpoints share a cluster id, hence a bucket).

    Returns (id_col, cluster_id, bucket, split). Scale: the components
    closure + one broadcast-eligible join; the hash/bucket is one
    map-side expression.
    """
    from modelardb_dynamic_spark.operators.dedup import (
        connected_components,
        spark_h60,
    )

    cc = connected_components(pairs, a_col, b_col)
    keyed = docs.select(id_col).join(
        cc.withColumnRenamed("id", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce("comp", F.col(id_col)).alias("cluster_id"),
    )
    bucket = F.pmod(
        spark_h60(F.col("cluster_id").cast("string")), F.lit(100)
    ).cast("int")
    return keyed.select(
        id_col,
        "cluster_id",
        bucket.alias("bucket"),
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def curation_verdict(
    docs: DataFrame,
    lang: str = "en",
    min_words: int = 30,
    max_hamming: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """The standard pre-training filter chain as ONE stage: per document
    a keep/drop verdict with per-reason flags, composing the engine's
    own operators — exact dedup (md5 canonical-survivor), near-dup
    clustering (SimHash pairs closed transitively, min-id survivor),
    language gate (marker-stopword lang_id), and Gopher document
    quality (composite keep). A curation run is exactly this chain; the
    reasons column set makes the drop auditable (every flag is itself
    value-gated through its component's oracle).

    Returns (doc_id, exact_dup_loser, near_dup_loser, lang_ok,
    quality_ok, keep) — keep = no dup-loss AND lang AND quality.

    Scale: each component keeps its own documented shuffle shape (hash
    groupBy; LSH + log-round connected components; map-side language and
    quality scoring); the verdict adds three doc_id equi-joins on
    already-keyed results, nothing quadratic.
    """
    from modelardb_dynamic_spark.operators.dedup import (
        dup_clusters,
        simhash_pairs,
    )
    from modelardb_dynamic_spark.operators.textstats import (
        gopher_quality,
        lang_id,
    )

    ex = (
        docs.select(F.col(id_col), F.md5(F.col("text")).alias("fp"))
        .join(
            docs.groupBy(F.md5(F.col("text")).alias("fp")).agg(
                F.min(id_col).alias("keep_id")
            ),
            "fp",
        )
        .select(
            id_col,
            (F.col(id_col) != F.col("keep_id")).alias("exact_dup_loser"),
        )
    )
    nd = dup_clusters(docs, simhash_pairs(docs, max_hamming=max_hamming))
    nd = nd.select(id_col, (~F.col("keep")).alias("near_dup_loser"))
    li = lang_id(docs).select(
        id_col, (F.col("pred_lang") == lang).alias("lang_ok")
    )
    gq = gopher_quality(docs, min_words=min_words).select(
        id_col, F.col("keep").alias("quality_ok")
    )
    return (
        ex.join(nd, id_col)
        .join(li, id_col)
        .join(gq, id_col)
        .withColumn(
            "keep",
            ~F.col("exact_dup_loser")
            & ~F.col("near_dup_loser")
            & F.col("lang_ok")
            & F.col("quality_ok"),
        )
    )


def source_health(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus health rollup — the dashboard a data-mixing
    decision starts from: per source, document/token/char volume,
    language spread with the dominant language (deterministic ties:
    count DESC, lang ASC), and the fraction of its docs whose text is an
    exact duplicate of ANY corpus doc (cross-source contamination shows
    up here even when each source is internally deduped).

    Exactness: every aggregate is an exact int64 (tokens via the shared
    whitespace split, duplicates via corpus-wide md5 fingerprint
    counts); mean_tokens and dup_frac are the only float ops, one shared
    division each.

    Scale: token counting is per-row expression work (no explode); the
    fingerprint table is one map-side-combinable groupBy joined back on
    the hash (corpus-sized but tiny rows); the rollup itself is one
    groupBy over |sources| groups, and the dominant-language window runs
    over the |sources| x |langs| matrix, never doc rows.
    """
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: w != "",
    )
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.size(words).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        F.md5(F.col(text_col)).alias("fp"),
    )
    from pyspark.sql import Window

    from modelardb_dynamic_spark.operators.dedup import _materialize

    base = _materialize(base)
    fp_cnt = base.groupBy("fp").agg(F.count(F.lit(1)).alias("fpc"))
    flagged = base.join(fp_cnt, ["fp"]).withColumn(
        "is_dup", F.when(F.col("fpc") >= 2, F.lit(1)).otherwise(F.lit(0))
    )
    agg = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_chars").alias("chars"),
        F.sum("is_dup").alias("dup_docs"),
    )
    lang_rank = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("lc"))
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.desc("lc"), F.asc("lang")
                )
            ),
        )
        .where(F.col("r") == 1)
        .selectExpr("source", "lang AS top_lang", "lc AS top_lang_docs")
    )
    return agg.join(lang_rank, ["source"]).selectExpr(
        "source",
        "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n_langs AS BIGINT) AS n_langs",
        "top_lang",
        "CAST(top_lang_docs AS BIGINT) AS top_lang_docs",
        "CAST(tokens AS BIGINT) AS tokens",
        "CAST(chars AS BIGINT) AS chars",
        "CAST(tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_tokens",
        "CAST(dup_docs AS BIGINT) AS dup_docs",
        "CAST(dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_frac",
    )


def skew_audit(df: DataFrame, key_col: str) -> DataFrame:
    """Hot-key skew audit — the question to ask BEFORE shuffling on a
    key at 100 TB: per distinct key, its exact row count, frequency
    share, Lorenz cumulative share (keys ranked ascending by count, key
    ASC ties), and the distribution's Gini coefficient
        G = 2*sum(i * x_i) / (n * sum(x)) - (n + 1) / n
    (the discrete closed form over ascending-sorted counts). G ~ 0 means
    uniform keys (shuffle-safe); G -> 1 means a handful of keys carry
    the table (salt or isolate them — operators/compress.py's time-range
    salting is the engine's own remedy).

    Exactness: counts, ranks, and rank-weighted sums are exact int64
    (tie order cannot change sum(i*x_i): tied x are equal); share /
    cum_share / gini are shared IEEE divisions. Scale notes: ONE
    map-side-combinable groupBy over the corpus; every window after it
    runs on the distinct-key table. The single-partition rank window is
    key-cardinality-bounded — the audit's own premise is that this
    table is small; if keys are unbounded, audit a bucketed prefix."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w = Window.partitionBy().orderBy(F.asc("n_rows"), F.asc("key"))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("total", F.sum("n_rows").over(wall))
        .withColumn("n_keys", F.count(F.lit(1)).over(wall))
        .withColumn("cum", F.sum("n_rows").over(wcum))
        .withColumn(
            "sum_ix",
            F.sum(F.col("rank") * F.col("n_rows")).over(wall),
        )
        .selectExpr(
            "key",
            "CAST(n_rows AS BIGINT) AS n_rows",
            "rank",
            "CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE) AS share",
            "CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share",
            "CAST(2 * sum_ix AS DOUBLE) / CAST(n_keys * total AS DOUBLE) "
            "- CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE) AS gini",
        )
    )


def profile_columns(
    df: DataFrame,
    str_cols: list[str],
    int_cols: list[str],
) -> DataFrame:
    """Typed column profiling — the data-quality first look, long-form:
    one row per profiled column with exact n_rows / n_nulls /
    n_distinct, typed min/max (BIGINT columns in min_int/max_int,
    STRING columns lexicographically in min_str/max_str — ASCII byte
    order agrees across engines; doubles are deliberately out of scope
    because double->string FORMATTING diverges between engines), and
    the modal value (ties: count DESC, value ASC) with its count.

    Exactness: every statistic is an exact integer or a native-type
    min/max; no floats anywhere. Scale notes (100 TB): per column, one
    map-side-combinable value-count groupBy (the same pass yields
    distinct count, mode, and null count) + a TakeOrdered(1) for the
    mode; columns profile independently (the union is column-count
    sized). Profile a sampled or bucketed prefix if a column's value
    cardinality itself is corpus-scale."""
    spark = df.sparkSession
    outs = []
    for c, kind in [(c, "s") for c in str_cols] + [
        (c, "i") for c in int_cols
    ]:
        cast = "STRING" if kind == "s" else "BIGINT"
        vals = df.selectExpr(f"CAST({c} AS {cast}) AS v")
        cnt = vals.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
        top = (
            cnt.where(F.col("v").isNotNull())
            .orderBy(F.desc("n"), F.asc("v"))
            .limit(1)
            .selectExpr(
                "CAST(v AS STRING) AS top_value",
                "CAST(n AS BIGINT) AS top_count",
            )
        )
        agg = cnt.agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("v").isNull(), F.col("n"))), F.lit(0)
            )
            .cast("long")
            .alias("n_nulls"),
            F.count(F.when(F.col("v").isNotNull(), F.lit(1)))
            .cast("long")
            .alias("n_distinct"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        prof = agg.crossJoin(top).selectExpr(
            f"'{c}' AS col",
            "n_rows",
            "n_nulls",
            "n_distinct",
            f"CAST({'NULL' if kind == 's' else 'mn'} AS BIGINT) AS min_int",
            f"CAST({'NULL' if kind == 's' else 'mx'} AS BIGINT) AS max_int",
            f"CAST({'mn' if kind == 's' else 'NULL'} AS STRING) AS min_str",
            f"CAST({'mx' if kind == 's' else 'NULL'} AS STRING) AS max_str",
            "top_value",
            "top_count",
        )
        outs.append(prof)
    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res


def fk_audit(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity audit of a foreign-key edge, both
    directions at once: orphan child rows (key absent from the parent —
    broken joins waiting to happen; NULL keys count as orphans, they
    join to nothing) and childless parent keys (unreferenced dimension
    rows — retention/bloat signal). The load-time contract check every
    warehouse join silently assumes.

    One row: n_child, n_orphan, n_parent_keys, n_childless_keys, and
    the two shares as single shared divisions. All counts exact int64.

    Scale notes: child rows collapse to per-key counts map-side first,
    then ONE full-outer hash join against the distinct parent keys and
    one global aggregation — a single shuffle each side, no windows, no
    driver-side loops (NULL keys ride the join as a non-matching group,
    which both engines treat identically)."""
    pk = (
        parent.selectExpr(f"{parent_key} AS k")
        .where(F.col("k").isNotNull())
        .distinct()
        .withColumn("in_p", F.lit(1))
    )
    ckc = child.selectExpr(f"{child_key} AS k").groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    u = ckc.join(pk, ["k"], "full_outer")
    return u.agg(
        F.sum(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("n_child"),
        F.sum(
            F.expr("CASE WHEN in_p IS NULL THEN coalesce(cnt, 0) ELSE 0 END")
        ).cast("long").alias("n_orphan"),
        F.sum(F.expr("CASE WHEN in_p = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_parent_keys"),
        F.sum(
            F.expr("CASE WHEN in_p = 1 AND cnt IS NULL THEN 1 ELSE 0 END")
        ).cast("long").alias("n_childless_keys"),
    ).selectExpr(
        "*",
        "CASE WHEN n_child > 0 THEN CAST(n_orphan AS DOUBLE)"
        " / CAST(n_child AS DOUBLE) END AS orphan_share",
        "CASE WHEN n_parent_keys > 0 THEN CAST(n_childless_keys AS DOUBLE)"
        " / CAST(n_parent_keys AS DOUBLE) END AS childless_share",
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_expr: str,
    id_col: str = "doc_id",
    seed: str = "ws1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis): keep the k rows with the largest
    u^(1/w) — computed in log space as log2(u)/w, so selection
    probability tilts toward weight while every row keeps a chance.
    The curation primitive for "give me 1M docs, proportional to
    quality/length, reproducibly" — a thing rand()-ordering cannot do
    (not weighted) and weight-proportional top-k cannot do either
    (deterministic top-w only ever picks the heaviest).

    Exactness/determinism: u is the shared 60-bit md5 hash of
    (seed || id) + 1 (never 0); log2(u) comes from the shared
    log2_int_stages IEEE tree; the E-S key is es = (l2u - 60) / w
    (= log2(u / 2^60) / w, a monotone transform of u^(1/w)), one
    division per row on exact inputs — bit-identical in both engines,
    ranked (es DESC, id ASC). weight_expr must be a positive BIGINT
    expression.

    Scale notes: stateless per-row hashing + a global top-k
    (TakeOrderedAndProject — no full sort, no shuffle of the corpus);
    changing the seed string re-rolls the whole sample."""
    from modelardb_dynamic_spark.operators.dedup import spark_h60
    from modelardb_dynamic_spark.operators.textstats import log2_int_stages

    base = docs.selectExpr(
        f"{id_col} AS id",
        f"CAST({weight_expr} AS BIGINT) AS w",
    ).where(F.col("w") > 0)
    hashed = base.withColumn(
        "u",
        spark_h60(F.concat(F.lit(seed + "|"), F.col("id").cast("string")))
        + F.lit(1),
    )
    for name, expr in log2_int_stages("u", "l2u"):
        hashed = hashed.selectExpr("*", f"{expr} AS {name}")
    scored = hashed.selectExpr(
        "id",
        "w",
        "(l2u - CAST(60 AS DOUBLE)) / CAST(w AS DOUBLE) AS es_key",
    )
    return scored.orderBy(F.desc("es_key"), F.asc("id")).limit(k)
