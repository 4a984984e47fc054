"""Deduplication operators for large-scale document pipelines.

All variants are expressed as shuffles on compact keys (never pairwise
cross joins): exact dedup hashes the full text; near-dup variants build a
compact signature per document (vectorized numpy inside a pandas UDF),
explode into candidate buckets, and only join WITHIN buckets — the standard
MinHash/LSH / SimHash banding shape that scales linearly in corpus size
for a fixed collision rate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# -- exact -------------------------------------------------------------------


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the
    canonical (minimum) id and the duplicate count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# -- n-gram Jaccard (exact set similarity) ------------------------------------


def _shingles(text_col: str, n: int):
    """Distinct word n-gram shingles as an array column (pure SQL)."""
    words = F.split(F.col(text_col), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """All (a, b) id pairs with word-n-gram Jaccard >= threshold.

    Shape: explode shingles -> self equi-join on shingle -> count shared ->
    join sizes -> filter. The join key is the shingle, so only documents
    sharing at least one shingle ever meet (no O(N^2) cross join).

    max_df caps posting-list length: shingles appearing in more than max_df
    documents (stop-phrases) are dropped from BOTH the intersection and the
    set sizes, so the score is Jaccard over discriminative shingles. Without
    the cap one hot shingle shared by 10^6 docs creates a 10^12-candidate
    join bucket — the standard frequency-cap trick keeps the self-join
    linear in corpus size. The blacklist of hot shingles is tiny, so the
    anti-join broadcasts."""
    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(_shingles(text_col, n)).alias("s")
    )
    if max_df is not None:
        hot = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("s")
        )
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
    sh = _materialize(sh)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("ida"), F.col("b.id").alias("idb"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("id", "ida").withColumnRenamed("sz", "sza"), "ida")
        .join(sizes.withColumnRenamed("id", "idb").withColumnRenamed("sz", "szb"), "idb")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("sza") + F.col("szb") - F.col("shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("ida", "idb", "jaccard")
    )



def _materialize(df: DataFrame) -> DataFrame:
    """Materialize a compact intermediate before a self-join: Spark
    re-executes the full upstream plan for EACH side of a self-join (the
    signature pipeline twice — measured ~2x wall), while an eager
    localCheckpoint computes it once and truncates the lineage. The
    checkpointed data is the compact (id, key) rows, orders of magnitude
    smaller than the inputs."""
    return df.localCheckpoint(eager=True)


# -- shared 60-bit hash primitive ---------------------------------------------
#
# Every signature operator hashes strings with the first 15 hex digits of
# md5 — a 60-bit hash both engines compute natively and bit-identically:
#   Spark:  cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)
#   DuckDB: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
# so MinHash/SimHash/winnowing run as pure JVM-side SQL (whole-stage
# codegen, no Python) AND have value-level DuckDB oracles.

P31 = 2_147_483_647  # 2^31-1; MinHash permutation modulus (a*h+b fits i64)


def spark_h60(col) -> "F.Column":
    """60-bit md5-prefix hash as a Spark column expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def duck_h60(expr: str) -> str:
    """The same 60-bit hash as a DuckDB SQL fragment."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def py_h60(s: str) -> int:
    """The same 60-bit hash driver-side (probe literals, permutation
    constants) — the third twin beside spark_h60/duck_h60; keep all
    three in this file so a hash change has ONE home."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def minhash_params(num_perm: int) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) permutation parameters derived from md5 so the
    oracle can embed the identical constants as SQL literals."""
    a = [py_h60(f"minhash-a-{j}") % (P31 - 1) + 1 for j in range(num_perm)]
    b = [py_h60(f"minhash-b-{j}") % P31 for j in range(num_perm)]
    return a, b


def minhash_signatures(
    docs: DataFrame,
    num_perm: int = 64,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures as pure SQL: each distinct
    word n-gram shingle is hashed once (60-bit md5 prefix, reduced mod
    2^31-1); permutation j is min over shingles of (a_j*h + b_j) mod
    2^31-1, expressed as 64 min-AGGREGATES over exploded shingle rows.

    Why explode + groupBy rather than array expressions: Catalyst's
    projection collapse re-inlines a projected hash-array column into every
    downstream expression, so 64 array_min(transform(hs, ...)) terms each
    recompute the md5s — 64x the hash work (measured 2.5x slower
    end-to-end). The aggregation form computes each hash exactly once, and
    map-side partial aggregation means the shuffle carries 64 longs per
    document, never the shingle stream."""
    a_params, b_params = minhash_params(num_perm)
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(text_col, n)).alias("s"),
    ).select("id", (spark_h60("s") % P31).alias("h"))
    mins = sh.groupBy("id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % P31).alias(f"m{j}")
            for j, (a, b) in enumerate(zip(a_params, b_params))
        ]
    )
    sig = F.array(*[F.col(f"m{j}") for j in range(num_perm)])
    return mins.select("id", sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash: documents agreeing on
    all rows of any band meet in a bucket (bucket key = hash of the band
    slice); pairs are deduped across bands."""
    rows_per_band = num_perm // bands
    sig = minhash_signatures(docs, num_perm, n, id_col, text_col)
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    banded = _materialize(banded)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("ida"), F.col("b.id").alias("idb"))
        .distinct()
    )


# -- SimHash -------------------------------------------------------------------


SIMHASH_BITS = 60  # the shared md5-prefix hash is 60 bits wide
SIMHASH_CHUNK = 15  # 4 x 15-bit banding


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash long): 60-bit SimHash — bit i set iff the sum of
    (+1/-1) votes from token-hash bit i over all tokens is positive.
    Tokens are hashed once (shared 60-bit md5 prefix); explode + groupBy
    with map-side combine means the shuffle carries one partial row per
    doc, never the token stream."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("w"),
    ).select("id", spark_h60("w").alias("h"))
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    sig = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return bit_sums.select("id", sig.cast("long").alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    60-bit SimHash per doc (sign of per-bit weighted sums of token hashes),
    candidates via 4x15-bit chunk banding (any pair within Hamming <= 3
    agrees on at least one chunk), exact popcount filter after. Pure SQL
    end-to-end, so the DuckDB oracle replays it exactly."""
    sh = simhash_signatures(docs, id_col, text_col)
    chunks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright(F.col("simhash"), i * SIMHASH_CHUNK)
                        .bitwiseAND(F.lit((1 << SIMHASH_CHUNK) - 1))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("cc"),
    ).select("id", "simhash", "cc.chunk", "cc.key")
    chunks = _materialize(chunks)
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("ida"),
            F.col("b.id").alias("idb"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    ).where(F.col("hamming") <= max_hamming).select("ida", "idb", "hamming")


# -- embedding cosine near-dup -------------------------------------------------


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    dim: int | None = None,
    n_probe_flips: int = 1,
) -> DataFrame:
    """Near-duplicate vectors by cosine >= threshold, bucketed by random
    hyperplane signatures (deterministic seed) so only candidate pairs are
    compared exactly. MULTI-PROBE: with n_probe_flips=1, pairs whose
    signatures differ in at most one bit also become candidates — a
    near-duplicate pair straddling one hyperplane (the single-probe recall
    cliff) still meets. One side emits only its home signature; the other
    emits home plus every 1-bit flip, so the candidate volume grows by
    (1 + n_planes)x on one side only, never quadratically."""
    from modelardb_dynamic_spark.operators.similarity import hyperplane_signature

    sig = _materialize(
        hyperplane_signature(embeddings, id_col, vec_col, n_planes, seed=11, dim=dim)
    )
    probes = [F.col("sig")]
    if n_probe_flips >= 1:
        probes += [
            F.col("sig").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)
        ]
    b_probed = sig.withColumn("psig", F.explode(F.array(*probes)))
    a = sig.alias("a")
    b = b_probed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.psig")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("ida"),
            F.col("b.id").alias("idb"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
    )  # each pair matches exactly one probe (home XOR one distinct flip)
    from modelardb_dynamic_spark.operators.similarity import dot_fold, norm_fold

    return (
        cand.withColumn(
            "cosine",
            dot_fold(F.col("va"), F.col("vb"))
            / (norm_fold(F.col("va")) * norm_fold(F.col("vb"))),
        )
        .where(F.col("cosine") >= threshold)
        .select("ida", "idb", "cosine")
    )


def dedup_stream(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    within_watermark: bool = False,
) -> DataFrame:
    """STREAMING exact dedup: the first-arriving doc per content hash
    survives; later duplicates are dropped by Spark's built-in stateful
    dropDuplicates, whose state (the seen-hash set) is partitioned by
    fingerprint across executors and checkpointed — the online twin of
    exact_dedup for ingest-time dedup of a document firehose.

    State growth: for archival dedup the hash set legitimately grows with
    the distinct corpus (16 B md5 + id per distinct doc — ~1.6 TB of
    distributed state per 10^11 docs, partitioned, RocksDB-backed). When
    only a dedup horizon is needed, pass within_watermark=True and attach
    an event-time watermark upstream: dropDuplicatesWithinWatermark lets
    Spark evict state older than the horizon."""
    fp = docs_stream.withColumn("fp", F.md5(F.col(text_col)))
    if within_watermark:
        return fp.dropDuplicatesWithinWatermark(["fp"])
    return fp.dropDuplicates(["fp"])


def connected_components(
    pairs: DataFrame,
    a_col: str = "ida",
    b_col: str = "idb",
    max_iter: int = 50,
) -> DataFrame:
    """Distributed connected components over a dup-pair edge list:
    alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14). Returns (id, comp)
    for every id that appears in an edge, comp = MIN id of its component
    (ids absent from any pair are singletons — callers coalesce).

    Scale notes (100 TB): each iteration is two bounded shuffles (a
    groupBy-min keyed on node + a join on node) — no collect_set, so a
    hot node (one doc near-duplicated a million times) never builds a
    single giant row; convergence is O(log n) iterations regardless of
    component diameter (a chain of length 10^6 converges in ~20 rounds,
    where naive min-label propagation needs 10^6). localCheckpoint per
    iteration truncates the lineage so the plan stays flat. The fixed
    point is checked EXACTLY: same row count and an empty exceptAll vs
    the previous (checkpointed) edge set — two cheap jobs per iteration
    on the compact edge list, immune to hash-sum collisions.
    """
    # materialize the initial edges: the first iteration references them
    # ~4x (sym = e + swap, the min-join, the distinct), which would
    # re-execute the upstream pair pipeline (e.g. the full simhash LSH)
    # that many times
    e = _materialize(
        pairs.selectExpr(f"{a_col} AS u", f"{b_col} AS v")
        .where("u IS NOT NULL AND v IS NOT NULL AND u != v")
        .distinct()
    )

    prev_e, prev_n = None, -1
    for _ in range(max_iter):
        # large-star: every neighbor LARGER than u points to
        # min(N(u) + {u}) — breaks long chains in half each round
        sym = e.unionByName(e.selectExpr("v AS u", "u AS v"))
        m = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least("mv", "u").alias("m")
        )
        e = (
            sym.where("v > u")
            .join(m, "u")
            .selectExpr("v AS u", "m AS v")
            .where("u != v")
            .distinct()
        )
        # small-star: after large-star every edge points downward; each
        # node and its smaller neighbors all re-point at their minimum
        mm = e.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            e.join(mm, "u")
            .where("v != m")
            .selectExpr("v AS u", "m AS v")
            .unionByName(mm.selectExpr("u", "m AS v"))
            .where("u != v")
            .distinct()
            .localCheckpoint()
        )
        n = e.count()
        if (
            prev_e is not None
            and n == prev_n
            and e.exceptAll(prev_e).isEmpty()
        ):
            break
        prev_e, prev_n = e, n
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
    # fixed point: e is a star forest (u -> component min); roots appear
    # only on the v side and map to themselves
    roots = e.select(F.col("v").alias("u")).distinct().join(
        e.select("u"), "u", "left_anti"
    )
    return (
        e.selectExpr("u AS id", "v AS comp")
        .unionByName(roots.selectExpr("u AS id", "u AS comp"))
    )


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "ida",
    b_col: str = "idb",
) -> DataFrame:
    """Near-dup clustering: close the dup-pair relation transitively
    (connected_components) and pick one canonical survivor per cluster
    (the MIN id — deterministic across reruns and partitionings).
    Returns (id_col, cluster_id, keep): keep marks the survivor; docs in
    no pair are their own singleton cluster and always kept. This is the
    step that turns pairwise LSH output into an actual dedup decision
    (a doc may pair with A and B that never paired with each other)."""
    cc = connected_components(pairs, a_col, b_col)
    return docs.select(id_col).join(
        cc.withColumnRenamed("id", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce("comp", F.col(id_col)).alias("cluster_id"),
        (F.coalesce("comp", F.col(id_col)) == F.col(id_col)).alias("keep"),
    )


# -- exact substring duplication (ExactSubstr audit) ---------------------------


def duplicated_spans(
    docs: DataFrame,
    min_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-duplication audit — the ExactSubstr rule of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al., ACL 2022) as a relational plan: every maximal token span whose
    EVERY min_len-token window occurs >= 2 times anywhere in the corpus
    (other documents or a repeat inside the same one), merged per
    document, reported as doc-level duplication stats.

    Shape (never a pairwise doc join):
      1. one shingle row per token position: (id, p, h60(window)) —
         O(total_tokens) compact rows;
      2. occurrence count per shingle hash — map-side-combinable groupBy
         whose output is bounded by DISTINCT shingles;
      3. seeds = positions whose shingle count >= 2, recovered with one
         hash join back on the 60-bit key;
      4. maximal spans = gaps-and-islands over seed positions per doc
         (one id-partitioned window; two seeds merge when their windows
         overlap or touch, p2 - p1 <= min_len), then per-doc totals.

    Only documents with at least one duplicated span are returned:
    (doc_id, total_tokens, n_spans, dup_tokens, dup_frac). All counts are
    exact integers; the single division is one shared IEEE expression.

    The 60-bit shingle hash makes a false seed possible at ~10^9 distinct
    shingles (birthday bound) — the identical h60 is replayed by the
    DuckDB oracle, so the gate pins the rule, not a stringly ideal.
    Reference has no counterpart (text corpus curation, SURVEY beyond-§2).
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = docs.select(
        F.col(id_col).alias("id"), words.alias("w"), F.size(words).alias("n")
    ).where(F.col("n") >= min_len)
    sh = toks.select(
        "id",
        "n",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - min_len),
                lambda p: spark_h60(
                    F.array_join(F.slice("w", p + 1, min_len), " ")
                ),
            )
        ).alias("p", "h"),
    )
    sh = _materialize(sh)  # shingling feeds both the count and the join
    cnt = sh.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    seeds = sh.join(cnt.where(F.col("c") >= 2).select("h"), "h").select(
        "id", "n", "p"
    )
    from pyspark.sql import Window

    byp = Window.partitionBy("id").orderBy("p")
    flagged = seeds.select(
        "id",
        "n",
        "p",
        F.when(
            F.lag("p").over(byp).isNull()
            | ((F.col("p") - F.lag("p").over(byp)) > min_len),
            1,
        )
        .otherwise(0)
        .alias("new_span"),
    )
    isl = flagged.select(
        "id",
        "n",
        "p",
        F.sum("new_span")
        .over(byp.rowsBetween(Window.unboundedPreceding, 0))
        .alias("g"),
    )
    spans = isl.groupBy("id", "g").agg(
        F.first("n").alias("n"),
        (F.max("p") + min_len - F.min("p")).alias("span_tokens"),
    )
    return (
        spans.groupBy(F.col("id").alias(id_col))
        .agg(
            F.first("n").cast("long").alias("total_tokens"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("span_tokens").cast("long").alias("dup_tokens"),
        )
        .withColumn(
            "dup_frac",
            F.col("dup_tokens").cast("double")
            / F.col("total_tokens").cast("double"),
        )
    )


def novelty_scores(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Temporal novelty audit over the corpus in id order: what fraction
    of each document's distinct word n-gram shingles appears here for the
    FIRST time (no earlier doc — smaller id — contains them)? The
    complement of a duplication score with a direction: a crawl/stream
    whose novel_frac trends toward 0 has stopped adding information,
    regardless of whether any single pair crosses a near-dup threshold.

    First occurrence is a pure relational notion: min(id) per shingle
    hash (shared 60-bit md5 prefix — the corpus-wide shingle table
    already bounded by DISTINCT shingles), joined back on the 60-bit
    key. A shingle repeated inside one doc counts once (distinct
    shingles), and the doc where it first appears scores it as novel.

    Returns (doc_id, n_shingles, n_novel, novel_frac) for docs with at
    least one shingle; counts exact, one shared IEEE division.

    Scale: one explode + one map-side-combinable groupBy(min) + one hash
    join on the shingle key — the ngram_jaccard shuffle shape without
    the pair stage; nothing quadratic, no windows over corpus rows.
    """
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(text_col, n)).alias("s"),
    ).select("id", spark_h60("s").alias("h"))
    first = sh.groupBy("h").agg(F.min("id").alias("first_id"))
    return (
        sh.join(first, "h")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                (F.col("id") == F.col("first_id")).cast("long")
            ).alias("n_novel"),
        )
        .withColumn(
            "novel_frac",
            F.col("n_novel").cast("double")
            / F.col("n_shingles").cast("double"),
        )
    )


def editdist_verify(
    docs: DataFrame,
    candidates: DataFrame,
    max_dist: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_cells: int = 25_000_000,
) -> DataFrame:
    """Exact edit-distance verification of near-dup CANDIDATE pairs —
    the verify stage the LSH recall story needs: MinHash/SimHash bucket
    join proposes (cheap, linear, probabilistic), Levenshtein disposes
    (exact, quadratic per pair, affordable only because it runs on the
    candidate set). Keeps pairs with lev <= max_dist; also reports
    sim = 1 - lev / max(len_a, len_b) as one shared division.

    Both engines ship an integer levenshtein() built-in, BUT they
    disagree on non-ASCII input (Spark counts codepoints, DuckDB
    bytes), so the operator filters both sides to ASCII-only texts —
    the honest scope of the exact claim; non-ASCII corpora need a
    normalization pass first. candidates: (ida, idb) with ida < idb.

    Scale notes (100 TB): the join fans each candidate pair to its two
    texts (candidate-set-sized, not corpus-sized); the O(len_a * len_b)
    DP runs JVM-side per pair. max_dist bounds nothing in the built-in
    (no early-exit banding), so the per-pair DP size is ENFORCED (the
    _validate_tz_exact precedent): any pair whose len_a * len_b exceeds
    `max_cells` raises before levenshtein runs — truncate/normalize
    upstream or raise the cap deliberately."""
    t = docs.selectExpr(
        f"{id_col} AS id", f"{text_col} AS t"
    ).where(F.expr("t = regexp_replace(t, '[^\\\\x00-\\\\x7F]', '')"))
    jt = candidates.join(
        t.selectExpr("id AS ida", "t AS ta"), ["ida"]
    ).join(t.selectExpr("id AS idb", "t AS tb"), ["idb"])
    if max_cells is not None:
        over = (
            jt.where(
                F.length("ta").cast("long") * F.length("tb").cast("long")
                > max_cells
            )
            .selectExpr("ida", "idb", "length(ta) AS la", "length(tb) AS lb")
            .limit(1)
            .collect()
        )
        if over:
            r = over[0]
            raise ValueError(
                f"editdist_verify: candidate pair ({r['ida']}, {r['idb']}) "
                f"needs a {r['la']} x {r['lb']} Levenshtein DP "
                f"(> max_cells={max_cells}); truncate or pre-filter long "
                f"texts, or raise max_cells deliberately"
            )
    j = (
        jt
        .selectExpr(
            "ida",
            "idb",
            "CAST(levenshtein(ta, tb) AS BIGINT) AS lev",
            "CAST(greatest(length(ta), length(tb)) AS BIGINT) AS maxlen",
        )
        .where(F.col("lev") <= max_dist)
    )
    return j.selectExpr(
        "ida",
        "idb",
        "lev",
        "maxlen",
        "CAST(1 AS DOUBLE) - CAST(lev AS DOUBLE) / CAST(maxlen AS DOUBLE)"
        " AS sim",
    )


def containment_pairs(
    docs: DataFrame,
    theta_num: int = 4,
    theta_den: int = 5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 200,
) -> DataFrame:
    """Asymmetric near-dup detection by n-gram CONTAINMENT
    C(A, B) = |A ∩ B| / |A| over DISTINCT word shingles — the quote /
    boilerplate / subset-document case symmetric Jaccard structurally
    misses: a 50-shingle doc fully embedded in a 5000-shingle doc has
    Jaccard ~ 0.01 but containment 1.0 (Broder's original resemblance
    vs containment distinction). Emits (ida < idb) pairs where
    max(C(A,B), C(B,A)) = shared / min(|A|, |B|) clears theta, the
    exact integer predicate theta_den * shared >= theta_num * least —
    no float in the filter; the reported containment is one shared
    division, and contained_id names the embedded (smaller-set) doc.

    Scale notes (100 TB): identical shape to ngram_jaccard_pairs —
    shingle-key self-join with the max_df posting cap keeping buckets
    linear; distinct (id, shingle) first so multiplicity cannot inflate
    either numerator or denominator."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(text_col, n)).alias("s"),
    ).distinct()
    if max_df is not None:
        hot = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("s")
        )
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
    sh = _materialize(sh)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("ida"), F.col("b.id").alias("idb"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    j = (
        shared.join(sizes.selectExpr("id AS ida", "sz AS sz_a"), ["ida"])
        .join(sizes.selectExpr("id AS idb", "sz AS sz_b"), ["idb"])
        .where(
            F.expr(
                f"{theta_den} * shared >= {theta_num} * least(sz_a, sz_b)"
            )
        )
    )
    return j.selectExpr(
        "ida",
        "idb",
        "CAST(shared AS BIGINT) AS shared",
        "CAST(sz_a AS BIGINT) AS sz_a",
        "CAST(sz_b AS BIGINT) AS sz_b",
        "CAST(shared AS DOUBLE) / CAST(least(sz_a, sz_b) AS DOUBLE)"
        " AS containment",
        "CASE WHEN sz_a <= sz_b THEN ida ELSE idb END AS contained_id",
    )
