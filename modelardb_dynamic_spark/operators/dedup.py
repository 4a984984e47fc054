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
) -> DataFrame:
    """All (a, b) id pairs with word-n-gram Jaccard >= threshold.

    Shape: explode shingles -> self equi-join on shingle -> count shared ->
    join sizes -> filter. The join key is the shingle, so only documents
    sharing at least one shingle ever meet (no O(N^2) cross join)."""
    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(_shingles(text_col, n)).alias("s")
    )
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


# -- MinHash + LSH -------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


_HASH_KEY = "modelardb_dynamic_"[:16]  # pd.util.hash_array wants exactly 16 chars


def _hash_strings(strings: list[str]) -> np.ndarray:
    """Deterministic vectorized 64-bit string hashes (pandas' C siphash;
    a per-byte Python FNV loop measured ~100x slower)."""
    if not strings:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(strings, dtype=object), hash_key=_HASH_KEY)


def _token_hashes(texts: pd.Series, n: int) -> list[np.ndarray]:
    """64-bit hashes of word n-gram shingles per text."""
    out = []
    for t in texts:
        words = t.split()
        if len(words) < n:
            grams = {" ".join(words)}
        else:
            grams = {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
        out.append(_hash_strings(list(grams)))
    return out


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame,
    num_perm: int = 64,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures, deterministic (fixed seed)."""
    a_params, b_params = _minhash_params(num_perm)

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for hs in _token_hashes(pdf[text_col], n):
                if len(hs) == 0:
                    sigs.append(np.zeros(num_perm, dtype=np.int64))
                    continue
                # (a*h + b) mod p, min over shingles, per permutation
                vals = (
                    a_params[None, :] * hs[:, None] + b_params[None, :]
                ) % _MERSENNE
                sigs.append(vals.min(axis=0).astype(np.int64))
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "sig": [s.tolist() for s in sigs]}
            )

    return docs.select(id_col, text_col).mapInPandas(
        map_fn, schema="id long, sig array<long>"
    )


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


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    64-bit SimHash per doc (sign of per-bit weighted sums of token hashes),
    candidates via 4x16-bit chunk banding (any pair within Hamming <= 3
    agrees on at least one chunk), exact popcount filter after."""

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitcols = (1 << np.arange(64, dtype=np.uint64))
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for i, t in enumerate(pdf[text_col]):
                hs = _hash_strings(t.split())
                if len(hs) == 0:
                    continue
                bits = (hs[:, None] & bitcols[None, :]) != 0
                score = bits.sum(axis=0) * 2 - len(hs)
                out[i] = int((bitcols[score > 0]).sum(dtype=np.uint64).view(np.int64))
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(), "simhash": out})

    sh = docs.select(id_col, text_col).mapInPandas(
        map_fn, schema="id long, simhash long"
    )
    chunks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("cc"),
    ).select("id", "simhash", "cc.chunk", "cc.key")
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
) -> DataFrame:
    """Near-duplicate vectors by cosine >= threshold, bucketed by random
    hyperplane signatures (deterministic seed) so only same-signature
    vectors are compared exactly."""
    from modelardb_dynamic_spark.operators.similarity import hyperplane_signature

    sig = hyperplane_signature(embeddings, id_col, vec_col, n_planes, seed=11)
    a = sig.alias("a")
    b = sig.alias("b")
    cand = a.join(
        b,
        (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("ida"),
        F.col("b.id").alias("idb"),
        F.col("a.vec").alias("va"),
        F.col("b.vec").alias("vb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        cand.withColumn("cosine", dot / (norm(F.col("va")) * norm(F.col("vb"))))
        .where(F.col("cosine") >= threshold)
        .select("ida", "idb", "cosine")
    )
