"""Ground-truth tests for the training-data operator family (dedup,
similarity, text stats) on tiny constructed corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modelardb_dynamic_spark.operators import dedup, similarity, textstats

DOC_SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "on the warm windowsill in the afternoon sun"
    )
    near = base.replace("afternoon", "morning")
    other = (
        "completely different content about spark segment compression with "
        "gorilla codecs swing filters and rollup tiers at scale"
    )
    rows = [
        (1, base),
        (2, base),          # exact dup of 1
        (3, near),          # near dup of 1
        (4, other),
        (5, "tiny text"),
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA).cache()


def test_exact_dedup_groups(spark, docs):
    out = dedup.exact_dedup(docs).collect()
    groups = {r["keep_id"]: r["n_dups"] for r in out}
    assert groups[1] == 2  # docs 1 and 2 collapse
    assert groups[3] == 1 and groups[4] == 1 and groups[5] == 1


def test_minhash_finds_near_dup_not_distinct(spark, docs):
    pairs = {
        (r["ida"], r["idb"])
        for r in dedup.minhash_lsh_pairs(docs, num_perm=64, bands=16).collect()
    }
    assert (1, 2) in pairs  # exact dup always collides
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup shares bands
    assert (1, 4) not in pairs and (3, 4) not in pairs  # distinct content


def test_simhash_hamming(spark, docs):
    pairs = {
        (r["ida"], r["idb"]): r["hamming"]
        for r in dedup.simhash_pairs(docs, max_hamming=8).collect()
    }
    assert pairs[(1, 2)] == 0  # identical text -> identical simhash
    assert (1, 3) in pairs  # one-word change stays within 8 bits
    assert (1, 4) not in pairs


def test_ngram_jaccard_values(spark, docs):
    out = {
        (r["ida"], r["idb"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.2, n=3).collect()
    }
    assert out[(1, 2)] == 1.0
    assert 0.5 < out[(1, 3)] < 1.0


def test_ivf_recall_against_brute(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 16)).astype("float32")
    # plant an exact near-neighbor for query 0
    vecs[150] = vecs[0] + 0.01 * rng.standard_normal(16).astype("float32")
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    brute = similarity.cosine_topk(emb, query_ids=[0], k=3)
    assert [r["nid"] for r in brute.orderBy("rank").collect()][0] == 150
    ivf = similarity.ivf_topk(emb, query_ids=[0], k=3, n_planes=2)
    # the planted neighbor is nearly collinear -> same quadrant cell
    assert 150 in [r["nid"] for r in ivf.collect()]


def test_ann_recall_matches_set_intersection(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((150, 16)).astype("float32")
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    qids, k = [0, 1, 2], 4
    brute = {
        q: {r["nid"] for r in rows}
        for q, rows in __import__("itertools").groupby(
            sorted(
                similarity.cosine_topk(emb, qids, k).collect(),
                key=lambda r: r["qid"],
            ),
            key=lambda r: r["qid"],
        )
    }
    approx = {}
    for r in similarity.ivf_topk(emb, qids, k, n_planes=2).collect():
        approx.setdefault(r["qid"], set()).add(r["nid"])
    out = {
        r["qid"]: (r["hits"], r["recall"])
        for r in similarity.ann_recall(emb, qids, k=k, n_planes=2).collect()
    }
    assert set(out) == set(qids)  # every query reported, even at 0 hits
    for q in qids:
        want = len(brute[q] & approx.get(q, set()))
        assert out[q] == (want, want / k)


def test_token_stats_exact(spark):
    d = spark.createDataFrame([(1, "aa bb aa cccc")], DOC_SCHEMA)
    r = textstats.token_stats(d).collect()[0]
    assert r["n_tokens"] == 4
    assert r["n_chars"] == 13
    assert r["n_distinct_tokens"] == 3
    assert r["n_subwords"] == 1 + 1 + 1 + 1  # ceil(len/4) each


def test_token_rarity_hand_computed(spark):
    # corpus: 'aa' appears 4x, 'bb' 2x, 'zz' 1x, 'Aa' folds into 'aa'
    d = spark.createDataFrame(
        [(1, "aa bb aa zz"), (2, "Aa aa bb")], DOC_SCHEMA
    )
    out = {
        r["doc_id"]: r
        for r in textstats.token_rarity(d, rare_max_cnt=2).collect()
    }
    r1, r2 = out[1], out[2]
    assert r1["n_tokens"] == 4 and r2["n_tokens"] == 3
    # doc 1 token cnts: aa=4, bb=2, aa=4, zz=1 -> mean 11/4
    assert r1["mean_token_cnt"] == 11 / 4
    # rare (cnt<=2): bb + zz = 2 of 4
    assert r1["rare_tokens"] == 2 and r1["rare_frac"] == 2 / 4
    # doc 2: aa=4, aa=4, bb=2 -> mean 10/3; rare = bb only
    assert r2["mean_token_cnt"] == 10 / 3
    assert r2["rare_tokens"] == 1 and r2["rare_frac"] == 1 / 3


def test_paraphrase_composition_flags_lexical_pairs(spark):
    """The paraphrase audit's composition logic: embedding-near pairs
    split by whether the lexical (n-gram Jaccard) detector also fires."""
    import numpy as np

    base = np.ones(16, dtype="float32")
    v2 = base.copy()
    v2[0] = 0.9
    far = -base
    emb = spark.createDataFrame(
        [(0, base.tolist()), (1, v2.tolist()), (2, far.tolist())],
        "vec_id long, embedding array<float>",
    )
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "a completely different sentence about reindeer"),
            (2, "the quick brown fox jumps over the lazy dog"),
        ],
        DOC_SCHEMA,
    )
    ep = dedup.embedding_dup_pairs(
        emb, threshold=0.9, n_planes=2, dim=16
    ).select("ida", "idb", "cosine")
    jp = dedup.ngram_jaccard_pairs(docs, threshold=0.25, n=3).select(
        "ida", "idb", "jaccard"
    )
    out = {
        (r.ida, r.idb): r.is_lexical
        for r in ep.join(jp, ["ida", "idb"], "left")
        .select(
            "ida", "idb", F.col("jaccard").isNotNull().alias("is_lexical")
        )
        .collect()
    }
    # (0,1): embedding-near, textually far -> paraphrase candidate
    assert out == {(0, 1): False}


def test_vocab_growth_hand_computed(spark):
    tr = spark.createDataFrame(
        [
            ("c", 0, "a b a"),
            ("c", 1, "b c"),
            ("c", 2, "a b"),
            ("d", 0, "x"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    out = {
        (r.conv_id, r.turn_idx): r
        for r in textstats.vocab_growth(tr).collect()
    }
    r0, r1, r2 = out[("c", 0)], out[("c", 1)], out[("c", 2)]
    assert (r0.turn_tokens, r0.new_types, r0.cum_tokens, r0.cum_types) == (
        3, 2, 3, 2,
    )
    assert (r1.turn_tokens, r1.new_types, r1.cum_tokens, r1.cum_types) == (
        2, 1, 5, 3,
    )
    # turn 2 introduces nothing new: the left join must keep the row at 0
    assert (r2.turn_tokens, r2.new_types, r2.cum_tokens, r2.cum_types) == (
        2, 0, 7, 3,
    )
    assert r2.ttr == 3 / 7
    assert (out[("d", 0)].cum_tokens, out[("d", 0)].cum_types) == (1, 1)


def test_lang_id_markers(spark):
    d = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "el perro de la casa que ladra los martes"),
            (3, "zzz qqq www"),
        ],
        DOC_SCHEMA,
    )
    out = {r["doc_id"]: r["pred_lang"] for r in textstats.lang_id(d).collect()}
    assert out[1] == "en" and out[2] == "es" and out[3] == "unknown"


def test_winnow_fingerprints_shift_invariant(spark):
    shared_passage = "one two three four five six seven eight nine ten"
    d = spark.createDataFrame(
        [(1, shared_passage + " tail tokens here"),
         (2, "prefix words then " + shared_passage)],
        DOC_SCHEMA,
    )
    out = textstats.winnow_fingerprints(d, k=3, window=2)
    fps = out.groupBy("fp").agg(F.collect_set("id").alias("ids"))
    assert fps.where(F.size("ids") == 2).count() >= 1  # shared passage found


def test_rolling_fingerprint_whole_doc(spark):
    d = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "different text")], DOC_SCHEMA
    )
    out = {r["id"]: r["rfp"] for r in textstats.rolling_fingerprint(d).collect()}
    assert out[1] == out[2] != out[3]


def test_ivf_kmeans_recall(spark):
    """VERDICT r2 #4 done-bar: trained IVF (C=256 sampled spherical
    k-means cells, probe by centroid distance) reaches recall@5 >= 0.9
    vs exact cosine_topk on a 1e5-vector clustered fixture."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(17)
    n, dim, n_clusters = 100_000, 32, 300
    centers = rng.standard_normal((n_clusters, dim)) * 4.0
    labels = rng.integers(0, n_clusters, n)
    vecs = (centers[labels] + rng.standard_normal((n, dim))).astype("float32")
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n), "embedding": list(map(list, vecs))}),
        "vec_id long, embedding array<float>",
    ).repartition(16)
    emb = emb.localCheckpoint()  # train + assign + brute reuse one scan
    qids = list(range(0, 1000, 20))  # 50 queries
    k = 5
    brute = {
        (r["qid"], r["nid"])
        for r in similarity.cosine_topk(emb, qids, k=k).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in similarity.ivf_kmeans_topk(
            emb, qids, k=k, n_cells=256, n_probe=16
        ).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.9, f"recall@{k} = {recall:.3f}"


def test_ivf_kmeans_exact_matches_gemm(spark):
    """The fold-exact SQL pipeline the driver value-gates
    (ivf_kmeans_topk_exact) and the GEMM scale path (ivf_kmeans_topk)
    return identical (qid, nid, rank) sets when given the same centroids
    — so the green DuckDB oracle transitively pins the scale path too."""
    import numpy as np

    _, X = similarity.load_embeddings_sorted(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    cent = similarity.train_kmeans_exact(
        X, similarity.kmeans_cells_for(len(X))
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(20))
    exact = {
        (r["qid"], r["nid"], r["rank"])
        for r in similarity.ivf_kmeans_topk_exact(
            emb, qids, centroids=cent, k=5, n_probe=8
        ).collect()
    }
    gemm = {
        (r["qid"], r["nid"], r["rank"])
        for r in similarity.ivf_kmeans_topk(
            emb, qids, centroids=cent, k=5, n_probe=8
        ).collect()
    }
    assert exact == gemm


def test_train_kmeans_exact_deterministic():
    """Two independent trainings from the parquet produce bit-identical
    centroids — the property the generated DuckDB oracle relies on."""
    import numpy as np

    _, X1 = similarity.load_embeddings_sorted(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    _, X2 = similarity.load_embeddings_sorted(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    c1 = similarity.train_kmeans_exact(X1, 22)
    c2 = similarity.train_kmeans_exact(X2, 22)
    assert c1.shape == (22, 64)
    assert np.array_equal(c1, c2)


def test_wav_real_decode_roundtrip(spark):
    """synth_wav_media writes real RIFF/WAVE PCM and wav_features parses
    it back: header fields and all features must equal the closed-form
    computation over the generating waveform (no fake decode anywhere in
    this path)."""
    import numpy as np

    from modelardb_dynamic_spark.operators import multimodal as mm

    media = mm.synth_wav_media(spark, n=16)
    rows = {r["media_id"]: r for r in mm.wav_features(media).collect()}
    assert len(rows) == 16
    for mid in range(16):
        dur = (mid * 97) % 2000 + 100
        ns = dur * mm.WAV_RATE // 1000
        s = mm._wav_samples(mid, ns).astype(np.int64)
        r = rows[mid]
        assert r["sample_rate"] == mm.WAV_RATE and r["n_channels"] == 1
        assert r["n_samples"] == ns and r["duration_ms"] == dur
        assert r["rms"] == float(np.sqrt(int((s**2).sum()) / ns))
        assert r["zero_crossings"] == int(((s[:-1] < 0) != (s[1:] < 0)).sum())
        assert r["peak"] == float(s.max())


def test_png_real_decode_roundtrip(spark):
    """synth_png_media writes genuine spec-compliant PNGs (8-bit RGB,
    row filters cycling through ALL five types) and png_features parses
    them back: dimensions, channel means, and the byte checksum must
    equal the closed-form computation over the generating pixels — so
    the chunk walk, CRC check, inflate, and every unfilter kernel
    (None/Sub/Up/Average/Paeth) are each verified, not assumed."""
    import numpy as np

    from modelardb_dynamic_spark.operators import multimodal as mm

    # every filter type appears within one image once h >= 5
    media = mm.synth_png_media(spark, n=16)
    rows = {r["media_id"]: r for r in mm.png_features(media).collect()}
    assert len(rows) == 16
    for mid in range(16):
        w, h = mid * 13 % 24 + 4, mid * 17 % 24 + 4
        pix = mm._png_pixels(mid, w, h).astype(np.int64)
        r = rows[mid]
        assert (r["width"], r["height"]) == (w, h)
        sums = pix.sum(axis=(0, 1))
        assert r["mean_r"] == sums[0] / (w * h)
        assert r["mean_g"] == sums[1] / (w * h)
        assert r["mean_b"] == sums[2] / (w * h)
        assert r["px_sum"] == int(sums.sum())


def test_png_decoder_rejects_corruption():
    """The decoder is a real parser: flipping one payload byte must trip
    the CRC check, and a truncated pixel stream must be detected."""
    import pytest

    from modelardb_dynamic_spark.operators import multimodal as mm

    pix = mm._png_pixels(7, 9, 11)
    blob = mm._png_encode(pix, 7)
    bad = bytearray(blob)
    bad[40] ^= 0xFF  # inside IDAT body
    with pytest.raises(ValueError, match="CRC"):
        mm._png_decode(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        mm._png_decode(b"GIF89a" + blob)


def test_avi_real_decode_roundtrip(spark):
    """synth_avi_media writes genuine uncompressed AVI (RIFF, BI_RGB DIB
    frames) and avi_features demuxes it back: dimensions, frame counts,
    channel means, motion, and checksum must equal the closed-form
    computation — so the RIFF walk, header validation, row de-padding,
    bottom-up flip, and BGR swap are each verified, not assumed."""
    import numpy as np

    from modelardb_dynamic_spark.operators import multimodal as mm

    media = mm.synth_avi_media(spark, n=12)
    rows = {r["media_id"]: r for r in mm.avi_features(media).collect()}
    assert len(rows) == 12
    for mid in range(12):
        w, h, nf = mid * 7 % 12 + 5, mid * 11 % 12 + 4, mid * 5 % 7 + 2
        pix = mm._avi_pixels(mid, nf, w, h).astype(np.int64)
        r = rows[mid]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        sums = pix.sum(axis=(0, 1, 2))
        npx = nf * h * w
        assert r["mean_r"] == sums[0] / npx
        assert r["mean_g"] == sums[1] / npx
        assert r["mean_b"] == sums[2] / npx
        assert r["motion"] == int(np.abs(pix[1:] - pix[:-1]).sum()) / (
            (nf - 1) * h * w * 3
        )
        assert r["px_sum"] == int(sums.sum())


def test_avi_decoder_rejects_malformed():
    import pytest

    from modelardb_dynamic_spark.operators import multimodal as mm

    blob = mm._avi_encode(mm._avi_pixels(3, 4, 9, 7))
    with pytest.raises(ValueError, match="RIFF"):
        mm._avi_decode(b"JUNK" + blob[4:])
    # truncating a frame chunk must trip the size check, not mis-decode
    import struct
    movi_at = blob.find(b"00db")
    bad = bytearray(blob)
    struct.pack_into("<I", bad, movi_at + 4, 11)  # lie about frame length
    with pytest.raises(ValueError, match="frame size"):
        mm._avi_decode(bytes(bad))


def test_decontaminate_semantics_and_plan(spark):
    """Benchmark members must flag themselves (they share all their own
    grams); a doc with no benchmark 8-gram stays clean; the benchmark
    gram set arrives via broadcast (corpus rows never shuffle on the
    join key)."""
    from modelardb_dynamic_spark.operators import curation

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),        # benchmark member
            (2, "a b c d e f g h i j extra"),  # contains bench 8-grams
            (3, "q r s t u v w x y z"),        # clean
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 1")
    out = curation.decontaminate(docs, bench, n=8)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["contaminated"] and rows[2]["contaminated"]
    assert not rows[3]["contaminated"]
    # doc 1 has 3 distinct 8-grams; doc 2 shares all 3 of them
    assert rows[1]["n_contaminated"] == 3 and rows[2]["n_contaminated"] == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_stratified_sample_deterministic_and_mapside(spark):
    """The same rows are selected regardless of partitioning (pure
    function of doc_id), fractions are honored approximately, and the
    plan is shuffle-free (a filter over the scan)."""
    from modelardb_dynamic_spark.operators import curation

    docs = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de")), (F.pmod("id", F.lit(2)) + 1).cast("int")
        ).alias("lang"),
    )
    frac = {"en": 0.5, "de": 0.1}
    a = curation.stratified_sample(docs, "lang", frac)
    b = curation.stratified_sample(docs.repartition(17), "lang", frac)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    assert ids_a == sorted(r["doc_id"] for r in b.collect())
    by_lang = {r["lang"]: r["n"] for r in a.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert abs(by_lang["en"] / 2000 - 0.5) < 0.05
    assert abs(by_lang["de"] / 2000 - 0.1) < 0.05
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_media_codecs_random_content_roundtrip():
    """Codec fuzz beyond the closed-form pixels: RANDOM content exercises
    the PNG filter kernels and AVI stride handling on inputs with no
    algebraic structure to hide a cancelling bug. Seeded, 40 cases each."""
    import numpy as np

    from modelardb_dynamic_spark.operators import multimodal as mm

    rng = np.random.default_rng(0xC0DEC)
    for case in range(40):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 40))
        pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = mm._png_decode(mm._png_encode(pix, media_id=case))
        assert np.array_equal(out, pix), f"png case {case} ({w}x{h})"
    for case in range(40):
        w = int(rng.integers(1, 24))
        h = int(rng.integers(1, 24))
        nf = int(rng.integers(1, 9))
        pix = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
        out = mm._avi_decode(mm._avi_encode(pix))
        assert np.array_equal(out, pix), f"avi case {case} ({nf}f {w}x{h})"


def test_pack_documents_semantics(spark):
    """Packing invariants: offsets are the exclusive prefix sum in id
    order, bins tile [0, total_tokens) with no gaps, and a doc straddles
    exactly the bins its token span covers."""
    from modelardb_dynamic_spark.operators import curation

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, " ".join("x" * 1 for _ in range(7))),
         (4, "y")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.pack_documents(docs, 4).collect()}
    assert [out[i]["start_offset"] for i in (1, 2, 3, 4)] == [0, 3, 5, 12]
    assert [out[i]["bin_id"] for i in (1, 2, 3, 4)] == [0, 0, 1, 3]
    assert [out[i]["offset_in_bin"] for i in (1, 2, 3, 4)] == [0, 3, 1, 0]
    # doc 3: tokens 5..11 -> bins 1..2
    assert (out[3]["bin_id"], out[3]["end_bin_id"]) == (1, 2)
    assert out[4]["end_bin_id"] == 3


# -- repetition stats (Gopher/MassiveText filters) ------------------------------


def test_repetition_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            # 6 words: "a b a b a c" -> top word "a" 3/6, top bigram "a b"
            # (positions 1,3) 2/5, top trigram "a b a" 2/4, dup words: a,b -> 5/6
            (1, "a b a b a c"),
            # single word: no bigrams/trigrams -> fracs 0, top word 1/1
            (2, "solo"),
            # all distinct: dup_word_frac 0, every gram frac 1/n
            (3, "w x y z"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in textstats.repetition_stats(docs).collect()
    }
    r1 = rows[1]
    assert r1["n_words"] == 6
    assert r1["top_word_frac"] == 3 / 6
    assert r1["top_bigram_frac"] == 2 / 5
    assert r1["top_trigram_frac"] == 2 / 4
    assert r1["dup_word_frac"] == 5 / 6
    r2 = rows[2]
    assert r2["n_words"] == 1
    assert r2["top_word_frac"] == 1.0
    assert r2["top_bigram_frac"] == 0.0
    assert r2["top_trigram_frac"] == 0.0
    assert r2["dup_word_frac"] == 0.0
    r3 = rows[3]
    assert r3["top_word_frac"] == 1 / 4
    assert r3["top_bigram_frac"] == 1 / 3
    assert r3["dup_word_frac"] == 0.0


# -- PII scrub -------------------------------------------------------------------


def test_pii_scrub_detects_and_redacts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@sub.example.org or jd@ex.io thanks"),
            (2, "server at 192.168.0.17 and 10.0.0.1 went down"),
            (3, "call +44 555 0134 or +1 800 9999 today"),
            (4, "clean text with no pii at all"),
            (5, "mixed: a@b.com from 8.8.8.8 dial +353 123 4567"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in textstats.pii_scrub(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_ipv4s"], out[1]["n_phones"]) == (2, 0, 0)
    assert "[EMAIL]" in out[1]["redacted"] and "@" not in out[1]["redacted"]
    assert (out[2]["n_emails"], out[2]["n_ipv4s"]) == (0, 2)
    assert out[2]["redacted"].count("[IPV4]") == 2
    assert out[3]["n_phones"] == 2
    assert out[3]["redacted"].count("[PHONE]") == 2
    assert (out[4]["n_emails"], out[4]["n_ipv4s"], out[4]["n_phones"]) == (0, 0, 0)
    assert out[4]["redacted"] == "clean text with no pii at all"
    assert (out[5]["n_emails"], out[5]["n_ipv4s"], out[5]["n_phones"]) == (1, 1, 1)
    # email is redacted before the IP pass so a dotted domain can't be half-eaten
    assert "[EMAIL]" in out[5]["redacted"] and "[IPV4]" in out[5]["redacted"]


# -- Gopher document-level quality rules -----------------------------------------


def test_gopher_quality_rules(spark):
    long_good = "the cat sat with all of us and that was fine to see " * 5
    docs = spark.createDataFrame(
        [
            (1, long_good),                       # passes everything
            (2, "short doc only"),                # fails min_words
            (3, ("### " * 40) + long_good),       # symbol ratio too high
            (4, ("11 22 33 44 " * 20) + "x"),     # alpha_frac too low, no stopwords
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in textstats.gopher_quality(docs, min_words=30).collect()
    }
    assert out[1]["keep"] is True
    assert out[1]["stop_hits"] >= 2
    assert out[2]["keep"] is False and out[2]["n_words"] == 3
    assert out[3]["keep"] is False and out[3]["symbol_ratio"] >= 0.1
    assert out[4]["keep"] is False and out[4]["alpha_frac"] <= 0.8


# ---------------------------------------------------------------------------
# connected components / dup clusters


def _uf_components(n_nodes, edges):
    """Reference union-find (driver-side) for differential testing."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # compress to component MIN (the operator's canonical label)
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(m) for r, m in comp.items() for x in m}


def test_connected_components_chain_cycle_singleton(spark):
    """A long chain (stresses O(log n) convergence vs naive propagation),
    a cycle, a star, and untouched singletons."""
    chain = [(i, i + 1) for i in range(100, 140)]           # 41-node chain
    cycle = [(1, 2), (2, 3), (3, 1)]
    star = [(50, 60), (50, 61), (50, 62)]
    pairs = spark.createDataFrame(
        chain + cycle + star, "ida long, idb long"
    )
    got = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert all(got[i] == 100 for i in range(100, 141))
    assert got[1] == got[2] == got[3] == 1
    assert got[50] == got[60] == got[61] == got[62] == 50
    assert set(got) == set(range(100, 141)) | {1, 2, 3, 50, 60, 61, 62}


def test_connected_components_random_differential(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    n = 300
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(250, 2))
        if a != b
    ]
    want = _uf_components(n, edges)
    pairs = spark.createDataFrame(edges, "ida long, idb long")
    got = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(pairs).collect()
    }
    touched = {x for e in edges for x in e}
    assert set(got) == touched
    assert all(got[x] == want[x] for x in touched)


def test_dup_clusters_survivors(spark, docs):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "ida long, idb long"
    )  # 1-2-3 transitively one cluster; 4, 5 singletons
    out = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup.dup_clusters(docs, pairs).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (1, False) and out[3] == (1, False)
    assert out[4] == (4, True) and out[5] == (5, True)
    assert sum(1 for c, k in out.values() if k) == 3  # one survivor/cluster


def test_turn_transitions_hand_computed(spark):
    from datetime import datetime, timezone

    from modelardb_dynamic_spark.operators.textstats import turn_transitions

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp()

    def ts(sec):
        return datetime.fromtimestamp(t0 + sec, tz=timezone.utc)

    rows = [
        # c1: user ->2s-> assistant ->1s-> tool ->2s-> assistant
        ("c1", 0, "user", ts(0)),
        ("c1", 1, "assistant", ts(2)),
        ("c1", 2, "tool", ts(3)),
        ("c1", 3, "assistant", ts(5)),
        # c2: user ->10s-> user (self-transition); no cross-conv pair
        ("c2", 0, "user", ts(100)),
        ("c2", 1, "user", ts(110)),
    ]
    tr = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, ts timestamp")
    got = {
        (r["prev_role"], r["role"]): (r["n"], r["gap_sum_ms"], r["avg_gap_ms"])
        for r in turn_transitions(tr).collect()
    }
    assert got == {
        ("user", "assistant"): (1, 2000, 2000.0),
        ("assistant", "tool"): (1, 1000, 1000.0),
        ("tool", "assistant"): (1, 2000, 2000.0),
        ("user", "user"): (1, 10000, 10000.0),
    }


def test_cohort_retention_hand_computed(spark):
    from datetime import datetime, timezone

    from modelardb_dynamic_spark.operators.textstats import cohort_retention

    DAY = 86_400_000

    def ts(day, hour=0):
        return datetime.fromtimestamp(
            day * 86_400 + hour * 3_600, tz=timezone.utc
        )

    rows = [
        # cohort day 0: c1 active days 0,1,3 (two turns day 0); c2 day 0 only
        ("c1", ts(0, 1)), ("c1", ts(0, 2)), ("c1", ts(1)), ("c1", ts(3)),
        ("c2", ts(0)),
        # cohort day 2: c3 active days 2,3
        ("c3", ts(2)), ("c3", ts(3, 5)),
    ]
    tr = spark.createDataFrame(rows, "conv_id string, ts timestamp")
    got = {
        (r["cohort_day"] // DAY, r["day_offset"]): (
            r["n_convs"], r["n_turns"], r["cohort_n"], r["retention"]
        )
        for r in cohort_retention(tr).collect()
    }
    assert got == {
        (0, 0): (2, 3, 2, 1.0),
        (0, 1): (1, 1, 2, 0.5),
        (0, 3): (1, 1, 2, 0.5),
        (2, 0): (1, 1, 1, 1.0),
        (2, 1): (1, 1, 1, 1.0),
    }


def test_funnel_matches_gap_and_pattern(spark):
    from datetime import datetime, timezone

    from modelardb_dynamic_spark.operators.textstats import funnel_matches

    def ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc)

    rows = [
        # c1: two overlapping u->a->u matches (turns 0-2 and 2-4 share turn 2)
        ("c1", 0, "user", ts(0)),
        ("c1", 1, "assistant", ts(10)),
        ("c1", 2, "user", ts(30)),
        ("c1", 3, "assistant", ts(40)),
        ("c1", 4, "user", ts(50)),
        # c2: pattern present but second gap exceeds the bound
        ("c2", 0, "user", ts(100)),
        ("c2", 1, "assistant", ts(110)),
        ("c2", 2, "user", ts(1000)),
        # c3: wrong middle role
        ("c3", 0, "user", ts(200)),
        ("c3", 1, "tool", ts(210)),
        ("c3", 2, "user", ts(220)),
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    out = funnel_matches(
        tr, pattern=("user", "assistant", "user"), max_gap_ms=60_000
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["day"] == 0 and r["n_matches"] == 2 and r["n_convs"] == 1
    assert r["span_sum_ms"] == 30_000 + 20_000
    assert r["avg_span_ms"] == 25_000.0


def test_cohort_and_funnel_random_differential(spark):
    """Seeded random transcript shapes (1-turn convs, duplicate
    timestamps, role runs) vs pure-pandas models."""
    import numpy as np
    import pandas as pd

    from modelardb_dynamic_spark.operators.textstats import (
        cohort_retention,
        funnel_matches,
    )

    DAY = 86_400_000
    rng = np.random.default_rng(42)
    n = 600
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{v}" for v in rng.integers(0, 60, n)],
            "ts_ms": rng.integers(0, 12 * DAY, n),
            "role": rng.choice(["user", "assistant", "tool"], n),
        }
    )
    pdf = pdf.sort_values(["conv_id", "ts_ms"], kind="stable").reset_index(
        drop=True
    )
    pdf["turn_idx"] = pdf.groupby("conv_id").cumcount()
    sdf = spark.createDataFrame(pdf).withColumn(
        "ts", F.expr("timestamp_millis(ts_ms)")
    )

    # cohort model
    act = pdf.assign(day=pdf.ts_ms // DAY * DAY)
    days = act.groupby(["conv_id", "day"]).size().rename("turns").reset_index()
    firsts = days.groupby("conv_id").day.min().rename("cohort_day")
    j = days.join(firsts, on="conv_id")
    j["day_offset"] = (j.day - j.cohort_day) // DAY
    cells = (
        j.groupby(["cohort_day", "day_offset"])
        .agg(n_convs=("conv_id", "size"), n_turns=("turns", "sum"))
        .reset_index()
    )
    got = {
        (r["cohort_day"], r["day_offset"]): (r["n_convs"], r["n_turns"])
        for r in cohort_retention(sdf, day_ms=DAY).collect()
    }
    want = {
        (int(r.cohort_day), int(r.day_offset)): (int(r.n_convs), int(r.n_turns))
        for r in cells.itertuples()
    }
    assert got == want

    # funnel model (adjacent triples in turn_idx order, gap-bounded)
    gap = 6 * 3_600_000
    want_f: dict = {}
    for _, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        r = g.role.tolist()
        t = g.ts_ms.tolist()
        for i in range(len(g) - 2):
            if (
                r[i] == "user" and r[i + 1] == "assistant"
                and r[i + 2] == "tool"
                and t[i + 1] - t[i] <= gap and t[i + 2] - t[i + 1] <= gap
            ):
                day = t[i] // DAY * DAY
                m, convs, span = want_f.get(day, (0, set(), 0))
                convs = set(convs) | {g.conv_id.iloc[0]}
                want_f[day] = (m + 1, convs, span + t[i + 2] - t[i])
    got_f = {
        r["day"]: (r["n_matches"], r["n_convs"], r["span_sum_ms"])
        for r in funnel_matches(
            sdf, pattern=("user", "assistant", "tool"), max_gap_ms=gap
        ).collect()
    }
    assert got_f == {
        d: (m, len(c), s) for d, (m, c, s) in want_f.items()
    }


def test_reply_latency_hand_computed(spark):
    from datetime import datetime, timezone

    from modelardb_dynamic_spark.operators.textstats import reply_latency

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp()

    def ts(sec):
        return datetime.fromtimestamp(t0 + sec, tz=timezone.utc)

    # assistant replies with gaps 1s,2s,3s,4s,5s (across two convs);
    # user replies once with 7s; first turns contribute nothing
    rows = [
        ("c1", 0, "user", ts(0)),
        ("c1", 1, "assistant", ts(1)),
        ("c1", 2, "assistant", ts(3)),
        ("c1", 3, "assistant", ts(6)),
        ("c1", 4, "user", ts(13)),
        ("c2", 0, "user", ts(100)),
        ("c2", 1, "assistant", ts(104)),
        ("c2", 2, "assistant", ts(109)),
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    got = {r["role"]: r.asDict() for r in reply_latency(tr).collect()}
    a = got["assistant"]
    # gaps ms: [1000, 2000, 3000, 4000, 5000]; ceil-index picks:
    # k50=ceil(5/2)=3 -> 3000, k90=ceil(4.5)=5 -> 5000, k99=5 -> 5000
    assert (a["n"], a["gap_sum_ms"], a["min_ms"], a["max_ms"]) == (
        5, 15000, 1000, 5000,
    )
    assert (a["p50_ms"], a["p90_ms"], a["p99_ms"]) == (3000, 5000, 5000)
    assert a["avg_gap_ms"] == 3000.0
    u = got["user"]
    assert (u["n"], u["p50_ms"], u["p90_ms"], u["p99_ms"]) == (
        1, 7000, 7000, 7000,
    )


def test_reply_latency_duplicate_gaps_cumulative_pick(spark):
    """Duplicate gap values collapse into one value-count row; the
    ceil-index selection must honor multiplicity: gaps [1s x 9, 2s] ->
    p90 = ceil(0.9*10)=9th smallest = 1s, p99 = 10th = 2s."""
    from datetime import datetime, timezone

    from modelardb_dynamic_spark.operators.textstats import reply_latency

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp()

    def ts(sec):
        return datetime.fromtimestamp(t0 + sec, tz=timezone.utc)

    rows = [("c", 0, "user", ts(0))]
    sec = 0
    for i in range(9):
        sec += 1
        rows.append(("c", i + 1, "assistant", ts(sec)))
    sec += 2
    rows.append(("c", 10, "assistant", ts(sec)))
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    a = {r["role"]: r.asDict() for r in reply_latency(tr).collect()}[
        "assistant"
    ]
    assert (a["n"], a["p50_ms"], a["p90_ms"], a["p99_ms"], a["max_ms"]) == (
        10, 1000, 1000, 2000, 2000,
    )


def test_context_growth_hand_computed(spark):
    from modelardb_dynamic_spark.operators.textstats import context_growth

    rows = [
        # c1 token counts: 3, 4, 5 -> cums 3, 7, 12; budget 7 crosses at
        # turn 1 with cum 7
        ("c1", 0, "a b c"),
        ("c1", 1, "d e f g"),
        ("c1", 2, "h i j k l"),
        # c2 never crosses
        ("c2", 0, "x y"),
    ]
    tr = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {r["conv_id"]: r.asDict()
           for r in context_growth(tr, 7).collect()}
    c1 = got["c1"]
    assert (c1["n_turns"], c1["total_tokens"]) == (3, 12)
    assert (c1["crossing_turn"], c1["tokens_at_crossing"]) == (1, 7)
    c2 = got["c2"]
    assert (c2["n_turns"], c2["total_tokens"]) == (1, 2)
    assert c2["crossing_turn"] is None and c2["tokens_at_crossing"] is None


def test_tool_usage_hand_computed(spark):
    from datetime import datetime, timezone

    from modelardb_dynamic_spark.operators.textstats import tool_usage

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

    def ts(sec):
        return datetime.fromtimestamp(
            t0.timestamp() + sec, tz=timezone.utc
        )

    rows = [
        ("c1", 0, None, "hi there", ts(0)),
        ("c1", 1, "search", "r1 r2", ts(10)),
        ("c1", 2, "search", "r3", ts(20)),
        ("c2", 0, "search", "r4 r5 r6", ts(30)),
        ("c2", 1, "calc", "42", ts(40)),
    ]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, tool string, text string, "
        "ts timestamp",
    )
    got = {r["tool"]: r.asDict() for r in tool_usage(tr).collect()}
    s = got["search"]
    assert (s["n_calls"], s["n_convs"], s["total_tokens"]) == (3, 2, 6)
    assert (s["first_ts_ms"], s["last_ts_ms"]) == (
        int(t0.timestamp() * 1000) + 10_000,
        int(t0.timestamp() * 1000) + 30_000,
    )
    c = got["calc"]
    assert (c["n_calls"], c["n_convs"], c["total_tokens"]) == (1, 1, 1)


def test_duplicated_spans_hand_computed(spark):
    """ExactSubstr semantics on a constructed corpus: cross-doc duplication,
    within-doc repetition, island merging, and the min-length floor."""
    a = "a b c d e f g h i j k l"           # 12 tokens
    b = "x y a b c d e f g h i j q r s t"   # tokens 2..11 duplicate a[0..9]
    c = "p q r s t u v w"                   # 8 unique tokens, no dup
    d = "m m m m m m m m m m"               # 10 tokens: self-repetition
    rows = [(1, a), (2, b), (3, c), (4, d)]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.duplicated_spans(docs, min_len=5).collect()
    }
    # doc 1: windows at p=0..5 over "a..j" are shared with doc 2 ->
    # seeds p=0..5 merge into one span [0, 10): 10 dup tokens of 12.
    assert out[1]["total_tokens"] == 12
    assert out[1]["n_spans"] == 1
    assert out[1]["dup_tokens"] == 10
    assert abs(out[1]["dup_frac"] - 10 / 12) < 1e-12
    # doc 2: same shared run at p=2..7 -> one span of 10 of its 16 tokens.
    assert out[2]["n_spans"] == 1
    assert out[2]["dup_tokens"] == 10
    assert out[2]["total_tokens"] == 16
    # doc 3: nothing repeated anywhere -> absent from the result.
    assert 3 not in out
    # doc 4: "m m m m m" occurs at 6 positions WITHIN the doc -> the
    # whole doc is one duplicated span.
    assert out[4]["n_spans"] == 1
    assert out[4]["dup_tokens"] == 10
    assert out[4]["dup_frac"] == 1.0


def test_duplicated_spans_disjoint_islands(spark):
    """Two duplicated runs separated by more than min_len unique tokens
    stay two spans; the gap tokens are not counted."""
    shared1 = "alpha beta gamma delta epsilon"
    shared2 = "one two three four five"
    gap = "u1 u2 u3 u4 u5 u6 u7"
    rows = [
        (1, f"{shared1} {gap} {shared2}"),
        (2, f"left pad {shared1} middle words here {shared2} end"),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.duplicated_spans(docs, min_len=5).collect()
    }
    assert out[1]["n_spans"] == 2
    assert out[1]["dup_tokens"] == 10
    assert out[2]["n_spans"] == 2
    assert out[2]["dup_tokens"] == 10


def test_bpe_vocabulary_matches_reference(spark):
    """Spark BPE induction == the pure-Python reference twin on a corpus
    exercising overlap counting ("ababab"), ties, and repeated words."""
    from modelardb_dynamic_spark.operators.curation import (
        bpe_reference,
        bpe_vocabulary,
    )

    texts = [
        "low lower lowest low low",
        "newer newest new wider wide wide",
        "the the the thin then than",
        "aaa aab aba abab ababab",
    ]
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], DOC_SCHEMA
    )
    got = [
        tuple(r)
        for r in bpe_vocabulary(corpus, n_merges=10)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == bpe_reference(texts, n_merges=10)
    # overlap counting pinned: "ababab" contributes (ab,ab) twice after
    # merge 0, so (ab, ab) wins merge 5 with count 3 (abab + ababab x2... )
    assert got[0] == (0, "a", "b", "ab", 7)
    assert got[5] == (5, "ab", "ab", "abab", 3)


def test_bpe_exhausts_when_words_fully_merged(spark):
    """Asking for more merges than exist stops early (single-symbol words
    produce no pairs) instead of looping or erroring."""
    from modelardb_dynamic_spark.operators.curation import bpe_vocabulary

    corpus = spark.createDataFrame([(1, "ab ab cd")], DOC_SCHEMA)
    out = bpe_vocabulary(corpus, n_merges=50).collect()
    assert len(out) == 2  # (a,b) then (c,d); nothing left to merge


def test_bm25_ranking_semantics(spark):
    """BM25 ranks the doc with more query-term mass higher; documents with
    no query term are excluded; rank is dense from 1 with id tiebreak."""
    from modelardb_dynamic_spark.operators.textstats import bm25_topk

    rows = [
        (1, "hash join hash join hash join"),   # heavy on both terms
        (2, "hash and some other words here padding the length out"),
        (3, "completely unrelated text about swing filters"),
        (4, "join join"),                        # short doc, high tf ratio
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = bm25_topk(docs, ["hash", "join"], top_k=10).collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    ids = [r["doc_id"] for r in by_rank]
    assert 3 not in ids  # no query term -> no row
    assert ids[0] == 1  # both terms, highest tf
    assert [r["rank"] for r in by_rank] == list(range(1, len(ids) + 1))
    assert all(
        a["score"] >= b["score"] for a, b in zip(by_rank, by_rank[1:])
    )


def test_bm25_length_normalization(spark):
    """Same tf, longer doc -> lower score (the b-term at work)."""
    from modelardb_dynamic_spark.operators.textstats import bm25_topk

    pad = " ".join(f"w{i}" for i in range(60))
    rows = [(1, "hash hash"), (2, f"hash hash {pad}")]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["hash"]).collect()}
    assert out[1] > out[2]


def test_bpe_encode_matches_symbolic_reference(spark):
    """bpe_encode's closed-form replace chain == applying the learned
    merges word-by-word with _bpe_apply_merge (the independent symbolic
    twin), on a corpus exercising overlapping merges ("ababab"), merge
    chains (a,b)->(ab,ab), repeated words, and multi-space whitespace."""
    from modelardb_dynamic_spark.operators.curation import (
        _bpe_apply_merge,
        bpe_encode,
        bpe_reference,
    )

    texts = [
        "low lower lowest low low",
        "aaa aab aba abab ababab",
        "  the   thin then  ",
        "x ababab abab ab",
    ]
    merges = bpe_reference(texts, n_merges=8)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], DOC_SCHEMA
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_bpe_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }

    def n_toks(word: str) -> int:
        sym = list(word)
        for _, lhs, rhs, _, _ in merges:
            sym = _bpe_apply_merge(sym, lhs, rhs)
        return len(sym)

    for i, t in enumerate(texts):
        ws = t.split()
        assert got[i] == (len(ws), len(t), sum(n_toks(w) for w in ws))


def test_bpe_encode_drops_empty_and_sep_words(spark):
    """Empty/whitespace docs are dropped; a word containing the \\x1f
    framing byte is filtered out of the word list, not mis-encoded."""
    from modelardb_dynamic_spark.operators.curation import bpe_encode

    rows = [(1, "ab ab"), (2, "   "), (3, "ab a\x1fb")]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {
        r["doc_id"]: r.asDict()
        for r in bpe_encode(docs, [("a", "b")]).collect()
    }
    assert set(out) == {1, 3}
    assert out[1]["n_bpe_tokens"] == 2  # "ab" -> one token each
    assert out[3]["n_words"] == 1  # the framed word is excluded up front
    assert out[3]["n_bpe_tokens"] == 1  # only "ab" is encoded


def test_novelty_scores_first_occurrence_semantics(spark):
    """Novelty is directional in id order: doc 1 scores everything novel,
    an exact copy later scores 0, a half-overlap scores its new half;
    intra-doc repeats count once and credit the first doc."""
    a = "w1 w2 w3 w4 w5"  # shingles: 123 234 345
    rows = [
        (1, a),
        (2, a),  # exact copy -> 0 novel
        (3, "w3 w4 w5 x1 x2"),  # 345 (seen), 45x1 4x1x2 (new) -> 2/3
        (4, f"{a} {a}"),  # overlaps doc1 + its own seam shingles
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    from modelardb_dynamic_spark.operators import dedup as D

    out = {
        r["doc_id"]: r.asDict()
        for r in D.novelty_scores(docs, n=3).collect()
    }
    assert (out[1]["n_shingles"], out[1]["n_novel"]) == (3, 3)
    assert (out[2]["n_shingles"], out[2]["n_novel"]) == (3, 0)
    assert (out[3]["n_shingles"], out[3]["n_novel"]) == (3, 2)
    assert out[3]["novel_frac"] == 2.0 / 3.0
    # doc 4 = a+a: distinct shingles are doc1's 3 plus the seam
    # (w4 w5 w1), (w5 w1 w2) -> 5 distinct, 2 novel
    assert (out[4]["n_shingles"], out[4]["n_novel"]) == (5, 2)


TR_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz"
)


def _tr(spark, rows):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    full = [
        (c, i, r, t, tool, base + datetime.timedelta(minutes=i))
        for (c, i, r, t, tool) in rows
    ]
    return spark.createDataFrame(full, TR_SCHEMA)


def test_agent_loops_islands(spark):
    """Runs split exactly at user turns; only runs >= min_len count;
    per-conv totals aggregate qualifying runs only."""
    from modelardb_dynamic_spark.operators.textstats import agent_loops

    rows = [
        # conv A: run of 5 (turns 1-5), user, run of 2 (ignored at min 4)
        ("A", 0, "user", "q", None),
        ("A", 1, "assistant", "a b", None),
        ("A", 2, "tool", "r", "search"),
        ("A", 3, "assistant", "a", None),
        ("A", 4, "tool", "r r", "search"),
        ("A", 5, "assistant", "done", None),
        ("A", 6, "user", "ok", None),
        ("A", 7, "assistant", "x", None),
        ("A", 8, "tool", "y", "calc"),
        # conv B: all user -> no rows
        ("B", 0, "user", "hi", None),
        ("B", 1, "user", "there", None),
    ]
    out = {r["conv_id"]: r.asDict()
           for r in agent_loops(_tr(spark, rows), min_len=4).collect()}
    assert set(out) == {"A"}
    a = out["A"]
    assert (a["n_runs"], a["longest_run"], a["loop_turns"]) == (1, 5, 5)
    assert a["loop_tool_calls"] == 2
    assert a["loop_tokens"] == 2 + 1 + 1 + 2 + 1
    assert a["first_loop_turn"] == 1


def test_tool_latency_gaps_and_open_calls(spark):
    from modelardb_dynamic_spark.operators.textstats import tool_latency

    rows = [
        ("A", 0, "user", "q", None),
        ("A", 1, "tool", "r", "search"),   # gap 1 min to turn 2
        ("A", 2, "assistant", "a", None),
        ("A", 3, "tool", "r", "search"),   # ends conv -> open call
        ("B", 0, "tool", "r", "calc"),     # gap 1 min
        ("B", 1, "assistant", "a", None),
    ]
    out = {r["tool"]: r.asDict()
           for r in tool_latency(_tr(spark, rows)).collect()}
    s = out["search"]
    assert (s["n_calls"], s["open_calls"]) == (1, 1)
    assert s["gap_sum_ms"] == 60_000
    assert (s["min_ms"], s["max_ms"], s["mean_ms"]) == (
        60_000, 60_000, 60_000.0,
    )
    c = out["calc"]
    assert (c["n_calls"], c["open_calls"], c["gap_sum_ms"]) == (
        1, 0, 60_000,
    )


def test_turn_echo_semantics(spark):
    """Jaccard over DISTINCT token sets, echo at >= 1/2 as an integer
    predicate, exact sums + shared divisions, max over pair ratios."""
    from modelardb_dynamic_spark.operators.textstats import turn_echo

    rows = [
        ("A", 0, "user", "a b c", None),
        ("A", 1, "assistant", "a b c", None),   # jac 1 -> echo
        ("A", 2, "assistant", "a b x y", None),  # i=2 u=5 -> 0.4 no echo
        ("A", 3, "tool", "z z z", "t"),          # distinct {z}: i=0 u=5
        ("B", 0, "user", "solo", None),          # no pair -> no row
    ]
    out = {r["conv_id"]: r.asDict()
           for r in turn_echo(_tr(spark, rows)).collect()}
    assert set(out) == {"A"}
    a = out["A"]
    assert (a["n_pairs"], a["n_echo"]) == (3, 1)
    assert (a["sum_inter"], a["sum_union"]) == (3 + 2 + 0, 3 + 5 + 5)
    assert a["echo_frac"] == 1.0 / 3.0
    assert a["sim_of_sums"] == 5.0 / 13.0
    assert a["max_jaccard"] == 1.0


def test_leakage_safe_splits_cluster_coherence(spark):
    """Near-dup pairs (even transitively connected ones) always share a
    split; percentages bound the bucket ranges; unpaired docs are their
    own cluster; assignment is stable under corpus growth."""
    from modelardb_dynamic_spark.operators.curation import (
        leakage_safe_splits,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], DOC_SCHEMA
    )
    # chain 1-2-3 (transitive), pair 5-6; 4 and 7 unpaired
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "ida long, idb long"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in leakage_safe_splits(docs, pairs).collect()
    }
    assert len(out) == 7
    assert (
        out[1]["split"] == out[2]["split"] == out[3]["split"]
    ) and out[1]["cluster_id"] == out[2]["cluster_id"] == 1
    assert out[5]["split"] == out[6]["split"]
    assert out[4]["cluster_id"] == 4 and out[7]["cluster_id"] == 7
    for r in out.values():
        lo = 0 if r["split"] == "test" else (
            10 if r["split"] == "val" else 20
        )
        hi = 10 if r["split"] == "test" else (
            20 if r["split"] == "val" else 100
        )
        assert lo <= r["bucket"] < hi
    # growth stability: adding doc 8 paired into cluster 1 leaves every
    # existing assignment unchanged and gives 8 cluster 1's split
    docs2 = docs.union(
        spark.createDataFrame([(8, "doc 8")], DOC_SCHEMA)
    )
    pairs2 = pairs.union(
        spark.createDataFrame([(3, 8)], "ida long, idb long")
    )
    out2 = {
        r["doc_id"]: r.asDict()
        for r in leakage_safe_splits(docs2, pairs2).collect()
    }
    for i in range(1, 8):
        assert out2[i] == out[i]
    assert out2[8]["split"] == out[1]["split"]


def test_trending_terms_rank_and_ties(spark):
    from modelardb_dynamic_spark.operators.textstats import trending_terms

    rows = [
        ("A", 0, "user", "x x x y y z", None),
        ("A", 1, "assistant", "y w", None),  # same day: x3 y3 w1 z1
        ("B", 2, "user", "only day two", None),
    ]
    import datetime

    base = datetime.datetime(2024, 3, 1)
    full = [
        (c, i, r, t, tool,
         base + datetime.timedelta(days=(1 if c == "B" else 0)))
        for (c, i, r, t, tool) in rows
    ]
    tr = spark.createDataFrame(full, TR_SCHEMA)
    out = [
        (r["rank"], r["token"], r["n"])
        for r in trending_terms(tr, top_k=3)
        .orderBy("day_ts", "rank")
        .collect()
    ]
    # day 1: x(3) then y(3) — tie broken token ASC — then w/z tie -> w
    assert out[:3] == [(1, "x", 3), (2, "y", 3), (3, "w", 1)]
    # day 2: three singleton tokens, alphabetical
    assert out[3:] == [(1, "day", 1), (2, "only", 1), (3, "two", 1)]


def test_tool_latency_pct_selection(spark):
    """Exact ceil-index percentile selection per tool over the
    value-count table (multiplicities respected; open calls excluded)."""
    from modelardb_dynamic_spark.operators.textstats import (
        tool_latency_pct,
    )

    import datetime

    base = datetime.datetime(2024, 1, 1)
    # tool 's' gaps (minutes): 1 x9 and 10 x1 -> n=10, p50=1, p90=1,
    # p99 at k=ceil(9.9)=10 -> 10 min
    full = []
    for conv, gap_min in [("c%d" % i, 1) for i in range(9)] + [("cx", 10)]:
        full.append((conv, 0, "tool", "r", "s", base))
        full.append(
            (conv, 1, "assistant", "a", None,
             base + datetime.timedelta(minutes=gap_min))
        )
    # one open call: tool turn ends its conversation -> excluded
    full.append(("open", 0, "tool", "r", "s", base))
    out = tool_latency_pct(
        spark.createDataFrame(full, TR_SCHEMA)
    ).collect()
    assert len(out) == 1
    r = out[0].asDict()
    M = 60_000
    assert (r["tool"], r["n"]) == ("s", 10)
    assert r["gap_sum_ms"] == 9 * M + 10 * M
    assert (r["min_ms"], r["p50_ms"], r["p90_ms"]) == (M, M, M)
    assert (r["p99_ms"], r["max_ms"]) == (10 * M, 10 * M)
    assert r["avg_gap_ms"] == (19 * M) / 10.0


def test_verbosity_latency_matches_numpy(spark):
    import datetime

    import numpy as np

    from modelardb_dynamic_spark.operators.textstats import (
        verbosity_latency,
    )

    rng = np.random.default_rng(6)
    base = datetime.datetime(2024, 1, 1)
    full, xs, ys = [], [], []
    t = base
    # one role, verbose turns induce longer gaps (+noise) -> r near 1
    for i in range(60):
        ntok = int(rng.integers(1, 30))
        gap_s = ntok * 10 + int(rng.integers(0, 20))
        full.append(("c", i, "assistant", " ".join(["w"] * ntok), None, t))
        t += datetime.timedelta(seconds=gap_s)
        if i < 59:  # last turn has no successor
            xs.append(ntok)
            ys.append(gap_s)
    out = verbosity_latency(
        spark.createDataFrame(full, TR_SCHEMA)
    ).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["n"] == 59
    want = np.corrcoef(xs, ys)[0, 1]
    assert abs(r["r"] - want) < 1e-9
    assert r["r"] > 0.9


def test_verbosity_latency_constant_is_null(spark):
    import datetime

    from modelardb_dynamic_spark.operators.textstats import (
        verbosity_latency,
    )

    base = datetime.datetime(2024, 1, 1)
    full = [
        ("c", i, "user", "one two", None,
         base + datetime.timedelta(minutes=i))
        for i in range(5)
    ]
    out = verbosity_latency(spark.createDataFrame(full, TR_SCHEMA)).collect()
    assert len(out) == 1 and out[0]["r"] is None  # constant x -> NULL


def test_curation_verdict_reasons(spark):
    """Keep/drop composes the four gates; each reason flag is
    attributable; survivors of dup clusters keep, losers drop."""
    from modelardb_dynamic_spark.operators.curation import (
        curation_verdict,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and then the cat "
        "sleeps while the sun is warm and the dog rests near the tree "
        "with the birds of the field around them all day long"
    )
    rows = [
        (1, good),
        (2, good),                       # exact dup of 1 -> loser
        (3, good.replace("warm", "hot")),  # near dup of 1 -> loser
        (4, "el perro de la casa que ladra los martes " * 5),  # not en
        (5, "zz " * 40),                 # en-fail + quality-fail
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in curation_verdict(
            spark.createDataFrame(rows, DOC_SCHEMA), min_words=20
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["exact_dup_loser"] and out[2]["near_dup_loser"]
    assert not out[2]["keep"]
    assert out[3]["near_dup_loser"] and not out[3]["exact_dup_loser"]
    assert not out[3]["keep"]
    assert not out[4]["lang_ok"] and not out[4]["keep"]
    assert not out[5]["keep"]
    # reason flags are independent: doc 4 is no dup loser
    assert not out[4]["exact_dup_loser"] and not out[4]["near_dup_loser"]


def test_conv_summary_exact(spark):
    import datetime

    import __spark_entry__  # noqa: F401  (queries module import path)
    from modelardb_dynamic_spark import queries as Q

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("A", 0, "user", "hi there", None, base),
        ("A", 1, "assistant", "hello", None,
         base + datetime.timedelta(minutes=2)),
        ("A", 2, "tool", "r r r", "search",
         base + datetime.timedelta(minutes=3)),
        ("B", 0, "user", "solo", None, base),
    ]
    tr = spark.createDataFrame(rows, TR_SCHEMA)
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    ntok = F.size(F.split(F.col("text"), r"\s+")).cast("long")
    out = {
        r["conv_id"]: r.asDict()
        for r in tr.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum((F.col("role") == "tool").cast("long")).alias("n_tool"),
            F.sum(ntok).alias("total_tokens"),
            F.countDistinct("tool").alias("n_distinct_tools"),
            (F.max(ms) - F.min(ms)).alias("duration_ms"),
        )
        .collect()
    }
    a = out["A"]
    assert (a["n_turns"], a["n_tool"], a["total_tokens"]) == (3, 1, 6)
    assert a["n_distinct_tools"] == 1
    assert a["duration_ms"] == 3 * 60_000
    b = out["B"]
    assert (b["n_turns"], b["duration_ms"], b["n_distinct_tools"]) == (
        1, 0, 0,
    )


# -- bigram LM cross-entropy (CCNet-style quality scoring) ---------------------


def _py_log2_series(n: int) -> float:
    """Bit-exact Python replay of log2_int_stages: same staged IEEE ops,
    same literal coefficients, evaluated left-to-right as both engines do."""
    e = n.bit_length() - 1
    m = float(n) / float(1 << e)
    t = (m - 1.0) / (m + 1.0)
    u = t * t
    p = 1.0 / 19.0
    for c in (17, 15, 13, 11, 9, 7, 5, 3):
        p = p * u + float(repr(1.0 / c))
    p = p * u + 1.0
    import math

    return float(e) + t * p * float(repr(2.0 / math.log(2.0)))


def test_lm_cross_entropy_exact_replay(spark):
    """Hand corpus: the engine's xent_bits must equal a pure-Python replay
    of the identical model (add-one bigram LM, context counts, shared log2
    series, sorted-bigram fold) BIT FOR BIT, and sit within 1e-9 of the
    math.log2 ground truth."""
    import math
    from collections import Counter

    rows = [
        (1, "a b a b c"),
        (2, "a b"),
        (3, "b c b c b"),
        (4, "solo"),          # 1 token -> excluded (no bigrams)
        (5, "  x   y  x "),   # messy whitespace
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {
        r["doc_id"]: r
        for r in textstats.lm_cross_entropy(docs).collect()
    }
    assert 4 not in out

    toks = {i: t.lower().split() for i, t in rows}
    bigs = {
        i: list(zip(ws, ws[1:])) for i, ws in toks.items() if len(ws) >= 2
    }
    cb: Counter = Counter()
    c1: Counter = Counter()
    for bs in bigs.values():
        for w1, w2 in bs:
            cb[(w1, w2)] += 1
            c1[w1] += 1
    vocab = {w for pair in cb for w in pair}
    v = len(vocab)
    for i, bs in bigs.items():
        per = Counter(bs)
        # fold in sorted-(w1, w2) order, exactly as both engines do
        bits = 0.0
        for (w1, w2), mlt in sorted(per.items()):
            num = cb[(w1, w2)] + 1
            den = c1[w1] + v
            bits = bits + float(mlt) * (
                _py_log2_series(den) - _py_log2_series(num)
            )
        n = len(bs)
        assert out[i]["n_bigrams"] == n
        assert out[i]["xent_bits"] == bits / float(n)  # bit-exact
        truth = (
            sum(
                -mlt * math.log2((cb[p] + 1) / (c1[p[0]] + v))
                for p, mlt in per.items()
            )
            / n
        )
        assert abs(out[i]["xent_bits"] - truth) < 1e-9

    # model sanity: add-one smoothing normalizes exactly per context
    for w1 in c1:
        tot = sum(
            (cb[(w1, w2)] + 1) / (c1[w1] + v) for w2 in vocab
        )
        assert abs(tot - 1.0) < 1e-12


def test_lm_cross_entropy_orders_quality(spark):
    """The filter signal: text made of corpus-typical bigrams scores lower
    cross-entropy than a shuffled-vocabulary gibberish doc of the same
    length, when scored against a corpus dominated by the typical prose."""
    common = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, common) for i in range(1, 9)]
    rows.append((100, "rug the on and mat dog cat sat the on the sat mat"))
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {
        r["doc_id"]: r["xent_bits"]
        for r in textstats.lm_cross_entropy(docs).collect()
    }
    assert out[1] < out[100]


def test_token_entropy_exact(spark):
    """Hand corpus: H must bit-match the staged-series replay and sit
    within 1e-9 of math.log2 ground truth; degenerate docs pin the edges
    (all-same -> 0, all-distinct -> log2 n, single token -> NULL eff)."""
    import math
    from collections import Counter

    rows = [
        (1, "a a a a"),            # H = 0
        (2, "a b c d"),            # H = 2 exactly
        (3, "a a b b b c"),
        (4, "solo"),               # 1 token: H = 0, efficiency NULL
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {
        r["doc_id"]: r for r in textstats.token_entropy(docs).collect()
    }
    assert out[1]["entropy_bits"] == 0.0 and out[1]["efficiency"] == 0.0
    assert out[2]["entropy_bits"] == 2.0 and out[2]["efficiency"] == 1.0
    assert out[4]["entropy_bits"] == 0.0 and out[4]["efficiency"] is None

    cnt = Counter("a a b b b c".split())
    n = sum(cnt.values())
    rep = 0.0
    for w, c in sorted(cnt.items()):
        rep = rep + float(c) * _py_log2_series(c)
    expect = _py_log2_series(n) - rep / float(n)
    assert out[3]["entropy_bits"] == expect  # bit-exact replay
    truth = -sum(c / n * math.log2(c / n) for c in cnt.values())
    assert abs(out[3]["entropy_bits"] - truth) < 1e-9
    assert out[3]["n_tokens"] == 6 and out[3]["n_distinct"] == 3


def test_pmi_collocations_exact(spark):
    """Constructed corpus: a pair that ALWAYS co-occurs ("new york") gets
    the max PMI; PMI values bit-match the staged-series replay and sit
    within 1e-9 of math.log2 ground truth; min_count prunes rare pairs."""
    import math
    from collections import Counter

    rows = [(i, "new york is far from the sea " * 2) for i in range(1, 6)]
    rows.append((99, "rare pair rare pair unique1 unique2"))
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = textstats.pmi_collocations(docs, top_k=10, min_count=2).collect()
    assert out, "no collocations found"
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))

    cb: Counter = Counter()
    c1: Counter = Counter()
    c2: Counter = Counter()
    for _, t in rows:
        ws = t.lower().split()
        for a, b in zip(ws, ws[1:]):
            cb[(a, b)] += 1
            c1[a] += 1
            c2[b] += 1
    n = sum(cb.values())
    for r in out:
        pair = (r["w1"], r["w2"])
        assert cb[pair] >= 2
        expect = (
            textstats.py_log2_stages(n)
            + textstats.py_log2_stages(cb[pair])
            - textstats.py_log2_stages(c1[pair[0]])
            - textstats.py_log2_stages(c2[pair[1]])
        )
        assert r["pmi"] == expect  # bit-exact vs the Python twin
        truth = math.log2(n * cb[pair] / (c1[pair[0]] * c2[pair[1]]))
        assert abs(r["pmi"] - truth) < 1e-9
    # "unique1 unique2" occurs once -> pruned by min_count=2
    assert ("unique1", "unique2") not in {(r["w1"], r["w2"]) for r in out}
    top = out[0]
    # the always-adjacent pair is the strongest collocation
    assert (top["w1"], top["w2"]) == ("new", "york") or top["pmi"] >= [
        r for r in out if (r["w1"], r["w2"]) == ("new", "york")
    ][0]["pmi"]


def test_zipf_head_fit_exact(spark):
    """Constructed Zipfian corpus (count ~ 60/rank): slope/intercept must
    bit-match the Python fold replay, agree with numpy lstsq to 1e-9, and
    the fitted slope sits near -1 for the 1/rank law."""
    import numpy as np

    toks = []
    words = ["w%02d" % i for i in range(1, 13)]
    for r, w in enumerate(words, 1):
        toks += [w] * (60 // r)
    docs = spark.createDataFrame([(1, " ".join(toks))], DOC_SCHEMA)
    out = textstats.zipf_head_fit(docs, top_k=10).collect()
    assert len(out) == 10
    rows = sorted(out, key=lambda r: r["rank"])
    # deterministic rank ties: equal counts order by token ASC
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)

    xs = [textstats.py_log2_stages(r["rank"]) for r in rows]
    ys = [textstats.py_log2_stages(r["cnt"]) for r in rows]
    # replay the exact fold order: each moment folds independently in
    # rank order
    sx = sy = sxx = sxy = 0.0
    for x in xs:
        sx = sx + x
    for y in ys:
        sy = sy + y
    for x in xs:
        sxx = sxx + x * x
    for x, y in zip(xs, ys):
        sxy = sxy + x * y
    n = float(len(rows))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = sy / n - slope * (sx / n)
    assert rows[0]["zipf_slope"] == slope  # bit-exact
    assert rows[0]["zipf_intercept"] == intercept
    for r, x, y in zip(rows, xs, ys):
        assert r["residual"] == y - (intercept + slope * x)

    a = np.vstack([np.array(xs), np.ones(len(xs))]).T
    ls = np.linalg.lstsq(a, np.array(ys), rcond=None)[0]
    assert abs(slope - ls[0]) < 1e-9 and abs(intercept - ls[1]) < 1e-9
    assert -1.3 < slope < -0.7


def test_vocab_kl_drift_exact(spark):
    """Constructed slices: a token flooding P and absent from Q dominates
    the drift head; contributions bit-match the Python twin replay and sit
    within 1e-9 of math.log2 ground truth; stable corpora produce
    near-zero contributions."""
    import math
    from collections import Counter

    p_rows = [(1, "alpha beta gamma " * 3 + "spamword " * 20)]
    q_rows = [(2, "alpha beta gamma " * 4)]
    p = spark.createDataFrame(p_rows, DOC_SCHEMA)
    q = spark.createDataFrame(q_rows, DOC_SCHEMA)
    out = textstats.vocab_kl_drift(p, q, top_k=10).collect()
    assert out[0]["token"] == "spamword"
    assert out[0]["cnt_p"] == 20 and out[0]["cnt_q"] == 0

    cp = Counter(p_rows[0][1].split())
    cq = Counter(q_rows[0][1].split())
    vocab = set(cp) | set(cq)
    v = len(vocab)
    n_p, n_q = sum(cp.values()), sum(cq.values())
    l2npv = textstats.py_log2_stages(n_p + v)
    l2nqv = textstats.py_log2_stages(n_q + v)
    for r in out:
        w = r["token"]
        expect = (float(cp[w] + 1) / float(n_p + v)) * (
            textstats.py_log2_stages(cp[w] + 1)
            - l2npv
            - textstats.py_log2_stages(cq[w] + 1)
            + l2nqv
        )
        assert r["contrib"] == expect  # bit-exact
        p_w = (cp[w] + 1) / (n_p + v)
        q_w = (cq[w] + 1) / (n_q + v)
        assert abs(r["contrib"] - p_w * math.log2(p_w / q_w)) < 1e-9
    # identical slices -> every contribution is exactly 0 (p_w == q_w,
    # the two log trees cancel term for term)
    same = textstats.vocab_kl_drift(p, p, top_k=5).collect()
    assert all(r["contrib"] == 0.0 for r in same)


def test_tfidf_keywords_exact(spark):
    """Constructed corpus: a corpus-unique token outranks ubiquitous ones;
    scores bit-match the Python twin and agree with math.log2 to 1e-9;
    ubiquitous tokens (df = N) score exactly 0."""
    import math

    rows = [
        (1, "shared shared unique1 filler"),
        (2, "shared filler unique2"),
        (3, "shared filler"),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = textstats.tfidf_keywords(docs, top_k=3).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r["rank"])
    # doc 1: unique1 (df=1) must outrank shared/filler (df=3)
    assert by_doc[1][0]["token"] == "unique1"
    n = 3
    for r in out:
        expect = float(r["tf"]) * (
            textstats.py_log2_stages(n) - textstats.py_log2_stages(r["df"])
        )
        assert r["tfidf"] == expect  # bit-exact
        assert abs(r["tfidf"] - r["tf"] * math.log2(n / r["df"])) < 1e-9
        if r["df"] == n:
            assert r["tfidf"] == 0.0
    # ranks are 1..k dense per doc with deterministic tie order
    for rs in by_doc.values():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))


def test_transition_entropy_exact(spark):
    """Hand-built flow: a deterministic pipeline state has H = 0; a
    uniform two-way state has H = 1 exactly; weights sum to 1 and the
    rate terms bit-match the Python twin replay."""
    rows = []
    # conv A: u -> a -> u -> a ... (deterministic both ways)
    for i in range(8):
        rows.append(("A", i, "user" if i % 2 == 0 else "assistant"))
    # conv B: a -> t, a -> u alternating: from 'assistant2' uniform split
    seq = ["x", "tool", "x", "user", "x", "tool", "x", "user"]
    for i, r in enumerate(seq):
        rows.append(("B", i, r))
    tr = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    out = {
        r["prev_role"]: r
        for r in textstats.transition_entropy(tr).collect()
    }
    # 'user' is always followed by 'assistant' in A and by 'x' in B...
    # so compute ground truth generically instead:
    from collections import Counter, defaultdict

    pairs: Counter = Counter()
    byconv = defaultdict(list)
    for c, i, r in rows:
        byconv[c].append((i, r))
    for c, seq_ in byconv.items():
        seq_.sort()
        for (_, a), (_, b) in zip(seq_, seq_[1:]):
            pairs[(a, b)] += 1
    n_total = sum(pairs.values())
    states = defaultdict(Counter)
    for (a, b), c in pairs.items():
        states[a][b] += c
    for s, nxt in states.items():
        n_s = sum(nxt.values())
        rep = 0.0
        for b, c in sorted(nxt.items()):
            rep = rep + float(c) * textstats.py_log2_stages(c)
        h = textstats.py_log2_stages(n_s) - rep / float(n_s)
        r = out[s]
        assert r["n"] == n_s and r["n_next"] == len(nxt)
        assert r["cond_entropy_bits"] == h  # bit-exact
        assert r["weight"] == float(n_s) / float(n_total)
        assert r["rate_term"] == (float(n_s) / float(n_total)) * h
    # the 'x' state in conv B goes 50/50 tool/user -> exactly 1 bit
    assert abs(out["x"]["cond_entropy_bits"] - 1.0) < 1e-12
    # deterministic states are exactly 0 bits
    det = [s for s, nxt in states.items() if len(nxt) == 1]
    for s in det:
        assert out[s]["cond_entropy_bits"] == 0.0
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-12


def test_source_health_exact(spark):
    """Hand corpus: cross-source duplicate counted in BOTH sources;
    dominant-language tie breaks lexicographically; token/char sums and
    the two divisions are exact."""
    rows = [
        (1, "shared text body", "en", "sA"),
        (2, "shared text body", "de", "sB"),   # cross-source exact dup
        (3, "unique one two", "en", "sA"),
        (4, "another unique doc here", "de", "sA"),
        (5, "fünf wörter noch ein doc", "de", "sA"),
        (6, "solo", "zh", "sB"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    from modelardb_dynamic_spark.operators.curation import source_health

    out = {r["source"]: r for r in source_health(docs).collect()}
    a, b = out["sA"], out["sB"]
    assert a["n_docs"] == 4 and b["n_docs"] == 2
    assert a["n_langs"] == 2 and b["n_langs"] == 2
    # doc 1 (sA) and doc 2 (sB) are the same text -> both flagged
    assert a["dup_docs"] == 1 and b["dup_docs"] == 1
    assert a["dup_frac"] == 1.0 / 4.0 and b["dup_frac"] == 1.0 / 2.0
    # sA langs: en x2, de x2 -> tie, 'de' wins lexicographically
    assert a["top_lang"] == "de" and a["top_lang_docs"] == 2
    toks_a = sum(len(t.split()) for i, t, l, s in rows if s == "sA")
    chars_a = sum(len(t) for i, t, l, s in rows if s == "sA")
    assert a["tokens"] == toks_a and a["chars"] == chars_a
    assert a["mean_tokens"] == float(toks_a) / 4.0


def test_tool_affinity_exact(spark):
    """Hand-built conversations: always-together tools get high PMI,
    independent tools sit near 0, repeated calls in one conversation
    count once; values bit-match the Python twin."""
    rows = []
    # convs 1-6: A and B always together (B called twice -> still one)
    for c in range(1, 7):
        rows += [
            (f"c{c}", 0, None),
            (f"c{c}", 1, "toolA"),
            (f"c{c}", 2, "toolB"),
            (f"c{c}", 3, "toolB"),
        ]
    # convs 7-12: C alone
    for c in range(7, 13):
        rows += [(f"c{c}", 0, "toolC")]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string"
    )
    out = {
        (r["tool_a"], r["tool_b"]): r
        for r in textstats.tool_affinity(tr, min_support=2).collect()
    }
    assert set(out) == {("toolA", "toolB")}
    r = out[("toolA", "toolB")]
    assert r["n_ab"] == 6 and r["n_a"] == 6 and r["n_b"] == 6
    n = 12
    expect = (
        textstats.py_log2_stages(n)
        + textstats.py_log2_stages(6)
        - textstats.py_log2_stages(6)
        - textstats.py_log2_stages(6)
    )
    assert r["pmi"] == expect  # bit-exact: log2(12*6/36) = 1 bit
    import math

    assert abs(r["pmi"] - math.log2(12 * 6 / 36)) < 1e-9


def test_trimmed_stats_exact(spark):
    """Hand data: a massive outlier moves the plain mean but not the
    trimmed/winsorized means; tie-straddling cutoffs trim exact
    multiplicities; k = floor(n/10)."""
    import statistics

    vals = [1, 2, 2, 2, 3, 3, 4, 5, 6, 1_000_000]  # n=10 -> k=1
    g = spark.createDataFrame(
        [("a", int(v)) for v in vals], "key string, v long"
    )
    out = textstats.trimmed_stats(g, "key", "v", 1, 10).collect()[0]
    assert out["n"] == 10 and out["k"] == 1
    mid = sorted(vals)[1:-1]
    assert out["trimmed_mean"] == sum(mid) / 8.0
    assert out["v_lo"] == 2 and out["v_hi"] == 6
    wins = sorted(vals)
    wins[0], wins[-1] = 2, 6
    assert out["winsorized_mean"] == sum(wins) / 10.0
    assert out["mean"] == sum(vals) / 10.0
    assert out["trimmed_mean"] < 10 < out["mean"]

    # ties straddling the cutoff: 12 values, k=1, the duplicate extremes
    # are trimmed one-of-two each
    vals2 = [1, 1, 2, 3, 3, 4, 5, 5, 6, 7, 9, 9]
    g2 = spark.createDataFrame(
        [("b", int(v)) for v in vals2], "key string, v long"
    )
    o2 = textstats.trimmed_stats(g2, "key", "v", 1, 10).collect()[0]
    mid2 = sorted(vals2)[1:-1]
    assert o2["k"] == 1
    assert o2["trimmed_mean"] == sum(mid2) / 10.0
    # invalid trim fraction refused
    import pytest as _pytest

    with _pytest.raises(ValueError):
        textstats.trimmed_stats(g, "key", "v", 1, 2)


def test_rrf_fuse_two_arms(spark):
    from modelardb_dynamic_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "id long, rank int"
    )
    vec = spark.createDataFrame(
        [(12, 1), (10, 2), (13, 3)], "id long, rank int"
    )
    out = {r.id: r for r in rrf_fuse([("lex", lex), ("vec", vec)]).collect()}
    assert set(out) == {10, 11, 12, 13}
    assert out[10].rrf_score == pytest.approx(1 / 61 + 1 / 62)
    assert out[11].rrf_score == pytest.approx(1 / 62)  # lex-only
    assert out[13].rrf_score == pytest.approx(1 / 63)  # vec-only
    assert out[11].rank_vec is None and out[13].rank_lex is None
    # consensus doc (top-3 in both) outranks either single-arm doc
    assert out[12].rrf_score > out[11].rrf_score
    assert out[12].rrf_score > out[13].rrf_score


def test_growth_accounting_classification(spark):
    from modelardb_dynamic_spark.operators.textstats import growth_accounting

    W = 7 * 86_400_000
    # u1: weeks 0,1,3 (new@0, retained@1, churn@2, resurrected@3)
    # u2: week 1 only (new@1, churn@2)
    # u3: weeks 2,3 (new@2, retained@3)
    rows = [(1, 0 * W), (1, 1 * W), (1, 3 * W), (2, 1 * W),
            (3, 2 * W), (3, 3 * W), (3, 3 * W + 5)]  # dup week collapses
    ev = spark.createDataFrame(rows, "user_id long, ts_ms long")
    out = {r.w: r for r in growth_accounting(ev).collect()}
    assert out[0].n_new == 1 and out[0].n_active == 1
    assert out[1].n_new == 1 and out[1].n_retained == 1
    assert out[2].n_new == 1 and out[2].n_churned == 2  # u1 and u2 left
    assert out[3].n_resurrected == 1 and out[3].n_retained == 1
    assert out[2].quick_ratio == pytest.approx(0.5)  # (1+0)/2
    for r in out.values():  # identity: active = new+retained+resurrected
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected
    # no week-4 churn row: beyond the last observed period
    assert 4 not in out


def test_activity_heatmap_axes_and_share(spark):
    from modelardb_dynamic_spark.operators.textstats import activity_heatmap

    D, H = 86_400_000, 3_600_000
    # 1970-01-01 (epoch day 0) was a THURSDAY = dow 4 under 0=Sunday.
    rows = [(1, 0 * D + 13 * H), (2, 0 * D + 13 * H),  # Thu 13:00 x2
            (1, 3 * D + 0 * H)]                        # Sun 00:00
    ev = spark.createDataFrame(rows, "user_id long, ts_ms long")
    out = {(r.dow, r.hod): r for r in activity_heatmap(ev).collect()}
    assert set(out) == {(4, 13), (0, 0)}
    assert out[(4, 13)].n_events == 2 and out[(4, 13)].n_users == 2
    assert out[(0, 0)].n_events == 1 and out[(0, 0)].n_users == 1
    assert out[(4, 13)].share == pytest.approx(2 / 3)


def test_tool_sequences_counts_and_conditional(spark):
    from modelardb_dynamic_spark.operators.textstats import tool_sequences

    rows = [
        # conv c1 tool turns: A, B, A  -> pairs (A,B), (B,A)
        ("c1", 0, "user", "x", None), ("c1", 2, "tool", "x", "A"),
        ("c1", 5, "tool", "x", "B"), ("c1", 8, "tool", "x", "A"),
        # conv c2 tool turns: A, B -> pair (A,B)
        ("c2", 2, "tool", "x", "A"), ("c2", 5, "tool", "x", "B"),
        # conv c3 tool turn: A alone -> no pair
        ("c3", 2, "tool", "x", "A"),
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    out = {(r.prev_tool, r.tool): r for r in tool_sequences(tr).collect()}
    assert set(out) == {("A", "B"), ("B", "A")}
    assert out[("A", "B")].n_pairs == 2 and out[("A", "B")].n_convs == 2
    assert out[("B", "A")].n_pairs == 1
    assert out[("A", "B")].p_next == pytest.approx(1.0)  # A always -> B
    assert out[("B", "A")].p_next == pytest.approx(1.0)


def test_stickiness_window_and_frontier(spark):
    from modelardb_dynamic_spark.operators.textstats import stickiness

    D = 86_400_000
    # u1 active day 0; u2 active days 0 and 40; window 30
    ev = spark.createDataFrame(
        [(1, 0 * D), (2, 0 * D), (2, 40 * D), (2, 40 * D + 7)],
        "user_id long, ts_ms long",
    )
    out = {r.d: r for r in stickiness(ev).collect()}
    # coverage: day-0 activity spans target days 0..29; day-40 activity
    # spans only day 40 (frontier cut); days 30..39 have no coverage.
    assert set(out) == set(range(30)) | {40}
    assert out[0].dau == 2 and out[0].mau == 2
    assert out[0].stickiness == pytest.approx(1.0)
    assert out[29].dau == 0 and out[29].mau == 2  # both still monthly-active
    assert out[40].dau == 1 and out[40].mau == 1


def test_skew_audit_gini_extremes(spark):
    from modelardb_dynamic_spark.operators.curation import skew_audit

    # uniform: 4 keys x 5 rows -> G = 2*(1+2+3+4)*5/(4*20) - 5/4 = 0
    uni = spark.createDataFrame(
        [(k,) for k in "abcd" for _ in range(5)], "k string"
    )
    rows = skew_audit(uni, "k").collect()
    assert all(r.gini == pytest.approx(0.0) for r in rows)
    assert sorted(r.cum_share for r in rows) == pytest.approx(
        [0.25, 0.5, 0.75, 1.0]
    )
    # extreme skew: one key holds 97 of 100 rows
    skew = spark.createDataFrame(
        [("hot",)] * 97 + [("a",), ("b",), ("c",)], "k string"
    )
    g = skew_audit(skew, "k").collect()[0].gini
    # ascending counts 1,1,1,97: G = 2*(1+2+3+4*97)/(4*100) - 5/4 = 0.72
    assert g == pytest.approx(0.72)


def test_pagerank_matches_power_iteration_reference(spark):
    import numpy as np

    from modelardb_dynamic_spark.operators.graph import pagerank

    # A -> B -> C -> A cycle plus B -> D; D dangling (no out-edges).
    edges = spark.createDataFrame(
        [("A", "B", 3), ("B", "C", 1), ("B", "D", 1), ("C", "A", 2)],
        "src string, dst string, n_pairs long",
    )
    got = {r.node: r.r for r in pagerank(edges, iters=8).collect()}

    names = ["A", "B", "C", "D"]
    W = np.zeros((4, 4))
    W[0, 1] = 1.0           # A: all mass to B
    W[1, 2] = W[1, 3] = 0.5  # B: half to C, half to D
    W[2, 0] = 1.0           # C: all to A
    W[3, :] = 0.25           # D dangling: uniform completion
    r = np.full(4, 0.25)
    for _ in range(8):
        r = 0.15 / 4 + 0.85 * (W.T @ r)
    for i, nm in enumerate(names):
        assert got[nm] == pytest.approx(r[i], rel=1e-12), nm
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    assert got["A"] > got["D"]  # cycle members outrank the sink


def test_editdist_verify_filters_and_scores(spark):
    from modelardb_dynamic_spark.operators.dedup import editdist_verify

    docs = spark.createDataFrame(
        [(1, "aaaa bbbb cccc"), (2, "aaaa bbbb cccx"),  # lev 1
         (3, "zzzz yyyy xxxx"),                          # far from 1
         (4, "café latte")],                        # non-ASCII: excluded
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "ida long, idb long"
    )
    out = {(r.ida, r.idb): r for r in
           editdist_verify(docs, cands, max_dist=5).collect()}
    assert set(out) == {(1, 2)}  # (1,3) too far, (1,4) non-ASCII dropped
    r = out[(1, 2)]
    assert r.lev == 1 and r.maxlen == 14
    assert r.sim == pytest.approx(1 - 1 / 14)


def test_profile_columns_stats_and_mode_ties(spark):
    from modelardb_dynamic_spark.operators.curation import profile_columns

    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("b", 2), ("b", None), (None, 2)],
        "s string, k int",
    )
    out = {r.col: r for r in
           profile_columns(df, str_cols=["s"], int_cols=["k"]).collect()}
    rs, rk = out["s"], out["k"]
    assert (rs.n_rows, rs.n_nulls, rs.n_distinct) == (5, 1, 2)
    assert (rs.min_str, rs.max_str) == ("a", "b")
    assert rs.min_int is None
    assert (rs.top_value, rs.top_count) == ("a", 2)  # tie a/b -> value ASC
    assert (rk.n_rows, rk.n_nulls, rk.n_distinct) == (5, 1, 3)
    assert (rk.min_int, rk.max_int) == (1, 3)
    assert (rk.top_value, rk.top_count) == ("2", 2)


def test_scd2_intervals_runs_and_bounds(spark):
    from modelardb_dynamic_spark.operators.textstats import scd2_intervals

    ev = spark.createDataFrame(
        [(1, "A", 10), (1, "A", 20), (1, "B", 30), (1, "A", 40),
         (2, "X", 5)],
        "user_id long, event_type string, ts_ms long",
    )
    out = sorted(
        scd2_intervals(ev).collect(), key=lambda r: (r.key, r.valid_from)
    )
    got = [(r.key, r.attr_value, r.valid_from, r.valid_to, r.n_events,
            r.is_current) for r in out]
    assert got == [
        (1, "A", 10, 30, 2, False),   # run of two A observations
        (1, "B", 30, 40, 1, False),
        (1, "A", 40, None, 1, True),  # value returning opens a NEW run
        (2, "X", 5, None, 1, True),
    ]


def test_containment_catches_subset_jaccard_misses(spark):
    from modelardb_dynamic_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally different words here ok")],
        "doc_id long, text string",
    )
    cont = {(r.ida, r.idb): r for r in
            containment_pairs(docs, 4, 5, n=3, max_df=None).collect()}
    assert (1, 2) in cont  # small fully embedded in big
    assert cont[(1, 2)].containment == pytest.approx(1.0)
    assert cont[(1, 2)].contained_id == 1
    # symmetric Jaccard at the same 0.8 bar misses it
    jac = ngram_jaccard_pairs(docs, threshold=0.8, n=3).collect()
    assert not any(r.ida == 1 and r.idb == 2 for r in jac)


def test_weighted_sample_tilts_and_reproduces(spark):
    from modelardb_dynamic_spark.operators.curation import weighted_sample

    # 200 light docs (w=10) + 200 heavy (w=1000): the heavy class should
    # dominate the sample far beyond its 50% share
    rows = [(i, 10) for i in range(200)] + [
        (1000 + i, 1000) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    s1 = weighted_sample(df, k=40, weight_expr="n_chars").collect()
    heavy = sum(1 for r in s1 if r.id >= 1000)
    assert heavy >= 30  # weight-tilted (expected ~39)
    assert len(s1) == 40
    # reproducible: identical second run
    s2 = weighted_sample(df, k=40, weight_expr="n_chars").collect()
    assert [r.id for r in s1] == [r.id for r in s2]
    # different seed -> different sample (overwhelmingly likely)
    s3 = weighted_sample(df, k=40, weight_expr="n_chars", seed="other").collect()
    assert [r.id for r in s3] != [r.id for r in s1]
    # zero/negative weights excluded
    df2 = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 7)], "doc_id long, n_chars long"
    )
    s4 = weighted_sample(df2, k=10, weight_expr="n_chars").collect()
    assert [r.id for r in s4] == [3]


def test_pq_adc_retrieves_cluster_neighbors(spark):
    import numpy as np

    from modelardb_dynamic_spark.operators.similarity import (
        pq_topk_exact,
        train_pq_codebooks,
    )

    # 4 well-separated clusters in 64-dim; PQ top-5 must stay in-cluster
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(4, 64)) * 10
    rows, X = [], []
    for i in range(120):
        c = i % 4
        v = centers[c] + rng.normal(size=64) * 0.1
        X.append(v)
        rows.append((i, [float(x) for x in v]))
    X = np.array(X)
    # train on the id-sorted matrix, like the oracle generator
    books = train_pq_codebooks(X.astype(np.float32).astype(np.float64), m=8, ksub=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_topk_exact(df, query_ids=[0, 1, 2, 3], books=books, k=5).collect()
    assert len(out) == 20
    for r in out:
        assert r.nid % 4 == r.qid % 4, (r.qid, r.nid)  # same cluster


def test_pq_codebooks_deterministic(spark):
    import numpy as np

    from modelardb_dynamic_spark.operators.similarity import train_pq_codebooks

    rng = np.random.default_rng(9)
    X = rng.normal(size=(300, 64))
    b1 = train_pq_codebooks(X, m=8, ksub=16)
    b2 = train_pq_codebooks(X.copy(), m=8, ksub=16)
    assert (b1 == b2).all()
    assert b1.shape == (8, 16, 8)


def test_latency_trend_detects_degradation(spark):
    """Planted corpora: a tool whose daily P95 grows -> degrading; one
    whose P95 shrinks -> improving; slope equals the hand Theil-Sen."""
    import numpy as np

    from modelardb_dynamic_spark.operators.textstats import latency_trend

    day = 86_400_000
    rows = []
    # conv per (tool, day): tool turn at t0, next turn at t0+gap
    for d in range(6):
        for k in range(10):
            t0 = d * day + k * 60_000
            # slow: P95 grows 1000 ms/day; fast: shrinks 500 ms/day
            rows.append((f"s{d}_{k}", 0, "assistant", "x", "slow",
                         t0, 10_000 + 1000 * d))
            rows.append((f"f{d}_{k}", 0, "assistant", "x", "fast",
                         t0, 10_000 - 500 * d))
    data = []
    for conv, idx, role, text, tool, t0, gap in rows:
        data.append((conv, idx, role, text, tool, t0))
        data.append((conv, idx + 1, "user", "y", None, t0 + gap))
    tr = spark.createDataFrame(
        data,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts_ms long",
    ).selectExpr(
        "conv_id", "turn_idx", "role", "text", "tool",
        "CAST(ts_ms / 1000.0 AS TIMESTAMP) AS ts",
    )
    out = {r.tool: r for r in latency_trend(tr, bucket_ms=day).collect()}
    assert out["slow"].verdict == "degrading"
    assert out["fast"].verdict == "improving"
    assert out["slow"].n_weeks == 6
    # every pairwise slope is exactly 1000 (resp -500): median equals it
    assert out["slow"].slope_ms_per_bucket == 1000.0
    assert out["fast"].slope_ms_per_bucket == -500.0
    assert out["slow"].m_pairs == 15


def test_theil_sen_enforces_points_per_series_cap(spark):
    """The per-series quadratic is enforced, not documented: a series
    above max_points raises before the pairwise self-join is built."""
    from modelardb_dynamic_spark.operators.analytics import theil_sen

    pts = spark.range(0, 30).selectExpr(
        "'s1' AS sid", "id * 60000 AS ts_ms", "id AS v"
    )
    with pytest.raises(ValueError, match="max_points"):
        theil_sen(pts, 60_000, max_points=10)
    # at or under the cap: runs fine
    assert theil_sen(pts, 60_000, max_points=30).count() == 1


def test_editdist_verify_enforces_dp_cell_cap(spark):
    """A candidate pair whose len_a * len_b DP exceeds max_cells raises
    before levenshtein runs (quadratic per pair, enforced)."""
    from modelardb_dynamic_spark.operators.dedup import editdist_verify

    docs = spark.createDataFrame(
        [(1, "x" * 100), (2, "y" * 100)], "doc_id long, text string"
    )
    cands = spark.createDataFrame([(1, 2)], "ida long, idb long")
    with pytest.raises(ValueError, match="max_cells"):
        editdist_verify(docs, cands, max_cells=9_999)
    assert editdist_verify(docs, cands, max_dist=200,
                           max_cells=10_000).count() == 1
