"""Planted-data tests for the round-2 LLM-pipeline additions:
contamination_check, mixture_epochs, repetition_stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.operators import corpus, text as text_ops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def test_repetition_stats_planted(spark):
    df = _docs(
        spark,
        [
            (1, "s", "a a a a"),        # all-duplicate words
            (2, "s", "w x y z"),        # all-unique words
            (3, "s", "q"),              # 1 token: no bigram slots -> dropped
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in text_ops.repetition_stats(df).collect()}
    assert set(out) == {1, 2}
    # doc 1: 4 tokens 1 distinct; trigrams 2 total 1 distinct; all bigrams "a a"
    assert out[1]["dup_word_e4"] == (10000 * 3) // 4
    assert out[1]["dup_trigram_e4"] == 5000
    assert out[1]["top_bigram_e4"] == 10000
    # doc 2: nothing repeats; 3 bigram slots, mode count 1
    assert out[2]["dup_word_e4"] == 0
    assert out[2]["dup_trigram_e4"] == 0
    assert out[2]["top_bigram_e4"] == 10000 // 3


def test_contamination_flags_exact_copies(spark):
    # 40 identical docs: whichever land in 'test' are fully covered by the
    # (near-certainly non-empty) train share of the rest.
    same = [(i, "s", "alpha beta gamma delta epsilon zeta eta theta") for i in range(40)]
    # unique docs: 5-grams exist nowhere else -> zero overlap for test ones
    uniq = [
        (100 + i, "s", f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g")
        for i in range(40)
    ]
    out = corpus.contamination_check(_docs(spark, same + uniq))
    rows = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert rows, "hash split should put at least one doc in test"
    for doc_id, r in rows.items():
        if doc_id < 100:
            assert r["contam_e4"] == 10000 and r["flagged"] is True
        else:
            assert r["contam_e4"] == 0 and r["flagged"] is False
        assert 0 <= r["hits"] <= r["n_grams"]


def test_mixture_epochs_copy_counts(spark):
    df = _docs(
        spark,
        [(i, src, "t") for i in range(30) for src in ("up3", "half", "drop", "other")],
    )
    out = corpus.mixture_epochs(
        df, epochs_e2={"up3": 300, "half": 150, "drop": 0}, default_e2=100
    )
    rows = out.collect()
    by_key: dict[tuple, list[int]] = {}
    for r in rows:
        by_key.setdefault((r["source"], r["doc_id"]), []).append(r["copy_id"])
    for (src, _), copies in by_key.items():
        assert sorted(copies) == list(range(1, len(copies) + 1))  # contiguous ids
        if src == "up3":
            assert len(copies) == 3
        elif src == "half":
            assert len(copies) in (1, 2)
        elif src == "other":
            assert len(copies) == 1
    assert not any(src == "drop" for src, _ in by_key)
    # every up3/other doc survived; half docs survive with >=1 copy
    assert sum(1 for (s, _) in by_key if s == "up3") == 30
    assert sum(1 for (s, _) in by_key if s == "other") == 30
    assert sum(1 for (s, _) in by_key if s == "half") == 30
    # determinism: second run emits the identical multiset
    again = corpus.mixture_epochs(
        df, epochs_e2={"up3": 300, "half": 150, "drop": 0}, default_e2=100
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_overlap_join_grid_dedup(spark):
    from data_lake_for_citi_bike_trip_spark.operators.intervals import overlap_join

    H = 3_600_000_000  # 1h grid in micros
    left = spark.createDataFrame(
        [(1, 0, 5 * H), (2, 10 * H, 10 * H + 1), (3, 7 * H, 8 * H)],
        "l_id bigint, l_start_us bigint, l_end_us bigint",
    )
    right = spark.createDataFrame(
        # A spans cells 0..5 of interval 1 (must emit ONE pair, not 6);
        # B touches interval 2 exactly at its start bound (inclusive);
        # C overlaps nothing.
        [(100, H, 4 * H), (200, 9 * H, 10 * H), (300, 20 * H, 21 * H)],
        "r_id bigint, r_start_us bigint, r_end_us bigint",
    )
    got = sorted(tuple(r) for r in overlap_join(left, right).collect())
    assert got == [(1, 100), (2, 200)]


def test_asof_nearest_picks_closer_side(spark):
    from data_lake_for_citi_bike_trip_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 10), (3, 1, 205), (4, 2, 50)],
        "event_id bigint, user_id bigint, ts bigint",
    )
    right = spark.createDataFrame(
        # user 1 quotes at 90 and 110 (row 1 ties at distance 10 -> backward);
        # row 2 sits before all quotes (forward only); row 3 nearest is 110...
        # wait: 205-110=95 vs next none after -> backward. user 2 has none.
        [(1, 90, 9.0), (1, 110, 11.0)],
        "user_id bigint, ts bigint, q double",
    )
    out = {
        r["event_id"]: r["asof_q"]
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            right_cols=["q"], direction="nearest",
        ).collect()
    }
    assert out[1] == 9.0     # exact tie -> backward
    assert out[2] == 9.0     # only forward matches exist
    assert out[3] == 11.0    # backward 110 is nearest
    assert out[4] is None    # no right rows for user 2


def test_pq_lossless_matches_generic_builder(spark, sf_dir):
    from data_lake_for_citi_bike_trip_spark.operators import similarity
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(30)
    cb_fast, codes_fast = similarity.build_pq_lossless(emb, m=4)
    cb_gen = similarity.build_pq_codebooks(emb, m=4, k=None)
    assert cb_fast.exceptAll(cb_gen).count() == 0
    assert cb_gen.exceptAll(cb_fast).count() == 0
    # one code per (vec_id, subspace)
    n = emb.count()
    assert codes_fast.count() == n * 4
    assert codes_fast.select("vec_id", "m").distinct().count() == n * 4


def test_pq_lossless_search_finds_planted_duplicate(spark):
    from pyspark.sql import functions as F

    from data_lake_for_citi_bike_trip_spark.operators import similarity

    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    rows.append((100, list(rows[3][1])))  # exact copy of vec 3
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cb, codes = similarity.build_pq_lossless(emb, m=4)
    got = similarity.pq_search(
        emb.where(F.col("vec_id") == 3), codes, cb, k=3
    ).collect()
    top = [r for r in got if r["rank"] == 1][0]
    assert top.vec_id == 100
    assert top.cos_pq_r6 == 1.0


def test_pq_lossy_codebook_bounded_and_codes_valid(spark, sf_dir):
    from data_lake_for_citi_bike_trip_spark.operators import similarity
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    cb = similarity.build_pq_codebooks(emb, m=4, k=8, iters=2)
    sizes = {r.m: r["cnt"] for r in cb.groupBy("m").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt")
    ).collect()}
    assert set(sizes) == {0, 1, 2, 3}
    assert all(c <= 8 for c in sizes.values())
    codes = similarity.pq_encode(emb, cb)
    # every emitted code exists in the codebook
    assert codes.join(cb, ["m", "code"], "left_anti").count() == 0


def test_sliding_chunks_overlap_and_tail(spark):
    from data_lake_for_citi_bike_trip_spark.operators import corpus

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x")], "doc_id bigint, text string"
    )
    rows = sorted(
        (
            (r.doc_id, r.chunk_idx, r.start_word, r.chunk_text, r.n_words)
            for r in corpus.sliding_chunks(docs).collect()
        )
    )
    assert rows == [
        (1, 0, 0, "a b c d e", 5),
        (1, 1, 3, "d e f g", 4),
        (1, 2, 6, "g", 1),
        (2, 0, 0, "x", 1),
    ]


def test_label_centroid_cosine_bounds_and_coverage(spark, sf_dir):
    from data_lake_for_citi_bike_trip_spark.operators import similarity
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = similarity.label_centroid_cosine(emb).collect()
    assert sum(r.n for r in rows) == emb.count()
    for r in rows:
        assert -1_000_000 <= r.min_cos_e6 <= r.avg_cos_e6 <= 1_000_000


def test_tokenizer_drift_counts(spark):
    from data_lake_for_citi_bike_trip_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "ab c1d!  e"), (2, "")], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.ws_tokens, r.bpe_tokens, r.ratio_bp)
        for r in text_ops.tokenizer_drift(docs).collect()
    }
    # doc1 ws: [ab, c1d!, e] = 3; bpe: ab, c, 1, d, !, e = 6
    assert got == {1: (3, 6, 20000), 2: (0, 0, 0)}


def test_group_split_has_zero_leakage(spark, sf_dir):
    from data_lake_for_citi_bike_trip_spark.operators import corpus
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    rows = corpus.group_split(load_table(spark, sf_dir, "documents")).collect()
    folds_per_source = {}
    for r in rows:
        folds_per_source.setdefault(r.source, set()).add(r.fold)
    assert all(len(fs) == 1 for fs in folds_per_source.values())
    assert sum(r.n_docs for r in rows) == 500


def test_mixture_deficit_accounting_closes(spark, sf_dir):
    from data_lake_for_citi_bike_trip_spark.operators import corpus
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    rows = corpus.mixture_deficit(load_table(spark, sf_dir, "documents")).collect()
    total = sum(r.tokens for r in rows)
    # shares tile the corpus (integer floor loses < 1bp per source)
    share_sum = sum(r.actual_bp for r in rows)
    assert 10000 - len(rows) <= share_sum <= 10000
    for r in rows:
        expect = (r.target_bp * total) // 10000 - r.tokens
        assert r.deficit_tokens == expect


def test_arrow_vector_stats_norm_ordering(spark, sf_dir):
    from data_lake_for_citi_bike_trip_spark.operators import similarity
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    rows = similarity.arrow_vector_stats(
        load_table(spark, sf_dir, "embeddings")
    ).collect()
    assert rows and all(r.dims == 64 for r in rows)
    for r in rows:
        assert r.linf_e6 <= r.l1_e6 <= 64 * r.linf_e6


def test_embedding_drift_is_scale_free_and_bounded(spark, sf_dir):
    from data_lake_for_citi_bike_trip_spark.operators import similarity
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = similarity.embedding_drift(emb).collect()
    assert {r.label for r in rows} == set(range(10))
    for r in rows:
        assert -1_000_000 <= r.centroid_cos_e6 <= 1_000_000
        assert r.n_a + r.n_b > 0


def test_multiprobe_knn_superset_and_strictly_better_recall(spark, sf_dir):
    """Multi-probe candidates contain every single-probe candidate (the
    probe list includes the home bucket), so the multi-probe mutual
    graph must contain the single-probe graph; and on this corpus the
    one-bit-flip probes must recover strictly more of the exact graph."""
    from data_lake_for_citi_bike_trip_spark.operators import similarity
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    single = similarity.blocked_mutual_knn(emb, k=3, bucket_bits=4)
    multi = similarity.blocked_mutual_knn_multiprobe(emb, k=3, bucket_bits=4)
    s_pairs = {(r.v1, r.v2) for r in single.select("v1", "v2").collect()}
    m_pairs = {(r.v1, r.v2) for r in multi.select("v1", "v2").collect()}
    # NOTE: the graphs are kNN-truncated, so multi is not guaranteed a
    # superset of single in general (extra candidates can displace a
    # same-bucket edge out of the top-k) — but every single-probe EDGE
    # that survives in multi keeps its score, and recall vs exact must
    # not regress on this data.
    r = similarity.blocked_knn_multiprobe_recall(emb, k=3, bucket_bits=4).first()
    assert r.multi_recall_bp > r.single_recall_bp, (
        r.single_recall_bp,
        r.multi_recall_bp,
    )
    assert m_pairs, (len(s_pairs), len(m_pairs))


def test_recall_sample_cap_equals_prefiltered_baseline(spark, sf_dir):
    """The 100-TB posture for the quadratic exact-recall baseline is an
    ABSOLUTE sample cap (SOAK_r9.md contract note) bounding the baseline
    at O(C^2) regardless of corpus size. The sample is the C lowest
    vectors by xxhash64(vec_id) — deterministic AND unbiased by id
    ordering (a vec_id < C prefix would skew the readout whenever ids
    correlate with ingest source/time). Semantics pin: sample_cap=C is
    bit-identical to hand-filtering the input to that hash-selected id
    set — the cap is a sample SELECTION, not a different estimator —
    for both the single-probe and multi-probe readouts; plus exact-size
    and id-independence properties of the selection itself."""
    from data_lake_for_citi_bike_trip_spark.operators import similarity
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cap = 60
    picked = {
        r.vec_id
        for r in emb.select("vec_id")
        .orderBy(F.xxhash64("vec_id").asc(), F.col("vec_id").asc())
        .limit(cap)
        .collect()
    }
    assert len(picked) == cap  # exact absolute bound
    # the selection must differ from an id-prefix sample (unbiasedness
    # is what the hash order buys; on this corpus they'd coincide only
    # if xxhash64 happened to order ids — it doesn't)
    assert picked != set(range(cap))
    manual_in = emb.where(F.col("vec_id").isin(list(picked)))
    capped = similarity.blocked_knn_recall(emb, k=3, sample_cap=cap).first()
    manual = similarity.blocked_knn_recall(manual_in, k=3).first()
    assert capped == manual, (capped, manual)
    assert capped.n_exact > 0  # the cap must not silence the readout
    capped_m = similarity.blocked_knn_multiprobe_recall(
        emb, k=3, sample_cap=cap
    ).first()
    manual_m = similarity.blocked_knn_multiprobe_recall(manual_in, k=3).first()
    assert capped_m == manual_m, (capped_m, manual_m)


def test_bigram_surprisal_prefers_repeated_sequences(spark):
    """Corpus: 'a b' x3 and one 'a c'. P(b|a) = (3+1)/(4+3); P(c|a) =
    (1+1)/(4+3). Surprisal checks hand-computed millibits, and the
    common continuation scores lower (more plausible) than the rare
    one. One-token docs are excluded."""
    import math

    from data_lake_for_citi_bike_trip_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c"), (5, "solo")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: (r.n_bigrams, r.surprisal_mb)
           for r in text_ops.bigram_surprisal(docs).collect()}
    # V = 4 (a, b, c, solo — the one-token doc still feeds the vocab)
    mb_b = math.floor(math.log2(8 / 4) * 1000 + 0.5)
    mb_c = math.floor(math.log2(8 / 2) * 1000 + 0.5)
    assert got[1] == (1, mb_b)
    assert got[4] == (1, mb_c)
    assert 5 not in got  # no bigrams in a one-token doc
    assert mb_c > mb_b


def test_label_silhouette_separated_clusters(spark):
    """Two orthogonal labels: own-centroid cosine 1e6, other 0 ->
    separation exactly 1e6 per label."""
    from data_lake_for_citi_bike_trip_spark.operators import similarity

    rows = [(1, 0, [1.0, 0.0]), (2, 0, [1.0, 0.0]),
            (3, 1, [0.0, 1.0]), (4, 1, [0.0, 1.0])]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<float>"
    )
    got = {r.label: r for r in similarity.label_silhouette(df).collect()}
    for lab in (0, 1):
        assert got[lab].mean_own_e6 == 1_000_000
        assert got[lab].mean_other_e6 == 0
        assert got[lab].separation_e6 == 1_000_000


def test_median_of_means_robust_to_outlier(spark):
    """A single enormous order drags the plain mean far above the
    median-of-means -> a large negative gap flags the heavy tail."""
    from data_lake_for_citi_bike_trip_spark.operators import profile

    rows = [(k, 100.0) for k in range(500)] + [(999, 1_000_000.0)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double"
    )
    r = profile.median_of_means(orders).collect()[0]
    assert r.mom_cents < r.mean_cents
    assert r.gap_cents < -10_000  # mean dragged > $100 above MoM
