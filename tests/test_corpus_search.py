"""Sequence packing, stratified sampling, BM25 retrieval semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.operators import corpus, search
from data_lake_for_citi_bike_trip_spark.sources.registry import load_table


def test_pack_sequences_layout_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = corpus.pack_sequences(docs, context_len=128, n_groups=4).cache()
    assert out.count() == docs.count()  # every doc lands somewhere
    rows = sorted(
        out.collect(), key=lambda r: (r.pack_group, r.doc_id)
    )
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r.pack_group, []).append(r)
    assert set(by_group) == {0, 1, 2, 3}
    for grp_rows in by_group.values():
        expected_offset = 0
        for r in grp_rows:
            # end-to-end layout: each doc starts where the previous ended
            assert r.start_offset == expected_offset
            assert r.bin_id == r.start_offset // 128
            assert r.bin_offset == r.start_offset % 128
            expected_offset += r.n_tokens
    out.unpersist()


def test_sample_stratified_rates_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 100, "zh": 0}
    out1 = corpus.sample_stratified(docs, rates).cache()
    # rate 100 keeps every en doc; rate 0 / unlisted default drops the rest
    n_en = docs.where(F.col("lang") == "en").count()
    assert out1.count() == n_en
    assert out1.where(F.col("lang") != "en").count() == 0
    # hash determinism: identical result on a second run
    out2 = corpus.sample_stratified(docs, rates)
    assert {r.doc_id for r in out1.collect()} == {r.doc_id for r in out2.collect()}
    out1.unpersist()


def test_bm25_ranks_term_matches(spark):
    docs = spark.createDataFrame(
        [
            (1, "vector vector vector search engine"),
            (2, "vector search"),
            (3, "nothing relevant here at all"),
            (4, "a much longer document about other things with vector once " + "filler " * 50),
        ],
        "doc_id long, text string",
    )
    out = search.bm25_topk(docs, ["vector"], k=10).collect()
    got = {r.doc_id: r for r in out}
    assert 3 not in got  # no match, no row
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 4]
    # tf saturation: more occurrences score higher; length norm: the long
    # doc with one hit ranks below the short doc with one hit
    assert got[1].score > got[2].score > got[4].score
    assert all(r.n_terms_matched == 1 for r in out)


def test_hybrid_rrf_fuses_both_rankers(spark):
    """A doc ranked by BOTH legs must outscore a doc ranked the same by
    only one; rrf contributions are exact integers."""
    from pyspark.sql import functions as F

    from data_lake_for_citi_bike_trip_spark.operators import search

    docs = spark.createDataFrame(
        [
            (0, "data hash vector data hash"),      # strong lexical
            (1, "data hash vector"),                # lexical + semantic
            (2, "unrelated words entirely here"),   # neither
        ],
        "doc_id bigint, text string",
    )
    import random

    rnd = random.Random(3)
    base = [rnd.uniform(-1, 1) for _ in range(16)]
    emb = spark.createDataFrame(
        [
            (0, [-x for x in base]),                # anti-correlated
            (1, [x * 1.01 for x in base]),          # near-duplicate of query
            (2, [x * 0.99 for x in base]),          # also close
            (9, base),                              # the query vector
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = {r.doc_id: r for r in search.hybrid_rrf(
        docs, emb, ["data", "hash", "vector"], query_vec_id=9, k=5
    ).collect()}
    # doc 1 appears in both legs -> two contributions
    assert out[1].lex_rank is not None and out[1].sem_rank is not None
    assert out[1].rrf_e6 == (1000000 // (60 + out[1].lex_rank)) + (
        1000000 // (60 + out[1].sem_rank)
    )
    # doc 0: lexical only (vector anti-correlated ranks it last of 3)
    only_lex = out[0]
    assert only_lex.rrf_e6 < out[1].rrf_e6
    assert out[1].rank == 1


def test_sample_weighted_is_biased_and_takeordered(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_lake_for_citi_bike_trip_spark.operators import corpus
    from data_lake_for_citi_bike_trip_spark.plans.explain import executed_plan
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = corpus.sample_weighted(docs, k=50)
    plan = executed_plan(out)
    # bottom-k must be a TakeOrdered, never a global sort
    assert "TakeOrderedAndProject" in plan, plan
    rows = out.collect()
    assert len(rows) == 50
    # determinism: second run identical
    again = corpus.sample_weighted(docs, k=50).collect()
    assert [r.doc_id for r in rows] == [r.doc_id for r in again]
    # weight bias: sampled docs skew longer than the corpus average
    corpus_avg = docs.agg(F.avg("n_chars")).first()[0]
    sample_avg = sum(r.weight for r in rows) / len(rows)
    assert sample_avg > corpus_avg, (sample_avg, corpus_avg)


def test_tfidf_similar_pairs_integer_scores(spark):
    from data_lake_for_citi_bike_trip_spark.operators import search

    docs = spark.createDataFrame(
        [
            (1, "cat dog cat"),
            (2, "cat dog"),
            (3, "dog bird"),
            (4, "fish"),
        ],
        "doc_id bigint, text string",
    )
    # pct cap sized for the 4-doc corpus: df*100 <= 75*4 keeps df<=3
    rows = search.tfidf_similar_pairs(docs, k=10, max_df_pct=75).collect()
    got = [(r.doc_a, r.doc_b, r.score) for r in rows]
    # df: cat=2 dog=3 (bird/fish hapax dropped); w_cat=500000, w_dog=333333
    s_dog = 333333 * 333333
    assert got == [
        (1, 2, 2 * 500000 * 500000 + s_dog),
        (1, 3, s_dog),
        (2, 3, s_dog),
    ]


def test_target_encode_loo_excludes_self(spark):
    """Category with values 100,200,300: row 100's LOO mean is 250;
    a singleton category is dropped."""
    from data_lake_for_citi_bike_trip_spark.operators import corpus

    orders = spark.createDataFrame(
        [(1, "A", 1.00), (2, "A", 2.00), (3, "A", 3.00), (4, "B", 9.00)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    got = {r.o_orderkey: r.loo_e2
           for r in corpus.target_encode_loo(orders).collect()}
    assert got == {1: 25000, 2: 20000, 3: 15000}


def test_feature_hash_bucket_counts_conserve_rows(spark):
    """Every customer contributes exactly two feature rows; bucket
    counts must conserve them and split by feature name."""
    from data_lake_for_citi_bike_trip_spark.operators import corpus

    cust = spark.createDataFrame(
        [(1, 7, "AUTOMOBILE"), (2, 7, "BUILDING"), (3, 8, "AUTOMOBILE")],
        "c_custkey long, c_nationkey long, c_mktsegment string",
    )
    rows = corpus.feature_hash_encode(cust).collect()
    assert sum(r.n_rows for r in rows) == 6
    assert sum(r.n_nation for r in rows) == 3
    assert sum(r.n_segment for r in rows) == 3
    # distinct feature values: nation 7, nation 8, two segments = 4
    assert sum(r.n_distinct_values for r in rows) >= 4


def test_negative_samples_exclude_positives(spark):
    """No emitted negative may be a positive of its order; draws are
    deterministic across invocations."""
    from data_lake_for_citi_bike_trip_spark.operators import corpus

    li = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10)], "l_orderkey long, l_partkey long"
    )
    part = spark.createDataFrame(
        [(p,) for p in range(1, 31)], "p_partkey long"
    )
    a = corpus.negative_samples(li, part).collect()
    b = corpus.negative_samples(li, part).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    pos = {(1, 10), (1, 20), (2, 10)}
    for r in a:
        assert (r.ok, r.neg_pk) not in pos
        assert 1 <= r.neg_pk <= 30


def test_quantile_normalize_single_source_gap_zero(spark):
    """With one source the per-source deciles ARE the pooled deciles:
    every gap is 0."""
    from data_lake_for_citi_bike_trip_spark.operators import corpus

    docs = spark.createDataFrame(
        [(i, "s", 100 + i) for i in range(50)],
        "doc_id long, source string, n_chars long",
    )
    rows = corpus.quantile_normalize(docs).collect()
    assert len(rows) == 9
    assert all(r.gap == 0 for r in rows)
