"""Keyword retrieval: BM25 scoring over the documents corpus.

The lexical complement to operators/similarity.py's vector search —
together they cover both retrieval modalities of a training-data /
RAG pipeline.

Scale design (the posting-list shape):
- tokenize once, restrict postings to the query terms BEFORE any join
  (the per-term posting lists are tiny next to the corpus);
- (term, df) and the corpus stats row are broadcast;
- the only corpus-wide shuffles are the tf/doclen aggregates (map-side
  combined);
- top-k goes through sort+limit (TakeOrderedAndProject), never a
  single-partition global window over all matches.

Cross-engine float determinism: per-term scores are summed in a FIXED
(sorted-term) order via one conditional-aggregate column per term, so
both engines execute the identical float expression tree; the final
score is rounded and ranking uses the rounded value with a doc_id
tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..session import spread


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 (classic Robertson formulation:
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)), tf saturation k1, length
    normalization b). Returns (doc_id, n_terms_matched, score, rank)."""
    terms = sorted(set(query_terms))
    # explode_outer over a materialized token column: a plain explode of
    # the inline tokens() re-inlines the split into an inferred per-row
    # Filter (see functions.text.shingles_of)
    toks = (
        spread(docs)
        .select("doc_id", TX.tokens(F.col("text")).alias("w"))
        .select("doc_id", F.explode_outer(F.col("w")).alias("term"))
        .where(F.col("term").isNotNull())
    )
    # ONE doc-grain aggregate carries dl AND a pivoted per-term tf
    # (r15): the former doclen/tf pair aggregated the exploded token
    # stream twice, and because their shared subtree (scan -> tokenize
    # -> explode) is not exchange-rooted, ReusedExchange could not
    # dedupe it — the corpus was tokenized twice per run. The query
    # term list is a small fixed constant, so tf pivots into one column
    # per (sorted) term; df then derives from the doc-grain table
    # (rows = docs, not tokens). Score arithmetic is unchanged and in
    # the same sorted-term order, so the double result is bit-identical.
    base = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count(F.when(F.col("term") == t, 1)).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        base.agg(
            F.sum("dl").alias("sum_dl"),
            *[
                F.count(F.when(F.col(f"tf_{i}") > 0, 1)).alias(f"df_{i}")
                for i in range(len(terms))
            ],
        )
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")

    def term_score(i: int):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
        )
        return F.when(
            tf > 0,
            idf
            * tf
            * (k1 + 1)
            / (tf + k1 * (1 - b + b * F.col("dl") / avgdl)),
        ).otherwise(F.lit(0.0))

    total = term_score(0)
    for i in range(1, len(terms)):
        total = total + term_score(i)
    matched = F.lit(0).cast("long")
    for i in range(len(terms)):
        matched = matched + F.when(F.col(f"tf_{i}") > 0, 1).otherwise(
            0
        ).cast("long")
    per_doc = (
        base.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            matched.alias("n_terms_matched"),
            F.round(total, 4).alias("score"),
        )
        .where(F.col("n_terms_matched") > 0)
    )
    topk = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return topk.select(
        "doc_id",
        "n_terms_matched",
        "score",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("bigint")
        .alias("rank"),
    )


def hybrid_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    depth: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking fused with exact cosine
    vector ranking via reciprocal rank fusion — the standard RAG
    retrieval shape (each ranker covers the other's misses; RRF needs
    no score calibration because it uses only RANKS). Contribution is
    integer-exact e6 fixed point, ``1000000 div (rrf_k + rank)``, so
    the fused ordering is engine-identical.

    At scale each leg is already bounded (BM25 postings restricted to
    query terms; the vector leg any ANN op — brute force here for
    oracle parity); the fusion itself is a tiny full-outer join on the
    union of two depth-k lists."""
    from .similarity import cosine_topk

    lex = bm25_topk(docs, query_terms, k=depth).select(
        "doc_id", F.col("rank").alias("lex_rank")
    )
    sem = cosine_topk(
        embeddings, embeddings.where(F.col("vec_id") == query_vec_id), k=depth
    ).select(F.col("vec_id").alias("doc_id"), F.col("rank").alias("sem_rank"))

    def contrib(col: str):
        return F.coalesce(
            F.expr(f"1000000 div ({rrf_k} + {col})"), F.lit(0).cast("long")
        )

    fused = (
        lex.join(sem, "doc_id", "full")
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            (contrib("lex_rank") + contrib("sem_rank")).alias("rrf_e6"),
        )
    )
    w = Window.orderBy(F.desc("rrf_e6"), F.asc("doc_id"))
    return fused.withColumn("rank", F.row_number().over(w).cast("bigint")).where(
        F.col("rank") <= k
    )


def tfidf_similar_pairs(
    docs: DataFrame,
    k: int = 50,
    min_df: int = 2,
    max_df_pct: int = 5,
) -> DataFrame:
    """Top-k most similar document pairs by sparse tf-idf dot product,
    computed through a POSTING-LIST self-join — never an all-pairs
    product.

    Pipeline: tokenize -> tf per (doc, term) -> df per term -> weight
    w = tf * (1e6 // df) (an integer-exact reciprocal-df weighting — the
    idf surrogate keeps every score a BIGINT so the cross-engine hash
    can never drift on float summation order) -> join postings to
    postings ON term with doc_a < doc_b -> sum(w_a * w_b) per pair.

    Scale design: the join is keyed on term, so each term contributes
    df^2/2 candidate rows — bounded by the DEFAULT-ON stop-term cap
    (stop-term postings are exactly the quadratic blowup; reference
    pattern: the same cap that guards dedup's shingle join). The cap is
    FRACTIONAL — ``df * 100 <= max_df_pct * n_docs`` — because any
    fixed absolute cap goes vacuous once the corpus outgrows it (at
    10x the docs every term's df is ~10x; an absolute cap then filters
    the whole vocabulary and the query silently returns nothing).
    ``min_df`` drops hapax terms that cannot produce a pair. The
    integer comparison df*100 <= pct*n is exact in every engine. The
    df table is vocabulary-sized (grows with the corpus) so it carries
    NO forced broadcast hint — AQE broadcasts it while small. Top-k
    plans as TakeOrderedAndProject over the pair aggregate; ordering
    (score desc, doc_a, doc_b) is total, so the LIMIT boundary is
    deterministic.
    """
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
        )
        .where(F.length("term") >= 2)
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    capped = (
        df.crossJoin(F.broadcast(n_docs))  # 1-row stat attach
        .where(
            (F.col("df") >= min_df)
            & (F.col("df") * 100 <= F.lit(max_df_pct) * F.col("n_docs"))
        )
        .select("term", "df")
    )
    post = tf.join(capped, "term").select(
        "term",
        "doc_id",
        (F.col("tf") * F.expr("1000000 div df")).alias("w"),
    )
    a = post.select("term", F.col("doc_id").alias("doc_a"), F.col("w").alias("w_a"))
    b = post.select("term", F.col("doc_id").alias("doc_b"), F.col("w").alias("w_b"))
    pairs = (
        a.join(b, "term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("w_a") * F.col("w_b")).cast("long").alias("score"))
    )
    return pairs.orderBy(
        F.col("score").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    ).limit(k)


def phrase_search(docs: DataFrame, phrase: tuple[str, ...] = ("table", "value")) -> DataFrame:
    """Exact phrase matching over POSITIONAL postings: a document hits
    when the phrase terms occupy strictly consecutive token positions.

    The positional index is the standard IR structure: (term, doc,
    position) rows from one posexplode. Each adjacent phrase term pair
    becomes an EQUI-join — (doc, pos + 1) against (doc, pos) — so an
    n-term phrase is n-1 hash joins keyed on (doc, position), each
    pre-filtered to ONE term's posting list before joining (the lists
    are tiny next to the corpus; same pre-restriction as bm25_topk).
    Never a regex scan over full text at query time, never a cross
    product. Positions index the RAW split array, so "adjacent" means
    separated by separators only — in both engines identically.
    """
    if len(phrase) < 2:
        raise ValueError("phrase needs at least two terms")
    arr = F.split(F.lower(F.col("text")), "[^a-z]+")
    pos = docs.select("doc_id", F.posexplode(arr).alias("pos", "term"))
    hits = pos.where(F.col("term") == phrase[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = pos.where(F.col("term") == term).select(
            "doc_id", (F.col("pos") - i).alias("p")
        )
        hits = hits.join(
            nxt,
            (hits["doc_id"] == nxt["doc_id"]) & (hits["p0"] == nxt["p"]),
        ).select(hits["doc_id"], hits["p0"])
    return hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits"))
